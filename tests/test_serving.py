"""Serving pipeline: shape-stable batching, padding, cascade mode."""

import numpy as np
from flax import nnx
from PIL import Image

from muse_maskgit_pytorch_tpu.models import t5 as t5mod
from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit, Muse
from muse_maskgit_pytorch_tpu.models.t5 import T5Config
from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer
from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE
from muse_maskgit_pytorch_tpu.serving import GeneratePipeline

TINY_T5 = "test/tiny-t5"
if TINY_T5 not in t5mod.T5_CONFIGS:
    t5mod.T5_CONFIGS[TINY_T5] = T5Config(32, 64, 2, 16, 2, True)


def _maskgit(image_size=16, cond=None, seed=0):
    vae = VQGanVAE(dim=16, layers=2, codebook_size=32, use_vgg_and_gan=False, rngs=nnx.Rngs(0))
    fmap = image_size // 4
    tr = MaskGitTransformer(
        num_tokens=32, dim=32, seq_len=fmap * fmap, depth=1, dim_head=16, heads=2,
        t5_name=TINY_T5, rngs=nnx.Rngs(seed),
    )
    return MaskGit(
        image_size=image_size, cond_image_size=cond, transformer=tr, vae=vae,
        cond_vae=vae if cond else None,
    )


def test_pipeline_basic():
    pipe = GeneratePipeline(_maskgit(), batch_size=4, timesteps=2, text_len=16)
    compile_s = pipe.warmup()
    assert compile_s > 0

    # more prompts than the batch size: chunks + padding
    images = pipe(["a", "b", "c", "d", "e"])
    assert len(images) == 5
    assert isinstance(images[0], Image.Image)
    assert images[0].size == (16, 16)
    assert pipe.stats["batches"] == 2  # ceil(5 / 4) chunks; warmup not counted
    assert pipe.stats["images"] == 5
    assert pipe.images_per_second is not None


def test_pipeline_single_prompt_array_output():
    pipe = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16, return_pil=False
    )
    out = pipe("hello")
    assert out.shape == (1, 16, 16, 3)
    # images are quantized to uint8 on device before the host fetch (4x less
    # device->host traffic — the serving bottleneck on remote hosts)
    assert out.dtype == np.uint8


def test_pipeline_edit_batched_and_padded():
    """Serving-path editing: chunking + padding with all-False masks (padding
    rows pass through untouched), uint8 output, and token preservation — an
    all-False mask row must reproduce the VAE roundtrip of its source."""
    import jax.numpy as jnp

    mg = _maskgit()
    pipe = GeneratePipeline(
        mg, batch_size=4, timesteps=2, text_len=16, return_pil=False,
        compile_cache=False,
    )
    rng = np.random.default_rng(0)
    images = rng.uniform(size=(5, 16, 16, 3)).astype(np.float32)
    masks = np.zeros((5, 16, 16), bool)
    masks[0, :8, :] = True  # row 0 edits the top half; rest untouched

    out = pipe.edit(images, masks, ["a", "b", "c", "d", "e"])
    assert out.shape == (5, 16, 16, 3) and out.dtype == np.uint8
    assert pipe.stats["batches"] == 2  # ceil(5/4) fixed-shape programs

    # untouched rows == quantized VAE roundtrip of the source
    _, ids, _ = mg.vae.encode(jnp.asarray(images[1:]), train=False)
    expect = mg.vae.decode_from_ids(ids)
    expect_u8 = np.asarray(
        (jnp.clip(expect, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    )
    np.testing.assert_array_equal(out[1:], expect_u8)


def test_pipeline_bf16_vae_production_config():
    """The production recommendation (BASELINE.md r3: VAE dtype=bf16, decode
    stage -17%, max pixel delta 0.0008) must serve correctly end to end."""
    import jax.numpy as jnp

    vae = VQGanVAE(
        dim=16, layers=2, codebook_size=32, use_vgg_and_gan=False,
        dtype=jnp.bfloat16, rngs=nnx.Rngs(0),
    )
    tr = MaskGitTransformer(
        num_tokens=32, dim=32, seq_len=16, depth=1, dim_head=16, heads=2,
        t5_name=TINY_T5, dtype=jnp.bfloat16, rngs=nnx.Rngs(0),
    )
    mg = MaskGit(image_size=16, transformer=tr, vae=vae)
    pipe = GeneratePipeline(mg, batch_size=2, timesteps=2, text_len=16, return_pil=False)
    out = pipe(["a cat"])
    assert out.shape == (1, 16, 16, 3)
    assert out.dtype == np.uint8


def test_pipeline_cascade():
    muse = Muse(_maskgit(16), _maskgit(32, cond=16, seed=1))
    pipe = GeneratePipeline(muse, batch_size=2, timesteps=2, text_len=16, return_pil=False)
    out = pipe(["x", "y", "z"])
    assert out.shape == (3, 32, 32, 3)


def test_pipeline_cascade_cond_via_resolution():
    """The pipeline's `cond_via='auto'` resolves to 'ids' exactly when the
    cascade stages share one VAE (the fixture's are seed-identical clones of
    nothing — equal VALUES, distinct objects — which `vaes_share_weights`
    must still recognize); explicit 'ids' output is identical to auto's, and
    the reference-semantics 'pixels' contract differs (encode(decode(ids))
    is not the identity at random init)."""
    def cascade():
        return Muse(_maskgit(16), _maskgit(32, cond=16, seed=1))

    auto = GeneratePipeline(
        cascade(), batch_size=2, timesteps=2, text_len=16, return_pil=False,
        compile_cache=False, seed=7,
    )
    assert auto.cond_via == "ids"
    explicit = GeneratePipeline(
        cascade(), batch_size=2, timesteps=2, text_len=16, return_pil=False,
        compile_cache=False, seed=7, cond_via="ids",
    )
    pixels = GeneratePipeline(
        cascade(), batch_size=2, timesteps=2, text_len=16, return_pil=False,
        compile_cache=False, seed=7, cond_via="pixels",
    )
    prompts = ["a cat", "a dog"]
    a, e, p = auto(prompts), explicit(prompts), pixels(prompts)
    np.testing.assert_array_equal(a, e)
    assert not np.array_equal(a, p)

    # a cascade whose cond VAE really differs must refuse explicit 'ids'
    # (and auto must fall back to pixels)
    def unshared():
        base = _maskgit(16)
        sr = _maskgit(32, cond=16, seed=1)
        sr.cond_vae = nnx.data(
            VQGanVAE(dim=16, layers=2, codebook_size=32, use_vgg_and_gan=False,
                     rngs=nnx.Rngs(5)).copy_for_eval()
        )
        return Muse(base, sr)

    fallback = GeneratePipeline(
        unshared(), batch_size=2, timesteps=2, text_len=16,
        compile_cache=False,
    )
    assert fallback.cond_via == "pixels"
    with pytest.raises(ValueError, match="share"):
        GeneratePipeline(
            unshared(), batch_size=2, timesteps=2, text_len=16,
            compile_cache=False, cond_via="ids",
        )


def test_pipeline_deterministic_stream_advances():
    pipe = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16, return_pil=False
    )
    a = pipe(["same prompt", "same prompt"])
    b = pipe(["same prompt", "same prompt"])
    # key stream advances between calls: outputs differ
    assert not np.allclose(a, b)


def test_pipeline_negative_prompt():
    pipe = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16, return_pil=False,
        negative_prompt="blurry",
    )
    out = pipe(["a", "b"])
    assert out.shape == (2, 16, 16, 3)


def test_pipeline_cascade_mesh_matches_single():
    """The serving default for shared-VAE cascades (cond_via auto → ids)
    under SPMD: a data-parallel cascade pipeline is token-identical to the
    meshless one — the base stage's token grid shards over the data axis
    and conditions the super-res decode in place."""
    from muse_maskgit_pytorch_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()
    single = GeneratePipeline(
        Muse(_maskgit(16), _maskgit(32, cond=16, seed=1)),
        batch_size=8, timesteps=2, text_len=16, return_pil=False, seed=3,
        compile_cache=False,
    )
    assert single.cond_via == "ids"
    sharded = GeneratePipeline(
        Muse(_maskgit(16), _maskgit(32, cond=16, seed=1)),
        batch_size=8, timesteps=2, text_len=16, return_pil=False, seed=3,
        mesh=mesh, compile_cache=False,
    )
    prompts = [f"prompt {i}" for i in range(8)]
    np.testing.assert_array_equal(single(prompts), sharded(prompts))


def test_pipeline_data_parallel_mesh_matches_single():
    """`mesh=` serves SPMD over the data axis, token-identical to meshless."""
    from muse_maskgit_pytorch_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()  # 8 virtual CPU devices (conftest)
    single = GeneratePipeline(
        _maskgit(), batch_size=8, timesteps=2, text_len=16, return_pil=False, seed=3
    )
    sharded = GeneratePipeline(
        _maskgit(), batch_size=8, timesteps=2, text_len=16, return_pil=False,
        seed=3, mesh=mesh,
    )
    prompts = [f"prompt {i}" for i in range(8)]
    a = single(prompts)
    b = sharded(prompts)
    np.testing.assert_array_equal(a, b)


def test_pipeline_mesh_batch_divisibility():
    from muse_maskgit_pytorch_tpu.parallel.mesh import create_mesh

    mesh = create_mesh()
    try:
        GeneratePipeline(_maskgit(), batch_size=3, text_len=16, mesh=mesh)
        raised = False
    except AssertionError:
        raised = True
    assert raised, "indivisible batch over the data axis must fail loudly"


# -- AOT export (jax.export StableHLO artifact) -------------------------------


def _embeds(batch=2, text_len=16, dim=32, seed=7):
    import jax

    e = jax.random.normal(jax.random.PRNGKey(seed), (batch, text_len, dim))
    return e, jnp.ones((batch, text_len), bool)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402

from muse_maskgit_pytorch_tpu.serving import (  # noqa: E402
    export_pipeline,
    load_exported_pipeline,
)


def test_export_roundtrip_matches_direct(tmp_path):
    mg = _maskgit()
    ep = export_pipeline(mg, batch_size=2, text_len=16, timesteps=2, cond_scale=3.0)
    embeds, mask = _embeds()
    key = jax.random.PRNGKey(5)

    _, state = nnx.split(mg)
    out = ep(state, embeds, mask, key)
    assert out.shape == (2, 16, 16, 3) and out.dtype == jnp.uint8

    # bit-exact vs the live module path (same program, same key)
    direct = mg.generate(
        text_embeds=embeds, text_mask=mask, rng=key, timesteps=2, cond_scale=3.0
    )
    direct_u8 = (jnp.clip(direct, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    assert (np.asarray(out) == np.asarray(direct_u8)).all()

    # serialize -> disk -> deserialize: still bit-exact, flat leaves accepted
    path = ep.save(tmp_path / "artifact")
    loaded = load_exported_pipeline(path)
    assert loaded.meta["kind"] == "maskgit"
    out2 = loaded(list(jax.tree.leaves(state)), embeds, mask, key)
    assert (np.asarray(out2) == np.asarray(out)).all()


@pytest.mark.parametrize("cond_via", ["pixels", "auto"])
def test_export_cascade_matches_direct(tmp_path, cond_via):
    """Both inter-stage contracts: 'pixels' (reference semantics) and 'auto',
    which resolves to 'ids' here — the fixture VAEs are seed-identical, so
    `vaes_share_weights` recognizes a shared codebook and the exported
    program conditions the super-res stage on the base stage's token grid
    directly (Muse cond_via='ids')."""
    muse = Muse(_maskgit(16), _maskgit(32, cond=16, seed=1))
    ep = export_pipeline(
        muse, batch_size=2, text_len=16, timesteps=2, cond_via=cond_via
    )
    via_ids = cond_via == "auto"
    assert ep.meta["cond_via"] == ("ids" if via_ids else "pixels")
    embeds, mask = _embeds()
    key = jax.random.PRNGKey(9)

    _, state = nnx.split(muse)
    out = ep(state, embeds, mask, key)
    assert out.shape == (2, 32, 32, 3) and out.dtype == jnp.uint8

    # replicate the exported program's key split on the live modules
    k1, k2 = jax.random.split(key)
    low = muse.base_maskgit.generate(
        text_embeds=embeds, text_mask=mask, rng=k1, timesteps=2,
        cond_scale=3.0, return_ids=via_ids,
    )
    sr_cond = (
        dict(cond_token_ids=low)
        if via_ids
        else dict(cond_images=jnp.clip(low, 0.0, 1.0))
    )
    hi = muse.superres_maskgit.generate(
        text_embeds=embeds, text_mask=mask, rng=k2, timesteps=2,
        cond_scale=3.0, **sr_cond,
    )
    hi_u8 = (jnp.clip(hi, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    assert (np.asarray(out) == np.asarray(hi_u8)).all()

    loaded = load_exported_pipeline(ep.save(tmp_path / "cascade"))
    assert loaded.meta["kind"] == "muse"
    out2 = loaded(state, embeds, mask, key)
    assert (np.asarray(out2) == np.asarray(out)).all()


def test_export_standalone_superres_needs_cond_images():
    sr = _maskgit(32, cond=16, seed=3)
    ep = export_pipeline(sr, batch_size=2, text_len=16, timesteps=2)
    assert ep.meta["needs_cond_images"]
    embeds, mask = _embeds()
    key = jax.random.PRNGKey(0)
    _, state = nnx.split(sr)
    with pytest.raises(ValueError, match="cond_images"):
        ep(state, embeds, mask, key)
    cond = jnp.zeros((2, 16, 16, 3))
    out = ep(state, embeds, mask, key, cond_images=cond)
    assert out.shape == (2, 32, 32, 3)


def test_export_rejects_wrong_state():
    mg = _maskgit()
    ep = export_pipeline(mg, batch_size=2, text_len=16, timesteps=2)
    embeds, mask = _embeds()
    _, state = nnx.split(mg)
    leaves = jax.tree.leaves(state)
    with pytest.raises(ValueError, match="leaves"):
        ep(leaves[:-1], embeds, mask, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="takes none"):
        ep(state, embeds, mask, jax.random.PRNGKey(0), cond_images=jnp.zeros((2, 16, 16, 3)))


def test_pipeline_edit_applies_negative_prompt(monkeypatch):
    """edit() must honor the pipeline's negative_prompt exactly like
    __call__ does — same guidance contract on both endpoints."""
    mg = _maskgit()
    pipe = GeneratePipeline(
        mg, batch_size=2, timesteps=2, text_len=16, return_pil=False,
        negative_prompt="blurry", compile_cache=False,
    )
    seen = {}
    orig = mg.edit

    def spy(images, masks, **kw):
        seen["neg"] = kw.get("neg_text_embeds")
        return orig(images, masks, **kw)

    monkeypatch.setattr(mg, "edit", spy)
    rng = np.random.default_rng(11)
    images = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    masks = np.zeros((2, 16, 16), bool)
    masks[:, :8, :8] = True
    out = pipe.edit(images, masks, ["a", "b"])
    assert out.shape == (2, 16, 16, 3)
    assert seen["neg"] is not None and seen["neg"].shape[0] == 2


def test_pipeline_rerank_candidates():
    """rerank_candidates=K serves the per-prompt winner of K batched
    candidates (model-internal best-of-K; see MaskGit.generate_reranked)."""
    pipe = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16, return_pil=False,
        rerank_candidates=3, rerank_score="logprob", compile_cache=False,
        seed=5,
    )
    out = pipe(["a cat", "a dog"])
    assert out.shape == (2, 16, 16, 3) and out.dtype == np.uint8
    # a plain pipeline from the same seed produces different (unreranked)
    # images, proving the rerank path actually ran
    plain = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16, return_pil=False,
        compile_cache=False, seed=5,
    )
    assert not np.array_equal(out, plain(["a cat", "a dog"]))


def test_pipeline_rerank_with_mesh():
    """rerank composes with data-parallel serving: the b*K candidate batch
    shards over the data axis and the winners come back per prompt."""
    from muse_maskgit_pytorch_tpu.parallel.mesh import create_mesh

    pipe = GeneratePipeline(
        _maskgit(), batch_size=8, timesteps=2, text_len=16, return_pil=False,
        rerank_candidates=2, rerank_score="logprob", compile_cache=False,
        mesh=create_mesh(),
    )
    out = pipe([f"p{i}" for i in range(8)])
    assert out.shape == (8, 16, 16, 3)


def test_pipeline_per_call_cond_scale():
    """pipe(prompts, cond_scale=v) overrides guidance per call through the
    traced-scale path: different values change the output, and repeated
    overrides share one compiled program."""
    from muse_maskgit_pytorch_tpu.models.maskgit import _generate_jit

    pipe = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16, return_pil=False,
        compile_cache=False, seed=9,
    )
    a = pipe(["a", "b"], cond_scale=1.0)
    n0 = _generate_jit._cache_size()
    b = pipe(["a", "b"], cond_scale=8.0)
    assert _generate_jit._cache_size() == n0  # traced: no recompile
    assert not np.array_equal(a, b)  # guidance actually applied


def test_pipeline_image_size_override_rectangular():
    """Deployment-level resolution override: the pipeline generates at a
    non-native (rectangular) size; a cascade scales it by the trained
    ratio. One compiled shape per pipeline, as always."""
    pipe = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16,
        return_pil=False, image_size=(8, 24),
    )
    out = pipe(["a", "b"])
    assert out.shape == (2, 8, 24, 3)

    muse = Muse(_maskgit(16), _maskgit(32, cond=16, seed=1))
    pipe2 = GeneratePipeline(
        muse, batch_size=2, timesteps=2, text_len=16,
        return_pil=False, image_size=(8, 24),
    )
    out2 = pipe2("one")
    assert out2.shape == (1, 16, 48, 3)


def test_pipeline_per_prompt_cond_scale():
    """pipe(prompts, cond_scale=[v0, v1]) gives each row its OWN guidance,
    row-exact with a whole-batch run at that row's scale (same seed)."""
    mixed = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16, return_pil=False,
        compile_cache=False, seed=11,
    )(["a", "b"], cond_scale=[2.0, 6.0])
    lo = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16, return_pil=False,
        compile_cache=False, seed=11,
    )(["a", "b"], cond_scale=2.0)
    hi = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16, return_pil=False,
        compile_cache=False, seed=11,
    )(["a", "b"], cond_scale=6.0)
    np.testing.assert_array_equal(mixed[0], lo[0])
    np.testing.assert_array_equal(mixed[1], hi[1])


def test_pipeline_warmup_surfaces():
    """warmup() compiles every requested surface at boot: the first live
    request on each surface then hits a cached program (no new decode-scan
    trace)."""
    from muse_maskgit_pytorch_tpu.models.maskgit import _generate_jit

    pipe = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16, return_pil=False,
        compile_cache=False, seed=3,
    )
    total = pipe.warmup("all")
    assert total > 0
    assert pipe.warm_surfaces == set(GeneratePipeline.WARMUP_SURFACES) == {
        "generate", "dynamic_scale", "neg_dynamic", "edit", "edit_dynamic_scale"
    }
    assert set(pipe.stats["warmup_seconds"]) == pipe.warm_surfaces

    n0 = _generate_jit._cache_size()
    pipe(["a", "b"])  # static program
    pipe(["a", "b"], cond_scale=[1.5, 4.0])  # per-row dynamic program
    img = np.zeros((2, 16, 16, 3), np.float32)
    msk = np.zeros((2, 16, 16), bool)
    msk[:, 4:8, 4:8] = True
    pipe.edit(img, msk, ["a", "b"])  # edit program
    # per-request-guidance edit is a DIFFERENT compiled program — the
    # edit_dynamic_scale surface must have prewarmed it too
    pipe.edit(img, msk, ["a", "b"], cond_scale=[1.5, 4.0])
    assert _generate_jit._cache_size() == n0, "a live request recompiled"


def test_pipeline_output_size_property():
    pipe = GeneratePipeline(_maskgit(), batch_size=2, timesteps=2, text_len=16)
    assert pipe.output_size == (16, 16)
    pipe2 = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16, image_size=(8, 24)
    )
    assert pipe2.output_size == (8, 24)
    assert pipe2.image_size == 16  # edit()'s native contract, unchanged
    muse = Muse(_maskgit(16), _maskgit(32, cond=16, seed=1))
    pipe3 = GeneratePipeline(
        muse, batch_size=2, timesteps=2, text_len=16, image_size=8
    )
    assert pipe3.output_size == (16, 16)


def test_export_dynamic_cond_scale(tmp_path):
    """dynamic_cond_scale=True bakes guidance as a PROGRAM INPUT: one
    artifact serves any per-row scale mix, row-exact with the live
    per-sample traced path."""
    import jax

    mg = _maskgit()
    ep = export_pipeline(
        mg, batch_size=2, text_len=16, timesteps=2, cond_scale=3.0,
        dynamic_cond_scale=True,
    )
    embeds, mask = _embeds()
    key = jax.random.PRNGKey(5)
    _, state = nnx.split(mg)

    out = ep(state, embeds, mask, key, cond_scale=[2.0, 6.0])
    direct = mg.generate(
        text_embeds=embeds, text_mask=mask, rng=key, timesteps=2,
        cond_scale=jnp.asarray([[2.0, 6.0]]),
    )
    direct_u8 = (jnp.clip(direct, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)
    assert (np.asarray(out) == np.asarray(direct_u8)).all()

    # None falls back to the default recorded in meta; scalar broadcasts;
    # serialization round-trips the dynamic input
    out_default = ep(state, embeds, mask, key)
    out_scalar = ep(state, embeds, mask, key, cond_scale=3.0)
    assert (np.asarray(out_default) == np.asarray(out_scalar)).all()
    path = ep.save(tmp_path / "dyn")
    loaded = load_exported_pipeline(path)
    out2 = loaded(state, embeds, mask, key, cond_scale=[2.0, 6.0])
    assert (np.asarray(out2) == np.asarray(out)).all()

    # static artifacts reject a per-call scale loudly
    ep_static = export_pipeline(mg, batch_size=2, text_len=16, timesteps=2)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dynamic_cond_scale"):
        ep_static(state, embeds, mask, key, cond_scale=2.0)


def test_pipeline_edit_per_prompt_cond_scale():
    """edit() takes per-prompt guidance like __call__ (kept pixels identical
    regardless of scale; scales change only the regenerated region)."""
    import jax

    pipe = GeneratePipeline(
        _maskgit(), batch_size=2, timesteps=2, text_len=16, return_pil=False,
        compile_cache=False, seed=13,
    )
    img = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3)), np.float32
    )
    msk = np.zeros((2, 16, 16), bool)
    msk[:, :8, :] = True
    out = pipe.edit(img, msk, ["a", "b"], cond_scale=[1.5, 6.0])
    assert out.shape == (2, 16, 16, 3)
    # scalar form shares the same compiled per-row program
    from muse_maskgit_pytorch_tpu.models.maskgit import _generate_jit

    n0 = _generate_jit._cache_size()
    pipe.edit(img, msk, ["a", "b"], cond_scale=2.5)
    assert _generate_jit._cache_size() == n0


def test_pipeline_cascade_per_prompt_cond_scale():
    """Per-prompt guidance rides BOTH cascade stages (the same per-row
    vector conditions base and super-res decodes), row-exact vs whole-batch
    runs at that row's scale."""
    def make():
        return GeneratePipeline(
            Muse(_maskgit(16), _maskgit(32, cond=16, seed=1)),
            batch_size=2, timesteps=2, text_len=16, return_pil=False,
            compile_cache=False, seed=17,
        )

    mixed = make()(["a", "b"], cond_scale=[2.0, 6.0])
    lo = make()(["a", "b"], cond_scale=2.0)
    hi = make()(["a", "b"], cond_scale=6.0)
    assert mixed.shape == (2, 32, 32, 3)
    np.testing.assert_array_equal(mixed[0], lo[0])
    np.testing.assert_array_equal(mixed[1], hi[1])


def test_pipeline_warmup_surfaces_cascade():
    """Multi-surface warmup on a CASCADE pipeline: the edit surface drives
    Muse.edit (both stages) with an all-False mask; live edit requests then
    reuse the compiled programs."""
    from muse_maskgit_pytorch_tpu.models.maskgit import _generate_jit

    pipe = GeneratePipeline(
        Muse(_maskgit(16), _maskgit(32, cond=16, seed=1)),
        batch_size=2, timesteps=2, text_len=16, return_pil=False,
        compile_cache=False, seed=4,
    )
    pipe.warmup(("generate", "edit"))
    assert pipe.warm_surfaces == {"generate", "edit"}
    n0 = _generate_jit._cache_size()
    img = np.zeros((2, 32, 32, 3), np.float32)
    msk = np.zeros((2, 32, 32), bool)
    msk[:, 8:24, 8:24] = True
    out = pipe.edit(img, msk, ["a", "b"])
    assert out.shape == (2, 32, 32, 3)
    assert _generate_jit._cache_size() == n0, "live cascade edit recompiled"
