"""Integration tests: tiny MaskGit train step + scan-based generate, super-res
conditioning, token critics, Muse cascade (SURVEY.md §4 configs 2-5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from muse_maskgit_pytorch_tpu.models import t5 as t5mod
from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit, Muse
from muse_maskgit_pytorch_tpu.models.t5 import T5Config
from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer, TokenCritic
from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE

CODEBOOK = 32
TEXT_DIM = 32
TINY_T5 = "test/tiny-t5"

if TINY_T5 not in t5mod.T5_CONFIGS:
    t5mod.T5_CONFIGS[TINY_T5] = T5Config(
        d_model=TEXT_DIM, d_ff=64, num_heads=2, d_kv=16, num_layers=2, gated=True
    )


def tiny_vae(seed=0):
    return VQGanVAE(
        dim=16,
        layers=2,
        codebook_size=CODEBOOK,
        use_vgg_and_gan=False,
        rngs=nnx.Rngs(seed),
    )


def tiny_transformer(seq_len, self_cond=False, seed=0):
    return MaskGitTransformer(
        num_tokens=CODEBOOK,
        dim=32,
        seq_len=seq_len,
        depth=1,
        dim_head=16,
        heads=2,
        t5_name=TINY_T5,
        self_cond=self_cond,
        rngs=nnx.Rngs(seed),
    )


def base_maskgit(image_size=16, self_cond=False, **kw):
    fmap = image_size // 4
    return MaskGit(
        image_size=image_size,
        transformer=tiny_transformer(fmap * fmap, self_cond=self_cond),
        vae=tiny_vae(),
        **kw,
    )


def text_embeds_for(b, rng, n=6):
    te = jax.random.normal(rng, (b, n, TEXT_DIM))
    return te


def test_train_forward_loss(rng):
    mg = base_maskgit()
    images = jax.random.uniform(rng, (2, 16, 16, 3))
    loss = mg(images, rng=rng, text_embeds=text_embeds_for(2, rng))
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_train_forward_from_ids(rng):
    mg = base_maskgit()
    ids = jax.random.randint(rng, (2, 4, 4), 0, CODEBOOK)
    loss = mg(ids, rng=rng, text_embeds=text_embeds_for(2, rng))
    assert np.isfinite(float(loss))


def test_grads_flow_only_to_transformer(rng):
    # frozen VAE (reference :637-642): grads wrt vae params must be zero
    mg = base_maskgit()
    images = jax.random.uniform(rng, (2, 16, 16, 3))
    te = text_embeds_for(2, rng)
    graphdef, state = nnx.split(mg)

    def loss_fn(state):
        model = nnx.merge(graphdef, state)
        return model(images, rng=rng, text_embeds=te)

    grads = nnx.to_flat_state(jax.grad(loss_fn)(state))
    saw_transformer = False
    for path, g in grads:
        p = "/".join(str(getattr(x, "key", getattr(x, "idx", x))) for x in path)
        gsum = float(jnp.sum(jnp.abs(g[...] if isinstance(g, nnx.Variable) else g)))
        if p.startswith("vae") or p.startswith("cond_vae"):
            assert gsum == 0, f"frozen vae got gradient at {p}"
        if p.startswith("transformer") and "token_emb" in p:
            saw_transformer = saw_transformer or gsum > 0
    assert saw_transformer


def test_generate_shapes_and_determinism(rng):
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    imgs = mg.generate(text_embeds=te, rng=rng, timesteps=4)
    assert imgs.shape == (2, 16, 16, 3)
    imgs2 = mg.generate(text_embeds=te, rng=rng, timesteps=4)
    np.testing.assert_array_equal(np.asarray(imgs), np.asarray(imgs2))
    imgs3 = mg.generate(text_embeds=te, rng=jax.random.PRNGKey(7), timesteps=4)
    assert not np.array_equal(np.asarray(imgs), np.asarray(imgs3))


def test_generate_return_ids_valid_range(rng):
    mg = base_maskgit()
    ids = mg.generate(text_embeds=text_embeds_for(1, rng), rng=rng, timesteps=3, return_ids=True)
    assert ids.shape == (1, 4, 4)
    ids = np.asarray(ids)
    # no [mask] ids survive decoding; all ids in codebook range
    assert ids.min() >= 0 and ids.max() < CODEBOOK


def test_generate_with_texts_via_tiny_t5(rng):
    mg = base_maskgit()
    imgs = mg.generate(texts=["a red square", "a blue circle"], rng=rng, timesteps=2)
    assert imgs.shape == (2, 16, 16, 3)


def test_generate_negative_prompt(rng):
    mg = base_maskgit()
    te = text_embeds_for(1, rng)
    neg = text_embeds_for(1, jax.random.PRNGKey(5), n=4)
    imgs = mg.generate(text_embeds=te, neg_text_embeds=neg, rng=rng, timesteps=2)
    assert imgs.shape == (1, 16, 16, 3)


def test_generate_self_cond(rng):
    mg = base_maskgit(self_cond=True)
    imgs = mg.generate(text_embeds=text_embeds_for(1, rng), rng=rng, timesteps=3)
    assert np.isfinite(np.asarray(imgs)).all()


def test_token_critic_training_and_sampling(rng):
    fmap = 4
    critic = TokenCritic(
        num_tokens=CODEBOOK,
        dim=32,
        seq_len=fmap * fmap,
        depth=1,
        dim_head=16,
        heads=2,
        t5_name=TINY_T5,
        rngs=nnx.Rngs(3),
    )
    mg = MaskGit(
        image_size=16,
        transformer=tiny_transformer(fmap * fmap),
        vae=tiny_vae(),
        token_critic=critic,
    )
    images = jax.random.uniform(rng, (2, 16, 16, 3))
    te = text_embeds_for(2, rng)
    loss = mg(images, rng=rng, text_embeds=te)
    loss_gen_only = mg(images, rng=rng, text_embeds=te, train_only_generator=True)
    assert np.isfinite(float(loss)) and np.isfinite(float(loss_gen_only))
    imgs = mg.generate(text_embeds=te, rng=rng, timesteps=3)
    assert imgs.shape == (2, 16, 16, 3)


def test_self_token_critic(rng):
    mg = base_maskgit(self_token_critic=True, rngs=nnx.Rngs(0))
    images = jax.random.uniform(rng, (2, 16, 16, 3))
    te = text_embeds_for(2, rng)
    assert np.isfinite(float(mg(images, rng=rng, text_embeds=te)))
    imgs = mg.generate(text_embeds=te, rng=rng, timesteps=2)
    assert imgs.shape == (2, 16, 16, 3)


def superres_maskgit():
    fmap = 8  # 32px / 2**2
    return MaskGit(
        image_size=32,
        cond_image_size=16,
        transformer=tiny_transformer(fmap * fmap, seed=1),
        vae=tiny_vae(),
        cond_vae=tiny_vae(1),
    )


def test_superres_training_auto_resize(rng):
    # B3 fix: raw 32px images; conditioning tokens derive from auto-resized 16px
    mg = superres_maskgit()
    images = jax.random.uniform(rng, (2, 32, 32, 3))
    loss = mg(images, rng=rng, text_embeds=text_embeds_for(2, rng))
    assert np.isfinite(float(loss))


def test_superres_generate_with_cond_images(rng):
    mg = superres_maskgit()
    cond = jax.random.uniform(rng, (2, 16, 16, 3))
    imgs = mg.generate(
        text_embeds=text_embeds_for(2, rng), cond_images=cond, rng=rng, timesteps=2
    )
    assert imgs.shape == (2, 32, 32, 3)


def test_superres_generate_cond_token_ids_matches_cond_images(rng):
    """generate(cond_token_ids=encode(img)) is token-exact with
    generate(cond_images=img): the ids path enters the decode at exactly the
    point the pixel path reaches after its cond_vae.encode — this is the
    contract the Muse `cond_via='ids'` fast path (skip the base-stage
    decode -> clip -> re-encode round trip) relies on."""
    mg = superres_maskgit()
    cond = jax.random.uniform(rng, (2, 16, 16, 3))
    _, cond_ids, _ = mg.cond_vae.encode(cond, train=False)
    te = text_embeds_for(2, rng)
    via_pixels = mg.generate(
        text_embeds=te, cond_images=cond, rng=rng, timesteps=2, return_ids=True
    )
    via_ids = mg.generate(
        text_embeds=te, cond_token_ids=cond_ids, rng=rng, timesteps=2, return_ids=True
    )
    assert jnp.array_equal(via_pixels, via_ids)


def test_muse_cascade(rng):
    base = base_maskgit()
    sr = superres_maskgit()
    muse = Muse(base, sr)
    out = muse(["a cat", "a dog"], rng=rng, timesteps=2, return_pil_images=False)
    assert out.shape == (2, 32, 32, 3)
    assert np.asarray(out).min() >= 0 and np.asarray(out).max() <= 1  # B4 fix

    sr_img, lr_img = muse(
        ["a cat"], rng=rng, timesteps=2, return_lowres=True, return_pil_images=False
    )
    assert sr_img.shape == (1, 32, 32, 3) and lr_img.shape == (1, 16, 16, 3)


def test_muse_cond_via_ids(rng):
    """cond_via='ids' (shared-VAE cascade): the base stage's token grid
    conditions the super-res decode directly — no decode->clip->re-encode
    round trip. Pin (a) the full output contract incl. return_lowres, and
    (b) exact equality with manually chaining base.generate(return_ids=True)
    into superres.generate(cond_token_ids=...) under Muse's key split."""
    vae = tiny_vae()
    base = MaskGit(
        image_size=16, transformer=tiny_transformer(16), vae=vae
    )
    sr = MaskGit(
        image_size=32,
        cond_image_size=16,
        transformer=tiny_transformer(64, seed=1),
        vae=tiny_vae(2),
        cond_vae=vae,
    )
    muse = Muse(base, sr)
    sr_img, lr_img = muse(
        ["a cat", "a dog"], rng=rng, timesteps=2, cond_via="ids",
        return_lowres=True, return_pil_images=False,
    )
    assert sr_img.shape == (2, 32, 32, 3) and lr_img.shape == (2, 16, 16, 3)
    assert np.asarray(sr_img).min() >= 0 and np.asarray(sr_img).max() <= 1

    k_base, k_sr = jax.random.split(rng)
    ids = base.generate(texts=["a cat", "a dog"], rng=k_base, timesteps=2,
                        return_ids=True)
    manual = sr.generate(texts=["a cat", "a dog"], rng=k_sr, timesteps=2,
                         cond_token_ids=ids)
    assert jnp.array_equal(sr_img, jnp.clip(manual, 0.0, 1.0))


def test_vaes_share_weights():
    """All three recognition tiers: clone identity (zero device work),
    equal-values fallback (separately built but identical weights), and a
    genuine mismatch."""
    from muse_maskgit_pytorch_tpu.models.maskgit import vaes_share_weights

    import gc

    from muse_maskgit_pytorch_tpu.models import maskgit as mg_mod

    src = tiny_vae()
    a, b = src.copy_for_eval(), src.copy_for_eval()
    assert vaes_share_weights(a, b)  # shared jax.Array leaves
    assert vaes_share_weights(tiny_vae(), tiny_vae())  # same seed, new arrays
    assert not vaes_share_weights(tiny_vae(), tiny_vae(seed=3))
    assert not vaes_share_weights(a, None) and vaes_share_weights(None, None)

    # verdict-cache hygiene: entries whose VAEs were collected are evicted on
    # the next value-comparison miss (long-lived serving processes that churn
    # pipelines must not grow the cache without bound)
    c, d = tiny_vae(), tiny_vae()
    assert vaes_share_weights(c, d)
    assert (id(c), id(d)) in mg_mod._SHARE_VERDICTS
    del c, d
    gc.collect()
    e, f = tiny_vae(), tiny_vae(seed=3)
    assert not vaes_share_weights(e, f)  # miss -> comparison -> eviction sweep
    assert all(
        ra() is not None and rb() is not None
        for ra, rb, _ in mg_mod._SHARE_VERDICTS.values()
    )


def test_muse_cond_via_ids_rejects_unshared_vae(rng):
    muse = Muse(base_maskgit(), superres_maskgit())  # distinct cond VAE
    with pytest.raises(ValueError, match="share one VAE"):
        muse(["a cat"], rng=rng, timesteps=2, cond_via="ids",
             return_pil_images=False)


def test_muse_pil_output(rng):
    from PIL import Image

    muse = Muse(base_maskgit(), superres_maskgit())
    out = muse(["a cat"], rng=rng, timesteps=2, return_pil_images=True)
    assert isinstance(out[0], Image.Image)
    assert out[0].size == (32, 32)


def test_save_load_roundtrip(tmp_path, rng):
    mg = base_maskgit()
    te = text_embeds_for(1, rng)
    ids_before = np.asarray(
        mg.generate(text_embeds=te, rng=rng, timesteps=2, return_ids=True)
    )
    mg.save(tmp_path / "maskgit.pt")

    mg2 = MaskGit(
        image_size=16,
        transformer=tiny_transformer(16, seed=9),
        vae=tiny_vae(9),
    )
    mg2.load(tmp_path / "maskgit.pt")
    ids_after = np.asarray(
        mg2.generate(text_embeds=te, rng=rng, timesteps=2, return_ids=True)
    )
    np.testing.assert_array_equal(ids_before, ids_after)
