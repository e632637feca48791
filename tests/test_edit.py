"""Editing / inpainting / outpainting (Muse paper §3 "Inpainting and
Editing"; MaskGit paper §4.2-4.3). The reference has no editing path — its
generate always starts from a fully masked canvas
(muse_maskgit_pytorch.py:507-520) — so these tests pin OUR contract:
known tokens are frozen through every scoring path, a full edit mask is
token-exact with plain generate, and the schedule runs per-row over the
editable count."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from muse_maskgit_pytorch_tpu.models.maskgit import Muse

from tests.test_maskgit import (
    CODEBOOK,
    base_maskgit,
    superres_maskgit,
    text_embeds_for,
)


def _source_ids(mg, images):
    _, ids, _ = mg.vae.encode(images, train=False)
    return np.asarray(ids.reshape(ids.shape[0], -1))


def _edit_ids(mg, images, mask, rng, te, **kw):
    out = mg.edit(
        images, mask, text_embeds=te, rng=rng, timesteps=3, return_ids=True, **kw
    )
    return np.asarray(out.reshape(out.shape[0], -1))


def test_edit_preserves_known_tokens(rng):
    mg = base_maskgit()
    images = jax.random.uniform(rng, (2, 16, 16, 3))
    te = text_embeds_for(2, rng)
    mask = np.zeros((2, 4, 4), bool)
    mask[:, :2, :] = True  # regenerate the top half
    src = _source_ids(mg, images)
    out = _edit_ids(mg, images, jnp.asarray(mask), rng, te)
    keep = ~mask.reshape(2, -1)
    assert (out[keep] == src[keep]).all()
    assert (out >= 0).all() and (out < CODEBOOK).all()  # no mask_id leak


def test_edit_full_mask_matches_generate(rng):
    # editing with everything masked IS generate: same rng stream, same
    # decode bodies (edit forces compact off, so compare vs compact=False)
    mg = base_maskgit()
    images = jax.random.uniform(rng, (2, 16, 16, 3))
    te = text_embeds_for(2, rng)
    mask = jnp.ones((2, 4, 4), bool)
    out = _edit_ids(mg, images, mask, rng, te)
    ref = mg.generate(
        text_embeds=te, rng=rng, timesteps=3, return_ids=True, compact=False
    )
    assert (out == np.asarray(ref.reshape(2, -1))).all()


def test_edit_empty_mask_returns_source(rng):
    mg = base_maskgit()
    images = jax.random.uniform(rng, (2, 16, 16, 3))
    te = text_embeds_for(2, rng)
    src = _source_ids(mg, images)
    out = _edit_ids(mg, images, jnp.zeros((2, 4, 4), bool), rng, te)
    assert (out == src).all()


def test_edit_per_row_varying_region(rng):
    # per-row budgets: row 0 regenerates everything, row 1 nothing
    mg = base_maskgit()
    images = jax.random.uniform(rng, (2, 16, 16, 3))
    te = text_embeds_for(2, rng)
    mask = np.zeros((2, 4, 4), bool)
    mask[0] = True
    src = _source_ids(mg, images)
    out = _edit_ids(mg, images, jnp.asarray(mask), rng, te)
    assert (out[1] == src[1]).all()
    assert (out >= 0).all() and (out < CODEBOOK).all()


def test_edit_pixel_mask_downsamples_to_token_grid(rng):
    # a 16px image over a 4x4 token grid: masking the top-left 8x8 pixels
    # must regenerate ONLY the top-left 2x2 tokens
    mg = base_maskgit()
    images = jax.random.uniform(rng, (1, 16, 16, 3))
    te = text_embeds_for(1, rng)
    pixel_mask = np.zeros((1, 16, 16), bool)
    pixel_mask[:, :8, :8] = True
    src = _source_ids(mg, images)
    out = _edit_ids(mg, images, jnp.asarray(pixel_mask), rng, te)
    token_mask = np.zeros((1, 4, 4), bool)
    token_mask[:, :2, :2] = True
    keep = ~token_mask.reshape(1, -1)
    assert (out[keep] == src[keep]).all()


def test_edit_known_frozen_under_critic_and_can_remask(rng):
    te = text_embeds_for(2, rng)
    mask = np.zeros((2, 4, 4), bool)
    mask[:, :, :2] = True
    keep = ~mask.reshape(2, -1)

    # self token critic scores the FULL sequence each step — known positions
    # must stay pinned regardless of their critic scores
    mg = base_maskgit(self_token_critic=True, rngs=nnx.Rngs(0))
    images = jax.random.uniform(rng, (2, 16, 16, 3))
    src = _source_ids(mg, images)
    out = _edit_ids(mg, images, jnp.asarray(mask), rng, te)
    assert (out[keep] == src[keep]).all()

    # can_remask_prev_masked skips the -1e5 confidence pinning for refilled
    # positions — known positions still must never be remasked
    mg2 = base_maskgit(no_mask_token_prob=0.25)
    src2 = _source_ids(mg2, images)
    out2 = _edit_ids(
        mg2, images, jnp.asarray(mask), rng, te, can_remask_prev_masked=True
    )
    assert (out2[keep] == src2[keep]).all()


def test_superres_edit_auto_cond(rng):
    # super-res editing without explicit cond images auto-resizes the source
    mg = superres_maskgit()
    images = jax.random.uniform(rng, (2, 32, 32, 3))
    te = text_embeds_for(2, rng)
    mask = np.zeros((2, 8, 8), bool)
    mask[:, 4:, 4:] = True
    src = _source_ids(mg, images)
    out = _edit_ids(mg, images, jnp.asarray(mask), rng, te)
    keep = ~mask.reshape(2, -1)
    assert (out[keep] == src[keep]).all()


def test_edit_non_integral_cond_ratio_errors(rng):
    """A non-multiple image/cond size pair must error loudly instead of
    silently flooring edit()'s auto-resize ratio to 1 (which would condition
    at the wrong grid; training's auto-resize targets the exact cond size).
    Explicit cond_images keep working for such pairs."""
    from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit
    from tests.test_maskgit import tiny_transformer, tiny_vae

    mg = MaskGit(
        image_size=24, cond_image_size=16,
        transformer=tiny_transformer(36, seed=1),
        vae=tiny_vae(), cond_vae=tiny_vae(1),
    )
    images = jax.random.uniform(rng, (1, 24, 24, 3))
    mask = np.ones((1, 6, 6), bool)
    te = text_embeds_for(1, rng)
    with pytest.raises(AssertionError, match="integral"):
        mg.edit(images, mask, text_embeds=te, rng=rng, timesteps=2, return_ids=True)
    cond = jax.random.uniform(rng, (1, 16, 16, 3))
    out = mg.edit(
        images, mask, text_embeds=te, rng=rng, timesteps=2, return_ids=True,
        cond_images=cond,
    )
    assert out.shape[0] == 1


def test_muse_cascade_edit(rng):
    muse = Muse(base_maskgit(), superres_maskgit())
    images = jax.random.uniform(rng, (2, 32, 32, 3))
    pixel_mask = np.zeros((2, 32, 32), bool)
    pixel_mask[:, 16:, 16:] = True
    out = muse.edit(
        images,
        jnp.asarray(pixel_mask),
        ["a cat", "a dog"],
        rng=rng,
        timesteps=2,
        return_pil_images=False,
    )
    assert out.shape == (2, 32, 32, 3)
    assert np.asarray(out).min() >= 0 and np.asarray(out).max() <= 1

    pil = muse.edit(
        images, jnp.asarray(pixel_mask), ["a cat", "a dog"], rng=rng, timesteps=2
    )
    assert pil[0].size == (32, 32)


def test_edit_sharded_matches_unsharded(rng):
    """Editing under a data-parallel mesh (serving pipelines shard request
    batches) must be token-identical to single-device — including the
    per-row editable budgets, which reduce across the sharded seq axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from muse_maskgit_pytorch_tpu.parallel.mesh import create_mesh

    mg = base_maskgit()
    batch = 8
    images = jax.random.uniform(rng, (batch, 16, 16, 3))
    te = text_embeds_for(batch, rng)
    mask = np.zeros((batch, 4, 4), bool)
    mask[::2, :2, :] = True  # different regions per row, some rows untouched
    mask[1::2, :, 2:] = True
    ref = _edit_ids(mg, images, jnp.asarray(mask), rng, te)

    mesh = create_mesh()
    with mesh:
        sh = lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec))
        out = _edit_ids(
            mg,
            sh(images, P("data", None, None, None)),
            sh(jnp.asarray(mask), P("data", None, None)),
            rng,
            sh(te, P("data", None, None)),
        )
    np.testing.assert_array_equal(ref, out)


def test_edit_rejects_bad_schedule(rng):
    # a schedule with schedule(0) < 1 cannot refill the edit region at step 0
    mg = base_maskgit(noise_schedule=lambda t: 0.5 * jnp.cos(t * jnp.pi / 2))
    images = jax.random.uniform(rng, (1, 16, 16, 3))
    with pytest.raises(AssertionError, match="noise_schedule"):
        mg.edit(
            images,
            jnp.ones((1, 4, 4), bool),
            text_embeds=text_embeds_for(1, rng),
            rng=rng,
        )


def test_generate_int_known_mask_matches_bool(rng):
    # known_mask is documented as a mask, not strictly bool: an int 0/1 array
    # must behave identically (bitwise ~ on ints would give -1/-2 and break
    # every editable count)
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    ids = np.asarray(jax.random.randint(rng, (2, 4, 4), 0, CODEBOOK))
    mask_bool = np.zeros((2, 4, 4), bool)
    mask_bool[:, 2:, :] = True  # known bottom half
    out_bool = mg.generate(
        text_embeds=te, rng=rng, timesteps=3, return_ids=True,
        known_token_ids=jnp.asarray(ids), known_mask=jnp.asarray(mask_bool),
    )
    out_int = mg.generate(
        text_embeds=te, rng=rng, timesteps=3, return_ids=True,
        known_token_ids=jnp.asarray(ids),
        known_mask=jnp.asarray(mask_bool.astype(np.int32)),
    )
    np.testing.assert_array_equal(np.asarray(out_bool), np.asarray(out_int))
    out = np.asarray(out_int)
    assert (out >= 0).all() and (out < CODEBOOK).all()  # no mask_id leak


def test_muse_edit_per_stage_text_encoders(rng, monkeypatch):
    # a cascade may pair DIFFERENT text encoders; Muse.edit must encode texts
    # with each stage's own encoder instead of feeding base-dim embeds to the
    # super-res cross-attention
    base = base_maskgit()
    sr = superres_maskgit()
    muse = Muse(base, sr)
    # simulate differing encoders without loading real T5s
    monkeypatch.setattr(base.transformer, "t5_name", "t5-small")
    monkeypatch.setattr(sr.transformer, "t5_name", "t5-base")
    calls = []

    def enc_for(t, dim):
        def enc(texts):
            calls.append(t.t5_name)
            return jax.random.normal(jax.random.PRNGKey(0), (len(texts), 6, dim))
        return enc

    monkeypatch.setattr(
        base.transformer, "encode_text", enc_for(base.transformer, base.transformer.text_embed_dim)
    )
    monkeypatch.setattr(
        sr.transformer, "encode_text", enc_for(sr.transformer, sr.transformer.text_embed_dim)
    )
    images = jax.random.uniform(rng, (1, 32, 32, 3))
    mask = np.zeros((1, 32, 32), bool)
    mask[:, :16, :16] = True
    out = muse.edit(images, jnp.asarray(mask), texts=["x"], rng=rng,
                    timesteps=2, return_pil_images=False)
    assert out.shape == (1, 32, 32, 3)
    assert calls == ["t5-small", "t5-base"]  # one encode per stage


def test_muse_edit_neg_embeds_requires_shared_encoder(rng):
    base = base_maskgit()
    sr = superres_maskgit()
    muse = Muse(base, sr)
    sr.transformer.t5_name = "t5-other"
    images = jax.random.uniform(rng, (1, 32, 32, 3))
    mask = np.ones((1, 32, 32), bool)
    te = text_embeds_for(1, rng)
    with pytest.raises(AssertionError, match="same text encoder"):
        muse.edit(images, jnp.asarray(mask), text_embeds=te,
                  neg_text_embeds=te, rng=rng, timesteps=2)


def test_edit_rectangular_source(rng):
    """Editing composes with rectangular resolution (VERDICT r3 item 7): a
    square-trained model edits a non-native 16x32 source; kept tokens stay
    bit-exact, the edited region regenerates in-codebook, and the output
    image keeps the source's aspect ratio."""
    mg = base_maskgit()  # trained at 16px (4x4 tokens)
    images = jax.random.uniform(rng, (2, 16, 32, 3))  # landscape, non-native
    te = text_embeds_for(2, rng)
    mask = np.zeros((2, 4, 8), bool)  # token-level on the 4x8 latent grid
    mask[:, :, :4] = True  # regenerate the left half
    _, src, _ = mg.vae.encode(images, train=False)
    src = np.asarray(src).reshape(2, -1)
    out = _edit_ids(mg, images, jnp.asarray(mask), rng, te)
    keep = ~mask.reshape(2, -1)
    assert (out[keep] == src[keep]).all()
    assert (out >= 0).all() and (out < CODEBOOK).all()

    # pixel-level mask form + decoded output shape
    pmask = np.zeros((2, 16, 32), bool)
    pmask[:, :, :16] = True
    imgs = mg.edit(images, jnp.asarray(pmask), text_embeds=te, rng=rng, timesteps=3)
    assert imgs.shape == (2, 16, 32, 3)


def test_edit_rectangular_superres_auto_cond(rng):
    # super-res stage editing a rect source derives its conditioning image
    # at the scaled rect size (H//ratio, W//ratio)
    mg = superres_maskgit()  # 32px native, cond 16px (ratio 2)
    images = jax.random.uniform(rng, (2, 32, 48, 3))
    te = text_embeds_for(2, rng)
    mask = np.zeros((2, 8, 12), bool)
    mask[:, 2:6, 2:6] = True
    _, src, _ = mg.vae.encode(images, train=False)
    src = np.asarray(src).reshape(2, -1)
    out = _edit_ids(mg, images, jnp.asarray(mask), rng, te)
    keep = ~mask.reshape(2, -1)
    assert (out[keep] == src[keep]).all()


def test_muse_edit_rectangular(rng):
    """Cascade editing at a non-native rectangular resolution: both stages
    ride the pos-grid resize; output keeps the source aspect ratio."""
    muse = Muse(base_maskgit(), superres_maskgit())
    images = jax.random.uniform(rng, (1, 32, 64, 3))  # sr-stage rect source
    mask = np.zeros((1, 32, 64), bool)
    mask[:, 8:24, 16:48] = True
    te = text_embeds_for(1, rng)
    out = muse.edit(
        images, jnp.asarray(mask), text_embeds=te, rng=rng, timesteps=2,
        return_pil_images=False,
    )
    assert out.shape == (1, 32, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
