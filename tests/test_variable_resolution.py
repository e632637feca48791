"""Variable-resolution sampling: a MaskGit trained at one latent grid can
generate (and train) at another — the learned positional table is
bilinearly resized to the new square grid (ViT-style resolution transfer,
`Transformer._positions`) and the conv VAE decodes any divisible size.
The reference is hard-wired to its training resolution
(muse_maskgit_pytorch.py:218,507-513: pos table and canvas both sized from
the ctor seq_len)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_maskgit import CODEBOOK, base_maskgit, text_embeds_for, tiny_transformer


def test_positions_native_length_is_the_table():
    t = tiny_transformer(16)  # 4x4 grid
    pos = t._positions(16)
    np.testing.assert_array_equal(
        np.asarray(pos), np.asarray(t.pos_emb(jnp.arange(16)))
    )


def test_positions_interpolates_square_grids():
    t = tiny_transformer(16)  # native 4x4
    for n, g in [(36, 6), (4, 2), (64, 8)]:
        pos = np.asarray(t._positions(n))
        assert pos.shape == (n, t.dim)
        assert np.isfinite(pos).all()
    # corner alignment: bilinear resize with a 2x grid keeps values in the
    # convex hull of the source table
    table = np.asarray(t.pos_emb(jnp.arange(16)))
    up = np.asarray(t._positions(64))
    assert up.min() >= table.min() - 1e-5 and up.max() <= table.max() + 1e-5


def test_positions_nonsquare_prefix_still_works():
    t = tiny_transformer(16)
    pos = np.asarray(t._positions(10))  # not a square: legacy prefix
    np.testing.assert_array_equal(
        pos, np.asarray(t.pos_emb(jnp.arange(10)))
    )
    with pytest.raises(AssertionError, match="square"):
        t._positions(20)  # > seq_len and not square


@pytest.mark.parametrize("image_size", [8, 24])
def test_generate_at_other_resolutions(rng, image_size):
    # model trained at 16px (4x4 latents); generate 8px (2x2) and 24px (6x6)
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    imgs = mg.generate(
        text_embeds=te, rng=rng, timesteps=3, image_size=image_size
    )
    assert imgs.shape == (2, image_size, image_size, 3)
    assert np.isfinite(np.asarray(imgs)).all()
    ids = mg.generate(
        text_embeds=te, rng=rng, timesteps=3, image_size=image_size,
        return_ids=True,
    )
    f = image_size // 4
    assert ids.shape == (2, f, f)
    out = np.asarray(ids)
    assert (out >= 0).all() and (out < CODEBOOK).all()


def test_generate_image_size_validation(rng):
    mg = base_maskgit()
    te = text_embeds_for(1, rng)
    with pytest.raises(AssertionError, match="divisible"):
        mg.generate(text_embeds=te, rng=rng, timesteps=2, image_size=10)
    with pytest.raises(AssertionError, match="not both"):
        mg.generate(
            text_embeds=te, rng=rng, timesteps=2, image_size=8, fmap_size=2
        )


def test_train_at_other_resolution(rng):
    # multi-resolution training: the objective runs at whatever grid the
    # batch encodes to
    mg = base_maskgit()
    images = jax.random.uniform(rng, (2, 24, 24, 3))
    loss = mg(images, rng=rng, text_embeds=text_embeds_for(2, rng))
    assert np.isfinite(float(loss))


def test_native_resolution_unchanged_by_feature(rng):
    # the image_size knob must be a pure no-op at the trained resolution
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    a = mg.generate(text_embeds=te, rng=rng, timesteps=3, return_ids=True)
    b = mg.generate(
        text_embeds=te, rng=rng, timesteps=3, return_ids=True, image_size=16
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_compact_decode_exact_at_non_native_resolution(rng):
    """The segmented compact decode must stay token-exact with the full path
    at a non-native latent grid (segments are computed from the requested
    fmap, not the trained seq_len). Pinned under injected per-position gumbel
    noise — the cross-path parity harness of tests/test_compact_decode.py
    (live PRNG draws differ in shape between the paths by design)."""
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    T, seq = 4, 36  # 24px over a 4x-downsampling VAE -> 6x6 latents
    noise = jax.random.gumbel(jax.random.PRNGKey(7), (T, 2, seq, CODEBOOK))
    kw = dict(
        text_embeds=te, rng=rng, timesteps=T, image_size=24,
        return_ids=True, injected_gumbel_noise=noise,
    )
    a = mg.generate(compact=True, **kw)
    b = mg.generate(compact=False, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
