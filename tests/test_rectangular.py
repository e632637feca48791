"""Rectangular (non-square aspect ratio) sampling: `generate(image_size=(h, w))`
resizes the square learned positional table ANISOTROPICALLY to the (fh, fw)
latent grid and decodes an (b, h, w, 3) canvas — portrait/landscape output
from a square-trained model. The reference is hard-wired to one square
resolution (muse_maskgit_pytorch.py:218,507-513). Extends the square
variable-resolution transfer (tests/test_variable_resolution.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muse_maskgit_pytorch_tpu import Muse
from tests.test_maskgit import (
    CODEBOOK,
    TINY_T5,
    base_maskgit,
    superres_maskgit,
    text_embeds_for,
    tiny_transformer,
)


def test_positions_explicit_grid_matches_manual():
    t = tiny_transformer(16)  # native 4x4
    table = t.pos_emb(jnp.arange(16))
    # native grid named explicitly: exactly the table, no resize
    np.testing.assert_array_equal(
        np.asarray(t._positions(16, grid=(4, 4))), np.asarray(table)
    )
    # rectangular grid: anisotropic bilinear resize of the square table
    got = np.asarray(t._positions(12, grid=(3, 4)))
    want = np.asarray(
        jax.image.resize(
            table.reshape(4, 4, t.dim).astype(jnp.float32),
            (3, 4, t.dim),
            method="bilinear",
        ).reshape(12, t.dim)
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)
    with pytest.raises(AssertionError, match="tile"):
        t._positions(12, grid=(3, 5))


def test_positions_orientation_is_not_symmetric():
    # (3, 4) and (4, 3) grids must differ (beyond a transpose of indices):
    # the table is not transpose-symmetric, so orientation carries signal
    t = tiny_transformer(16)
    a = np.asarray(t._positions(12, grid=(3, 4))).reshape(3, 4, t.dim)
    b = np.asarray(t._positions(12, grid=(4, 3))).reshape(4, 3, t.dim)
    assert not np.allclose(a, b.transpose(1, 0, 2))


def test_generate_rectangular_shapes(rng):
    mg = base_maskgit()  # trained 16px = 4x4 latents, VAE downsample 4
    te = text_embeds_for(2, rng)
    imgs = mg.generate(
        text_embeds=te, rng=rng, timesteps=3, image_size=(8, 24)
    )
    assert imgs.shape == (2, 8, 24, 3)
    assert np.isfinite(np.asarray(imgs)).all()
    ids = mg.generate(
        text_embeds=te, rng=rng, timesteps=3, image_size=(8, 24),
        return_ids=True,
    )
    assert ids.shape == (2, 2, 6)
    out = np.asarray(ids)
    assert (out >= 0).all() and (out < CODEBOOK).all()


def test_square_tuple_is_exactly_the_int_path(rng):
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    a = mg.generate(
        text_embeds=te, rng=rng, timesteps=3, image_size=24, return_ids=True
    )
    b = mg.generate(
        text_embeds=te, rng=rng, timesteps=3, image_size=(24, 24),
        return_ids=True,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rect_validation(rng):
    mg = base_maskgit()
    te = text_embeds_for(1, rng)
    with pytest.raises(AssertionError, match="divisible"):
        mg.generate(text_embeds=te, rng=rng, timesteps=2, image_size=(8, 10))


def test_rect_compact_decode_exact(rng):
    """Compact decode stays token-exact with the full path on a rectangular
    grid (segments run over fh*fw; placement/one-hot logic is grid-agnostic).
    Pinned under injected gumbel noise as in tests/test_compact_decode.py."""
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    T, seq = 4, 2 * 6
    noise = jax.random.gumbel(jax.random.PRNGKey(7), (T, 2, seq, CODEBOOK))
    kw = dict(
        text_embeds=te, rng=rng, timesteps=T, image_size=(8, 24),
        return_ids=True, injected_gumbel_noise=noise,
    )
    a = mg.generate(compact=True, **kw)
    b = mg.generate(compact=False, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rect_critic_generate(rng):
    from flax import nnx

    mg = base_maskgit(self_token_critic=True, rngs=nnx.Rngs(0))
    te = text_embeds_for(2, rng)
    imgs = mg.generate(
        text_embeds=te, rng=rng, timesteps=3, image_size=(8, 24)
    )
    assert imgs.shape == (2, 8, 24, 3)
    assert np.isfinite(np.asarray(imgs)).all()


def test_rect_rerank(rng):
    # best-of-K at a rectangular grid: candidates decode, score (logprob
    # forward under the SAME resized pos grid), and the winner decodes
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    imgs, scores = mg.generate_reranked(
        text_embeds=te, rng=rng, num_candidates=2, timesteps=2,
        image_size=(8, 24), return_scores=True,
    )
    assert imgs.shape == (2, 8, 24, 3)
    assert scores.shape == (2,)
    assert np.isfinite(np.asarray(imgs)).all()


def test_muse_cascade_rectangular(rng):
    # base generates (8, 24); super-res scales by the cascade's trained 2x
    # ratio to (16, 48), conditioned on the rectangular low-res tokens
    muse = Muse(base_maskgit(), superres_maskgit())
    sr, lr = muse(
        ["a cat"], rng=rng, timesteps=2, image_size=(8, 24),
        return_lowres=True, return_pil_images=False,
    )
    assert lr.shape == (1, 8, 24, 3)
    assert sr.shape == (1, 16, 48, 3)
    assert np.isfinite(np.asarray(sr)).all()


def test_muse_cascade_square_int_image_size(rng):
    # the cascade image_size knob with a plain int stays square end to end
    muse = Muse(base_maskgit(), superres_maskgit())
    out = muse(["a cat"], rng=rng, timesteps=2, image_size=8,
               return_pil_images=False)
    assert out.shape == (1, 16, 16, 3)


def test_rect_training(rng):
    # aspect-bucketed training: a non-square batch trains under the same
    # resized positional grid rectangular sampling uses (all three
    # transformer calls: self-cond forward, CE forward, critic forward)
    from flax import nnx

    mg = base_maskgit(self_cond=True, self_token_critic=True, rngs=nnx.Rngs(0))
    images = jax.random.uniform(rng, (2, 8, 24, 3))
    loss = mg(images, rng=rng, text_embeds=text_embeds_for(2, rng))
    assert np.isfinite(float(loss))


def test_nonsquare_native_table_passthrough():
    # a transformer built with a natively non-square seq_len keeps its
    # trained row-major table when the grid is named at native length —
    # PROVIDED the orientation matches the trained grid (`seq_hw`; since
    # the r3-advice fix an unnamed orientation is rejected rather than
    # silently accepted, see test_nonsquare_trained_grid_orientation_*)
    from flax import nnx

    from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer

    t = MaskGitTransformer(
        num_tokens=CODEBOOK, dim=32, seq_len=12, seq_hw=(3, 4), depth=1,
        dim_head=16, heads=2, t5_name=TINY_T5, rngs=nnx.Rngs(0),
    )
    got = np.asarray(t._positions(12, grid=(3, 4)))
    np.testing.assert_array_equal(
        got, np.asarray(t.pos_emb(jnp.arange(12)))
    )
    # a model built WITHOUT seq_hw cannot validate orientation: refuse
    bare = tiny_transformer(12)
    with pytest.raises(AssertionError, match="trained grid"):
        bare._positions(12, grid=(3, 4))
    with pytest.raises(AssertionError, match="square trained table"):
        t._positions(24, grid=(4, 6))  # non-native transfer: no source grid


def test_nonsquare_trained_grid_orientation_validated():
    """ADVICE r3: a natively non-square model must reject a transposed
    pos_grid instead of silently returning the row-major table."""
    import pytest
    from flax import nnx

    from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer

    tr = MaskGitTransformer(
        num_tokens=16, dim=16, seq_len=12, seq_hw=(3, 4), depth=1,
        dim_head=8, heads=2, text_embed_dim=16, rngs=nnx.Rngs(0),
    )
    ok = tr._positions(12, grid=(3, 4))  # trained orientation
    assert ok.shape == (12, 16)
    with pytest.raises(AssertionError, match="trained grid"):
        tr._positions(12, grid=(4, 3))  # transposed: must refuse
    # seq_hw must tile seq_len
    with pytest.raises(AssertionError, match="tile"):
        MaskGitTransformer(
            num_tokens=16, dim=16, seq_len=12, seq_hw=(5, 3), depth=1,
            dim_head=8, heads=2, text_embed_dim=16, rngs=nnx.Rngs(0),
        )


def test_flat_nonsquare_training_ids_rejected():
    """ADVICE r3: flat (b, seq) pre-tokenized ids at a non-native,
    non-square length cannot name their grid — training must reject them
    loudly instead of silently using prefix positions."""
    import jax
    import pytest
    from flax import nnx

    from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit
    from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer

    tr = MaskGitTransformer(
        num_tokens=16, dim=16, seq_len=16, depth=1, dim_head=8, heads=2,
        text_embed_dim=16, rngs=nnx.Rngs(0),
    )
    mg = MaskGit(image_size=16, transformer=tr)
    te = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16))
    flat = jax.random.randint(jax.random.PRNGKey(1), (2, 12), 0, 16)
    with pytest.raises(AssertionError, match="aspect ratio"):
        mg(flat, rng=jax.random.PRNGKey(2), text_embeds=te)
    # the same length as a named 3-D grid trains fine
    grid = flat.reshape(2, 3, 4)
    loss = mg(grid, rng=jax.random.PRNGKey(2), text_embeds=te)
    assert float(loss) > 0


def test_muse_rejects_non_integral_cascade_ratio():
    import pytest

    from muse_maskgit_pytorch_tpu.models.maskgit import Muse

    from tests.test_maskgit import base_maskgit, superres_maskgit

    base = base_maskgit(image_size=24)  # 24 -> 32 is not integral
    sr = superres_maskgit()
    with pytest.raises(AssertionError, match="exact\\s+multiple|exact multiple"):
        Muse(base, sr)
