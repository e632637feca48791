"""Tests for the VQ search kernel and the LFQ / EMA-VQ quantizers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from muse_maskgit_pytorch_tpu.ops.vq import nearest_code_pallas, nearest_code_xla
from muse_maskgit_pytorch_tpu.models.quantizers import LFQ, VectorQuantizeEMA, l2norm


def test_nearest_code_pallas_matches_xla(rng):
    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (100, 64))
    cb = jax.random.normal(k2, (1000, 64))
    ref = nearest_code_xla(x, cb)
    out = nearest_code_pallas(x, cb, interpret=True, block_n=32, block_k=256)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_nearest_code_pallas_cosine(rng):
    k1, k2 = jax.random.split(rng)
    x = l2norm(jax.random.normal(k1, (64, 32)))
    cb = l2norm(jax.random.normal(k2, (513, 32)))
    zeros = jnp.zeros(513)
    ref = nearest_code_xla(x, cb, cb_sq=zeros)
    out = nearest_code_pallas(x, cb, cb_sq=zeros, interpret=True, block_k=128)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_lfq_roundtrip(rng):
    q = LFQ(dim=32, codebook_size=256, rngs=nnx.Rngs(0))
    x = jax.random.normal(rng, (2, 4, 4, 32))
    quantized, indices, aux = q(x, train=True)
    assert quantized.shape == x.shape
    assert indices.shape == (2, 4, 4)
    assert np.all(np.asarray(indices) >= 0) and np.all(np.asarray(indices) < 256)
    assert np.isfinite(float(aux))
    # indices -> codes -> must match the quantized pre-projection bits
    codes = q.indices_to_codes(indices)
    assert codes.shape == x.shape


def test_lfq_bit_codec_roundtrip():
    q = LFQ(dim=8, codebook_size=256, rngs=nnx.Rngs(0))  # no projections
    ids = jnp.arange(256)
    bits = q.indices_to_bits(ids)
    back = q.bits_to_indices(bits > 0)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(ids))


def test_lfq_no_projection_identity(rng):
    # dim == log2(codebook_size): quantized output is exactly sign(x)
    q = LFQ(dim=8, codebook_size=256, rngs=nnx.Rngs(0))
    x = jax.random.normal(rng, (16, 8))
    quantized, indices, _ = q(x, train=False)
    np.testing.assert_array_equal(np.asarray(quantized), np.sign(np.asarray(x)))
    codes = q.indices_to_codes(indices)
    np.testing.assert_array_equal(np.asarray(codes), np.asarray(quantized))


def test_lfq_ste_gradient(rng):
    q = LFQ(dim=8, codebook_size=256, rngs=nnx.Rngs(0))

    def loss(x):
        quantized, _, _ = q(x, train=False)
        return jnp.sum(quantized * jnp.arange(8.0))

    g = jax.grad(loss)(jax.random.normal(rng, (4, 8)))
    # straight-through: gradient passes as if identity
    np.testing.assert_allclose(
        np.asarray(g), np.tile(np.arange(8.0), (4, 1)), atol=1e-6
    )


def test_lfq_entropy_loss_prefers_confident_diverse(rng):
    q = LFQ(dim=8, codebook_size=256, rngs=nnx.Rngs(0))
    # confident diverse bits: large magnitudes, random signs
    diverse = jnp.where(jax.random.uniform(rng, (512, 8)) > 0.5, 1.0, -1.0) * 5
    # collapsed: all samples identical
    collapsed = jnp.ones((512, 8)) * 5
    assert float(q._entropy_aux_loss(diverse)) < float(q._entropy_aux_loss(collapsed))


def test_ema_vq_basic(rng):
    q = VectorQuantizeEMA(
        dim=16, codebook_size=32, codebook_dim=8, kmeans_init=False, rngs=nnx.Rngs(0)
    )
    x = jax.random.normal(rng, (2, 4, 4, 16))
    quantized, indices, aux = q(x, train=True, rng=rng)
    assert quantized.shape == x.shape
    assert indices.shape == (2, 4, 4)
    assert float(aux) >= 0


def test_ema_vq_codebook_moves_toward_data(rng):
    q = VectorQuantizeEMA(
        dim=4,
        codebook_size=4,
        codebook_dim=4,
        kmeans_init=False,
        use_cosine_sim=False,
        decay=0.5,
        rngs=nnx.Rngs(0),
    )
    x = jax.random.normal(rng, (256, 4)) + 3.0
    before = np.asarray(q.codebook[...]).copy()
    for _ in range(20):
        q(x, train=True)
    after = np.asarray(q.codebook[...])
    used = np.unique(np.asarray(q(x, train=False)[1]))
    # codes actually used must be closer to the data mean than before
    d_before = np.linalg.norm(before[used] - 3.0, axis=-1).mean()
    d_after = np.linalg.norm(after[used] - 3.0, axis=-1).mean()
    assert d_after < d_before


def test_ema_vq_kmeans_init(rng):
    q = VectorQuantizeEMA(
        dim=8, codebook_size=16, codebook_dim=8, kmeans_init=True, rngs=nnx.Rngs(0)
    )
    assert not bool(q.initted[...])
    x = jax.random.normal(rng, (4, 8, 8, 8))
    q(x, train=True, rng=rng)
    assert bool(q.initted[...])


def test_ema_vq_eval_does_not_mutate(rng):
    q = VectorQuantizeEMA(
        dim=8, codebook_size=16, codebook_dim=8, kmeans_init=False, rngs=nnx.Rngs(0)
    )
    before = np.asarray(q.codebook[...]).copy()
    q(jax.random.normal(rng, (4, 8)), train=False)
    np.testing.assert_array_equal(before, np.asarray(q.codebook[...]))


def test_ema_vq_dead_code_revival(rng):
    """Expired-code revival (vector_quantize_pytorch's
    threshold_ema_dead_code; off by default upstream and here)."""
    q = VectorQuantizeEMA(
        dim=4, codebook_size=8, codebook_dim=4, kmeans_init=False,
        use_cosine_sim=False, decay=0.5, threshold_ema_dead_code=0.5,
        rngs=nnx.Rngs(0),
    )
    # data clustered far from most random-init codes: most codes go dead
    x = jax.random.normal(rng, (64, 4)) * 0.1 + 5.0
    for i in range(5):
        q(x, train=True, rng=jax.random.fold_in(rng, i))
    # revived codes sit near the data, so assignments spread across several
    ids = np.asarray(q(x, train=False)[1])
    assert len(np.unique(ids)) >= 2
    # every code is now near the data mean (dead ones re-seeded from batch)
    cb = np.asarray(q.codebook[...])
    assert np.linalg.norm(cb - 5.0, axis=-1).max() < 3.0


@pytest.mark.slow
def test_ema_vq_production_scale():
    """Full reference-scale quantizer (K=65536, d=256, cosine, kmeans init,
    dead-code revival — reference vq_kwargs at vqgan_vae.py:297-303) run
    together through a few update steps. The real-TPU counterpart (300 GAN
    trainer steps + Pallas search at full K) is `bench_ema_vq.py`; this pins
    the same machinery on CPU with 2 kmeans iters to bound runtime."""
    K, d = 65536, 256
    q = VectorQuantizeEMA(
        dim=64,
        codebook_size=K,
        codebook_dim=d,
        decay=0.8,
        commitment_weight=1.0,
        kmeans_init=True,
        kmeans_iters=2,
        use_cosine_sim=True,
        threshold_ema_dead_code=2.0,
        rngs=nnx.Rngs(0),
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2048, 64))

    assert not bool(q.initted[...])
    quantized, ids, aux = q(x, train=True, rng=rng)
    assert bool(q.initted[...])
    assert quantized.shape == x.shape and ids.shape == (2048,)
    assert ids.min() >= 0 and ids.max() < K
    assert np.isfinite(float(aux))

    # more updates: EMA + revival at full K stay finite and codes track data
    for i in range(2):
        q(x, train=True, rng=jax.random.fold_in(rng, i))
    cb = np.asarray(q.codebook[...])
    assert np.isfinite(cb).all()
    # cosine codebook stays unit-norm after EMA + revival
    norms = np.linalg.norm(cb, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    # assignments use many distinct codes (kmeans seeded from 2048 rows)
    assert len(np.unique(np.asarray(ids))) > 256


def test_nearest_code_pallas_under_grad(rng):
    """The EMA-VQ commit loss differentiates THROUGH code that calls the
    search (indices are discrete; gradient must flow around, not through).
    Round 2 regression: on TPU the Pallas branch crashed jax.grad with
    pallas_call's missing JVP rule — caught only at production scale because
    CPU tests dispatch to XLA. `nearest_code` now stop_gradients the Pallas
    branch; this drives it under grad via the interpreter."""
    from muse_maskgit_pytorch_tpu.ops.vq import nearest_code

    k1, k2 = jax.random.split(rng)
    x = jax.random.normal(k1, (32, 16))
    cb = jax.random.normal(k2, (64, 16))

    def loss(x, cb):
        idx = nearest_code(x, cb, impl="pallas", interpret=True)
        quant = cb[idx]
        # straight-through commit term, as in VectorQuantizeEMA.__call__
        return jnp.mean(jnp.square(jax.lax.stop_gradient(quant) - x))

    g = jax.grad(loss, argnums=(0, 1))(x, cb)
    assert np.isfinite(np.asarray(g[0])).all()
    ref_idx = np.asarray(nearest_code(x, cb, impl="xla"))
    out_idx = np.asarray(nearest_code(x, cb, impl="pallas", interpret=True))
    np.testing.assert_array_equal(out_idx, ref_idx)


# ---------------------------------------------------------------------------
# FSQ (beyond-reference third quantizer family)
# ---------------------------------------------------------------------------


def test_fsq_roundtrip_and_range(rng):
    from muse_maskgit_pytorch_tpu.models.quantizers import FSQ

    q = FSQ(dim=16, levels=(8, 6, 5), rngs=nnx.Rngs(0))
    assert q.codebook_size == 240
    x = jax.random.normal(rng, (2, 4, 4, 16)) * 3.0
    out, ids, aux = q(x, train=True)
    assert out.shape == x.shape and ids.shape == (2, 4, 4)
    assert float(aux) == 0.0  # FSQ has no auxiliary losses
    i = np.asarray(ids)
    assert (i >= 0).all() and (i < 240).all()
    # indices -> codes reproduces the quantized output exactly
    codes = q.indices_to_codes(ids)
    np.testing.assert_allclose(np.asarray(codes), np.asarray(out), atol=1e-5)


def test_fsq_digit_codec_bijective():
    from muse_maskgit_pytorch_tpu.models.quantizers import FSQ

    q = FSQ(dim=3, levels=(4, 3, 2), rngs=nnx.Rngs(0))
    ids = jnp.arange(q.codebook_size)
    digits = q.indices_to_digits(ids)
    # every digit within its radix, and the codec round-trips all 24 codes
    assert (np.asarray(digits) < np.asarray([4, 3, 2])).all()
    np.testing.assert_array_equal(np.asarray(q.digits_to_indices(digits)), np.asarray(ids))


def test_fsq_no_projection_identity_dim(rng):
    from muse_maskgit_pytorch_tpu.models.quantizers import FSQ

    q = FSQ(dim=3, levels=(8, 6, 5), rngs=nnx.Rngs(0))
    assert not q.has_projections
    x = jax.random.normal(rng, (32, 3))
    out, ids, _ = q(x, train=True)
    # quantized values sit on the normalized grid in [-1, 1]
    o = np.asarray(out)
    assert (o >= -1.0 - 1e-6).all() and (o <= 1.0 + 1e-6).all()
    # deterministic: same input -> same ids
    _, ids2, _ = q(x, train=False)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))


def test_fsq_ste_gradient(rng):
    from muse_maskgit_pytorch_tpu.models.quantizers import FSQ

    q = FSQ(dim=8, levels=(8, 8, 8), rngs=nnx.Rngs(0))

    def loss(x):
        out, _, _ = q(x, train=True)
        return jnp.sum(jnp.square(out))

    g = jax.grad(loss)(jax.random.normal(rng, (16, 8)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0  # STE passes gradients through


def test_fsq_vae_end_to_end(rng):
    from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE

    vae = VQGanVAE(
        dim=16, layers=2, fsq_levels=(8, 6, 5), use_vgg_and_gan=False,
        rngs=nnx.Rngs(0),
    )
    assert vae.codebook_size == 240
    img = jax.random.uniform(rng, (2, 16, 16, 3))
    fmap, ids, aux = vae.encode(img, train=True)
    assert ids.shape == (2, 4, 4) and float(aux) == 0.0
    out = vae.decode_from_ids(ids)
    assert out.shape == (2, 16, 16, 3)
    # decode_from_ids goes through the same codes the encoder produced
    np.testing.assert_allclose(
        np.asarray(vae.decode(fmap)), np.asarray(out), atol=1e-5
    )


def test_fsq_vae_trains(rng):
    """Recon loss decreases with an FSQ bottleneck (the no-aux-loss training
    path: total loss is recon only)."""
    import optax
    from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE

    vae = VQGanVAE(
        dim=16, layers=2, fsq_levels=(8, 6, 5), use_vgg_and_gan=False,
        rngs=nnx.Rngs(0),
    )
    img = jax.random.uniform(rng, (4, 16, 16, 3))
    graphdef, params, rest = nnx.split(vae, nnx.Param, ...)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            m = nnx.merge(graphdef, p, rest)
            return m(img, return_loss=True, train=True)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_fsq_maskgit_end_to_end(rng):
    """Full MaskGit stack over an FSQ tokenizer (non-power-of-2 vocab):
    training loss finite, generated ids stay inside the FSQ vocabulary."""
    from muse_maskgit_pytorch_tpu.models import t5 as t5mod
    from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit
    from muse_maskgit_pytorch_tpu.models.t5 import T5Config
    from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer
    from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE

    if "test/tiny-t5" not in t5mod.T5_CONFIGS:
        t5mod.T5_CONFIGS["test/tiny-t5"] = T5Config(
            d_model=32, d_ff=64, num_heads=2, d_kv=16, num_layers=2, gated=True
        )
    vae = VQGanVAE(
        dim=16, layers=2, fsq_levels=(8, 6, 5), use_vgg_and_gan=False,
        rngs=nnx.Rngs(0),
    )
    tr = MaskGitTransformer(
        num_tokens=vae.codebook_size, dim=32, seq_len=16, depth=1,
        dim_head=16, heads=2, t5_name="test/tiny-t5", rngs=nnx.Rngs(0),
    )
    mg = MaskGit(image_size=16, transformer=tr, vae=vae)
    te = jax.random.normal(rng, (2, 6, 32))
    loss = mg(jax.random.uniform(rng, (2, 16, 16, 3)), rng=rng, text_embeds=te)
    assert np.isfinite(float(loss))
    ids = np.asarray(
        mg.generate(text_embeds=te, rng=rng, timesteps=3, return_ids=True)
    )
    assert (ids >= 0).all() and (ids < vae.codebook_size).all()


def test_fsq_two_level_channels_finite(rng):
    """Regression: levels containing 2 (half_l must stay above the 0.5 grid
    offset or arctanh goes NaN) — all channels finite, full digit range used."""
    from muse_maskgit_pytorch_tpu.models.quantizers import FSQ

    q = FSQ(dim=3, levels=(4, 3, 2), rngs=nnx.Rngs(0))
    x = jax.random.normal(rng, (512, 3)) * 4.0
    out, ids, _ = q(x, train=True)
    assert np.isfinite(np.asarray(out)).all()
    i = np.asarray(ids)
    assert (i >= 0).all() and (i < 24).all()
    digs = np.asarray(q._quantize_digits(x))
    for c, l in enumerate((4, 3, 2)):
        assert set(np.unique(digs[:, c])) == set(range(l)), (c, np.unique(digs[:, c]))
