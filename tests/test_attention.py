"""Parity tests: Pallas flash kernel (interpret mode on CPU) vs XLA attention.

SURVEY.md §7 build step 3: "parity vs naive einsum path (attend.py:121-140)".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muse_maskgit_pytorch_tpu.ops.attention import attend, qknorm_attend, xla_attention


def _rand_qkv(key, b=2, h=4, n=48, m=67, d=64, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, n, d), dtype)
    k = jax.random.normal(kk, (b, h, m, d), dtype)
    v = jax.random.normal(kv, (b, h, m, d), dtype)
    return q, k, v


@pytest.mark.parametrize("scale", [None, 8.0])
def test_flash_matches_xla_no_mask(rng, scale):
    q, k, v = _rand_qkv(rng)
    ref = xla_attention(q, k, v, scale=scale)
    out = attend(q, k, v, scale=scale, impl="flash", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-2, rtol=0)


def test_flash_matches_xla_with_mask(rng):
    q, k, v = _rand_qkv(rng, m=33)
    mask = jax.random.uniform(rng, (2, 33)) < 0.6
    mask = mask.at[:, 0].set(True)  # null-KV position always attendable
    ref = xla_attention(q, k, v, mask=mask, scale=8.0)
    out = attend(q, k, v, mask=mask, scale=8.0, impl="flash", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-2, rtol=0)


def test_flash_multiblock_kv(rng):
    # kv length spanning multiple block_k chunks exercises the online softmax
    q, k, v = _rand_qkv(rng, n=16, m=300, d=32)
    mask = jax.random.uniform(rng, (2, 300)) < 0.8
    ref = xla_attention(q, k, v, mask=mask, scale=8.0)
    out = attend(
        q, k, v, mask=mask, scale=8.0, impl="flash", interpret=True, block_k=128
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-2, rtol=0)


def test_flash_gradients_match_xla(rng):
    q, k, v = _rand_qkv(rng, b=1, h=2, n=24, m=24, d=32)
    mask = jnp.ones((1, 24), bool).at[:, -5:].set(False)

    def loss_flash(q, k, v):
        return attend(q, k, v, mask=mask, scale=8.0, impl="flash", interpret=True).sum()

    def loss_xla(q, k, v):
        return xla_attention(q, k, v, mask=mask, scale=8.0).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for gf, gx in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=5e-3, rtol=5e-3)


def test_bf16_inputs(rng):
    q, k, v = _rand_qkv(rng, dtype=jnp.bfloat16, n=32, m=32)
    ref = xla_attention(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), scale=8.0)
    out = attend(q, k, v, scale=8.0, impl="flash", interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=0.1, rtol=0.05
    )


# -- fully-fused qk-norm attention (the models' production path) -------------


def _raw_qkv(key, b=2, h=4, n=48, m=67, d=64, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, n, h, d), dtype)
    k = jax.random.normal(kk, (b, m, h, d), dtype)
    v = jax.random.normal(kv, (b, m, h, d), dtype)
    return q, k, v


def _legacy_reference(q, k, v, nk, nv, qs, ks, mask, scale):
    """The pre-fusion composition: transpose -> concat null KV -> l2norm ->
    xla attention (what Attention.__call__'s xla path does)."""
    from muse_maskgit_pytorch_tpu.models.transformer import l2norm

    b, n, h, d = q.shape
    m = k.shape[1]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    nk_b = jnp.broadcast_to(nk[:, None, :], (h, 1, d))[None].repeat(b, 0)
    nv_b = jnp.broadcast_to(nv[:, None, :], (h, 1, d))[None].repeat(b, 0)
    kt = jnp.concatenate([nk_b, kt], axis=2)
    vt = jnp.concatenate([nv_b, vt], axis=2)
    qt = l2norm(qt) * qs
    kt = l2norm(kt) * ks
    full_mask = (
        jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)
        if mask is not None
        else None
    )
    out = xla_attention(qt, kt, vt, mask=full_mask, scale=scale)
    return out.transpose(0, 2, 1, 3)


def _fused_params(key, d=64, h=4):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    nk = jax.random.normal(k1, (h, d))
    nv = jax.random.normal(k2, (h, d))
    qs = jax.random.uniform(k3, (d,), minval=0.5, maxval=1.5)
    ks = jax.random.uniform(k4, (d,), minval=0.5, maxval=1.5)
    return nk, nv, qs, ks


def test_qknorm_xla_matches_legacy_composition(rng):
    q, k, v = _raw_qkv(rng)
    nk, nv, qs, ks = _fused_params(jax.random.PRNGKey(7))
    mask = jax.random.uniform(rng, (2, 67)) < 0.6
    ref = _legacy_reference(q, k, v, nk, nv, qs, ks, mask, 8.0)
    out = qknorm_attend(q, k, v, nk, nv, qs, ks, mask=mask, scale=8.0, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("masked", [False, True])
def test_qknorm_flash_matches_xla(rng, masked):
    q, k, v = _raw_qkv(rng, m=300, d=32)
    nk, nv, qs, ks = _fused_params(jax.random.PRNGKey(8), d=32)
    mask = (jax.random.uniform(rng, (2, 300)) < 0.7) if masked else None
    ref = qknorm_attend(q, k, v, nk, nv, qs, ks, mask=mask, scale=8.0, impl="xla")
    out = qknorm_attend(
        q, k, v, nk, nv, qs, ks, mask=mask, scale=8.0,
        impl="flash", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-2, rtol=0)


def test_qknorm_flash_rejects_oversized_kv(rng):
    # ADVICE r2: the kernel holds a whole batch row's K/V in VMEM (no kv
    # chunking); a too-long context must fail loudly, not at Mosaic lowering
    q, k, v = _raw_qkv(rng, b=1, n=8, m=16384, d=64, h=2)
    nk, nv, qs, ks = _fused_params(jax.random.PRNGKey(11), d=64, h=2)
    with pytest.raises(AssertionError, match="VMEM"):
        qknorm_attend(q, k, v, nk, nv, qs, ks, scale=8.0, impl="flash", interpret=True)


def test_qknorm_flash_fully_masked_context(rng):
    # CFG null half: every REAL kv position masked out -> attends only to the
    # null pair, output = nv per head
    q, k, v = _raw_qkv(rng, b=1, n=8, m=16, d=32, h=2)
    nk, nv, qs, ks = _fused_params(jax.random.PRNGKey(9), d=32, h=2)
    mask = jnp.zeros((1, 16), bool)
    out = qknorm_attend(
        q, k, v, nk, nv, qs, ks, mask=mask, scale=8.0, impl="flash", interpret=True
    )
    expect = jnp.broadcast_to(nv[None, None], (1, 8, 2, 32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-3, rtol=1e-4)


def test_qknorm_flash_gradients_match_xla(rng):
    q, k, v = _raw_qkv(rng, b=1, h=2, n=24, m=24, d=32)
    nk, nv, qs, ks = _fused_params(jax.random.PRNGKey(10), d=32, h=2)
    mask = jnp.ones((1, 24), bool).at[:, -5:].set(False)

    def loss(impl):
        def f(q, k, v, nk, nv, qs, ks):
            return qknorm_attend(
                q, k, v, nk, nv, qs, ks, mask=mask, scale=8.0,
                impl=impl, interpret=True,
            ).sum()
        return f

    g_flash = jax.grad(loss("flash"), argnums=tuple(range(7)))(q, k, v, nk, nv, qs, ks)
    g_xla = jax.grad(loss("xla"), argnums=tuple(range(7)))(q, k, v, nk, nv, qs, ks)
    for gf, gx in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=5e-3, rtol=5e-3)


def test_attention_module_flash_matches_xla(rng):
    """Attention.__call__ fused-flash path == its legacy xla path."""
    from flax import nnx

    from muse_maskgit_pytorch_tpu.models.transformer import Attention

    attn = Attention(dim=64, dim_head=16, heads=4, cross_attend=True, rngs=nnx.Rngs(0))
    x = jax.random.normal(rng, (2, 12, 64))
    ctx = jax.random.normal(jax.random.PRNGKey(5), (2, 9, 64))
    cmask = jnp.ones((2, 9), bool).at[1, -3:].set(False)

    ref = attn(x, context=ctx, context_mask=cmask, impl="xla")
    out = attn(x, context=ctx, context_mask=cmask, impl="flash")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=1e-3)
