"""Parity tests: Pallas flash kernel (interpret mode on CPU) vs XLA attention.

SURVEY.md §7 build step 3: "parity vs naive einsum path (attend.py:121-140)".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muse_maskgit_pytorch_tpu.ops.attention import attend, xla_attention


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
