"""Attention kernels: Pallas TPU flash attention + XLA reference path.

TPU-native replacement for the reference's `Attend` dispatch layer
(`/root/reference/muse_maskgit_pytorch/attend.py:34-140`), which at runtime
always falls through to a blockwise CUDA flash attention
(`FlashAttentionFunction.apply(q, k, v, mask, False, 512, 512)`, attend.py:88).

Capabilities replicated, TPU-first:
  * custom fixed softmax scale (the models use qk-l2norm attention with
    scale 8, reference muse_maskgit_pytorch.py:98,121-122) — here the scale is
    folded into q before the kernel instead of the reference's
    `rescale ** 0.5` hack on both q and k (attend.py:73-79);
  * boolean key-position masks (the cross-attention context mask,
    attend.py:127-129) — carried as an additive f32 bias so the kernel has a
    single fused code path;
  * non-causal, layout (batch, heads, q_len, head_dim).

The forward is a single Pallas kernel per (batch*head, q-block): K/V live in
VMEM and are consumed in `block_k` chunks with an online-softmax accumulator,
so memory is O(block_q * block_k) regardless of kv length. The backward is a
recompute-based XLA VJP: at this framework's sequence lengths (<= ~2.3k kv
positions: 1024 image tokens + 256 text + 1024 conditioning + 1 null KV,
SURVEY.md §5) a bespoke backward kernel buys nothing over XLA's fused one.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# XLA reference path (mirrors the reference's naive einsum path,
# attend.py:121-140)
# ---------------------------------------------------------------------------


def xla_attention(
    q: Array,
    k: Array,
    v: Array,
    mask: Optional[Array] = None,
    scale: Optional[float] = None,
    dropout: float = 0.0,
    dropout_rng: Optional[Array] = None,
) -> Array:
    """Plain attention; XLA fuses this well for small/medium sequences.

    q: (b, h, n, d);  k, v: (b, h, m, d);  mask: bool (b, m) over kv positions.
    Attention-weight dropout mirrors reference attend.py:134 (the models
    never enable it — default 0).
    """
    scale = q.shape[-1] ** -0.5 if scale is None else scale
    sim = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    if mask is not None:
        sim = jnp.where(mask[:, None, None, :], sim, NEG_INF)
    attn = jax.nn.softmax(sim, axis=-1)
    if dropout > 0.0:
        assert dropout_rng is not None, "attention dropout requires a key"
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout), 0.0)
    return jnp.einsum("bhij,bhjd->bhid", attn, v)


# ---------------------------------------------------------------------------
# Pallas flash kernel
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_k: int):
    """One (batch*head, q-block) program: online softmax over kv chunks.

    Dots run in the input dtype (bf16 inputs hit the MXU's fast path) with
    f32 accumulation; the softmax statistics stay f32."""
    q = q_ref[0]  # (bq, d) — scale already folded in
    block_q, d = q.shape
    kv_len = k_ref.shape[1]
    num_kv_blocks = kv_len // block_k

    def body(i, carry):
        acc, m_i, l_i = carry
        k_blk = k_ref[0, pl.ds(i * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q,
            k_blk,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk) f32
        s = s + bias_ref[0, 0, pl.ds(i * block_k, block_k)][None, :]

        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_i - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_i + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype),
            v_blk,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc_new, m_new, l_new

    init = (
        jnp.zeros((block_q, d), jnp.float32),
        jnp.full((block_q, 1), NEG_INF, jnp.float32),
        jnp.zeros((block_q, 1), jnp.float32),
    )
    acc, _, l_i = jax.lax.fori_loop(0, num_kv_blocks, body, init)
    l_i = jnp.where(l_i == 0.0, 1.0, l_i)  # fully-masked rows: don't-care
    o_ref[0] = (acc / l_i).astype(o_ref.dtype)


def _flash_forward(
    q: Array,
    k: Array,
    v: Array,
    bias: Array,
    *,
    block_q: int,
    block_k: int,
    interpret: bool,
) -> Array:
    b, h, n, d = q.shape
    m = k.shape[2]
    bh = b * h

    n_pad = _round_up(n, block_q)
    m_pad = _round_up(m, block_k)

    qf = q.reshape(bh, n, d)
    kf = k.reshape(bh, m, d)
    vf = v.reshape(bh, m, d)
    if n_pad != n:
        qf = jnp.pad(qf, ((0, 0), (0, n_pad - n), (0, 0)))
    if m_pad != m:
        kf = jnp.pad(kf, ((0, 0), (0, m_pad - m), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, m_pad - m), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, m_pad - m)), constant_values=NEG_INF)
    bias3 = bias.reshape(bias.shape[0], 1, m_pad)

    grid = (bh, n_pad // block_q)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            # bias is per-batch: program i covers batch i // h
            pl.BlockSpec((1, 1, m_pad), lambda i, j, h=h: (i // h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * n_pad * m_pad * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * qf.dtype.itemsize,
            transcendentals=bh * n_pad * m_pad,
        ),
        interpret=interpret,
    )(qf, kf, vf, bias3)

    return out[:, :n, :].reshape(b, h, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention(q, k, v, bias, scale, block_q, block_k, interpret):
    q = q * scale
    return _flash_forward(
        q, k, v, bias, block_q=block_q, block_k=block_k, interpret=interpret
    )


def _flash_fwd(q, k, v, bias, scale, block_q, block_k, interpret):
    out = _flash_attention(q, k, v, bias, scale, block_q, block_k, interpret)
    return out, (q, k, v, bias)


def _flash_bwd(scale, block_q, block_k, interpret, res, g):
    # Recompute-based backward via XLA: O(n*m) memory is fine at these
    # sequence lengths, and XLA fuses the whole thing.
    q, k, v, bias = res

    def ref(q, k, v):
        sim = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
        sim = sim + bias[:, None, None, :]
        attn = jax.nn.softmax(sim, axis=-1)
        return jnp.einsum("bhij,bhjd->bhid", attn, v)

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# public entry point
# ---------------------------------------------------------------------------


def attend(
    q: Array,
    k: Array,
    v: Array,
    mask: Optional[Array] = None,
    scale: Optional[float] = None,
    impl: str = "auto",
    block_q: int = 256,
    block_k: int = 512,
    interpret: Optional[bool] = None,
    dropout: float = 0.0,
    dropout_rng: Optional[Array] = None,
) -> Array:
    """Hardware-aware attention dispatch (role of reference `Attend.forward`,
    attend.py:109-119).

    Args:
      q: (b, h, n, d);  k, v: (b, h, m, d).
      mask: optional bool (b, m) — True = attend to that kv position.
      scale: fixed softmax scale (default d ** -0.5).
      impl: 'auto' | 'flash' | 'xla'. 'auto' picks the Pallas kernel on TPU
        and XLA elsewhere.
    """
    if impl == "auto":
        impl = "flash" if jax.default_backend() == "tpu" else "xla"
    scale = q.shape[-1] ** -0.5 if scale is None else float(scale)

    if impl == "xla":
        return xla_attention(
            q, k, v, mask=mask, scale=scale, dropout=dropout, dropout_rng=dropout_rng
        )

    assert impl == "flash", f"unknown attention impl {impl!r}"
    assert dropout == 0.0, "attention dropout is only supported on the XLA path"
    b, _, _, _ = q.shape
    m = k.shape[2]
    if mask is None:
        bias = jnp.zeros((b, m), jnp.float32)
    else:
        bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)

    block_q = min(block_q, _round_up(q.shape[2], 8))
    block_k = min(block_k, _round_up(m, 128))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash_attention(q, k, v, bias, scale, block_q, block_k, interpret)
