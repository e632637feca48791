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
# fully-fused qk-norm attention (the models' production path)
# ---------------------------------------------------------------------------
#
# The plain flash kernel above loses end-to-end below kv ~2k despite winning
# every isolated microbench (BASELINE.md r1): each pallas_call is a fusion
# barrier, so the surrounding elementwise chain — head transpose, null-KV
# concat, q/k l2norm, learned per-dim scales — becomes separate XLA fusions
# with their own HBM round-trips. This kernel erases that integration cost by
# consuming the RAW projection outputs in (b, n, h, d) layout and doing the
# whole chain in VMEM:
#   * q/k l2-normalization (f32) + learned q_scale/k_scale + fixed softmax
#     scale (reference muse_maskgit_pytorch.py:121-122,151-153);
#   * the per-head learned null KV pair as the online-softmax init state
#     (reference :145-149; always attendable, :155-157) — no concat/copy of
#     the full K/V;
#   * additive key bias (context mask) + online-softmax flash attention.
# One HBM read of q/k/v, one write of o, zero intermediate passes.


# v5e-tuned (BASELINE.md r2): K/V VMEM budget and max batch rows per program
_QKNORM_KV_VMEM_BUDGET = int(6e6)
_QKNORM_MAX_BLOCK_B = 4


def _qknorm_kernel(
    q_ref, k_ref, v_ref, nk_ref, nv_ref, qs_ref, ks_ref, bias_ref, o_ref,
    *, scale: float, block_b: int
):
    """One (batch, q-block) program covering ALL heads.

    Folding the head loop INSIDE the program (statically unrolled — h is
    small) is the key to beating XLA at this model's short kv lengths: a
    (b*h, q-block) grid puts hundreds of micro-programs on the ONE
    sequential TensorCore and the per-program overhead (~0.4 ms/call
    aggregate, measured r1 AND re-measured after full elementwise fusion)
    dominates the math. With heads inside, the grid is (b, n/block_q)
    programs, each doing h MXU dot pairs over kv resident in VMEM — and the
    kernel consumes the projections' NATIVE (b, n, h, d) layout, so no
    transposes exist anywhere in the attention op."""
    hd = q_ref.shape[2]
    d = qs_ref.shape[1]
    h = hd // d
    dot_dtype = k_ref.dtype

    for ib in range(block_b):  # static unroll over batch rows in the program
        bias = bias_ref[ib, 0][None, :].astype(jnp.float32)  # (1, m_pad)
        outs = []
        for ih in range(h):  # static unroll; static lane slices per head
            q = q_ref[ib, :, ih * d : (ih + 1) * d].astype(jnp.float32)  # (bq, d)
            q = q * jax.lax.rsqrt(jnp.sum(q * q, axis=-1, keepdims=True) + 1e-12)
            # fold the learned per-dim scale AND the fixed softmax scale into q
            q = (q * (qs_ref[0].astype(jnp.float32) * scale)).astype(dot_dtype)

            k_all = k_ref[ib, :, ih * d : (ih + 1) * d].astype(jnp.float32)  # (m_pad, d)
            k_all = k_all * jax.lax.rsqrt(
                jnp.sum(k_all * k_all, axis=-1, keepdims=True) + 1e-12
            )
            k_all = (k_all * ks_ref[0].astype(jnp.float32)).astype(dot_dtype)
            v_all = v_ref[ib, :, ih * d : (ih + 1) * d]

            s = jax.lax.dot_general(
                q, k_all, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # (bq, m_pad) f32
            s = s + bias

            # null position (always attendable, bias 0) — multiply-reduce on
            # the VPU (a (1, d) dot operand trips a Mosaic bf16-broadcast bug)
            nk = nk_ref[0, ih * d : (ih + 1) * d].astype(jnp.float32)
            nk = nk * jax.lax.rsqrt(jnp.sum(nk * nk) + 1e-12)
            nk = nk * ks_ref[0].astype(jnp.float32)
            s0 = jnp.sum(
                q.astype(jnp.float32) * nk[None, :], axis=-1, keepdims=True
            )  # (bq, 1)

            m_i = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s0)
            p = jnp.exp(s - m_i)  # (bq, m_pad)
            p0 = jnp.exp(s0 - m_i)  # (bq, 1)
            l_i = jnp.sum(p, axis=-1, keepdims=True) + p0
            acc = jax.lax.dot_general(
                p.astype(v_all.dtype), v_all, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = acc + p0 * nv_ref[0, ih * d : (ih + 1) * d].astype(jnp.float32)[None, :]
            outs.append((acc / l_i).astype(o_ref.dtype))

        o_ref[ib] = jnp.concatenate(outs, axis=-1)  # (bq, h*d)


def _qknorm_xla(q, k, v, nk, nv, q_scale, k_scale, bias, scale):
    """Reference semantics of the fused kernel in plain XLA ops (CPU path,
    VJP recompute, and the kernel's parity oracle). Layout (b, n, h, d)."""

    def norm(t):
        t32 = t.astype(jnp.float32)
        return t32 * jax.lax.rsqrt(
            jnp.sum(t32 * t32, axis=-1, keepdims=True) + 1e-12
        )

    b, n, h, d = q.shape
    m = k.shape[1]
    qn = norm(q) * (q_scale * scale)
    kn = norm(k) * k_scale
    nkn = norm(nk) * k_scale  # (h, d)
    sim = jnp.einsum("bnhd,bmhd->bhnm", qn, kn)
    sim = sim + bias[:, None, None, :]
    s0 = jnp.einsum("bnhd,hd->bhn", qn, nkn)[..., None]  # null position
    full = jnp.concatenate([s0, sim], axis=-1)
    attn = jax.nn.softmax(full, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn[..., 1:], v.astype(jnp.float32))
    out = out + attn[..., :1].transpose(0, 2, 1, 3) * nv.astype(jnp.float32)[
        None, None, :, :
    ]
    return out.astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _qknorm_flash(q, k, v, nk, nv, qs, ks, bias, scale, block_q, interpret):
    b, n, h, d = q.shape
    m = k.shape[1]

    n_pad = _round_up(n, block_q)
    m_pad = _round_up(m, 128)

    # The kernel holds ONE batch row's full K/V in VMEM (no kv chunking —
    # unnecessary at this model family's kv <= ~1.4k). Fail loudly before
    # Mosaic lowering does when a context is too long for that design.
    kv_row_bytes = 2 * m_pad * h * d * q.dtype.itemsize
    assert kv_row_bytes <= _QKNORM_KV_VMEM_BUDGET * 2, (
        f"qknorm_attend: kv length {m} (padded {m_pad}, {kv_row_bytes / 1e6:.1f} MB "
        "of K/V per batch row) exceeds the kernel's whole-context-in-VMEM "
        "design budget; use the chunked `attend` path for long contexts"
    )

    # 3D (b, len, h*d) operands: Mosaic handles static lane slices per head,
    # while 4D blocks with per-head indexing fail to lower (unit middle dims
    # / in-kernel 4D reshapes). The flatten from (b, len, h, d) is a view.
    qf = q.reshape(b, n, h * d)
    kf = k.reshape(b, m, h * d)
    vf = v.reshape(b, m, h * d)
    if n_pad != n:
        qf = jnp.pad(qf, ((0, 0), (0, n_pad - n), (0, 0)))
    if m_pad != m:
        kf = jnp.pad(kf, ((0, 0), (0, m_pad - m), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, m_pad - m), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, m_pad - m)), constant_values=NEG_INF)

    # batch rows per program: amortize per-program overhead under a VMEM
    # budget for the K/V blocks (the grid's one TensorCore runs programs
    # sequentially — fewer, fatter programs win at short kv). Module-level
    # knobs so perf sweeps can probe without editing the kernel.
    kv_bytes_per_row = 2 * m_pad * h * d * q.dtype.itemsize
    block_b = max(1, min(b, _QKNORM_KV_VMEM_BUDGET // kv_bytes_per_row, _QKNORM_MAX_BLOCK_B))
    while b % block_b:
        block_b -= 1

    grid = (b // block_b, n_pad // block_q)

    out = pl.pallas_call(
        functools.partial(_qknorm_kernel, scale=scale, block_b=block_b),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, h * d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, block_q, h * d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, m_pad, h * d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, m_pad, h * d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h * d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1, m_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_b, block_q, h * d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_pad * m_pad * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * n_pad * m_pad,
        ),
        interpret=interpret,
    )(
        qf,
        kf,
        vf,
        nk.reshape(1, h * d),
        nv.reshape(1, h * d),
        qs.reshape(1, -1),
        ks.reshape(1, -1),
        bias.reshape(b, 1, m_pad),
    )

    return out[:, :n].reshape(b, n, h, d)


def _qknorm_fwd(q, k, v, nk, nv, qs, ks, bias, scale, block_q, interpret):
    out = _qknorm_flash(q, k, v, nk, nv, qs, ks, bias, scale, block_q, interpret)
    return out, (q, k, v, nk, nv, qs, ks, bias)


def _qknorm_bwd(scale, block_q, interpret, res, g):
    q, k, v, nk, nv, qs, ks, bias = res

    def ref(q, k, v, nk, nv, qs, ks):
        return _qknorm_xla(q, k, v, nk, nv, qs, ks, bias, scale)

    _, vjp = jax.vjp(ref, q, k, v, nk, nv, qs, ks)
    dq, dk, dv, dnk, dnv, dqs, dks = vjp(g)
    return dq, dk, dv, dnk, dnv, dqs, dks, None


_qknorm_flash.defvjp(_qknorm_fwd, _qknorm_bwd)


def qknorm_attend(
    q: Array,
    k: Array,
    v: Array,
    null_k: Array,
    null_v: Array,
    q_scale: Array,
    k_scale: Array,
    mask: Optional[Array] = None,
    scale: float = 8.0,
    impl: str = "auto",
    block_q: int = 256,
    interpret: Optional[bool] = None,
) -> Array:
    """Fused qk-l2norm attention with a learned null KV pair.

    The models' attention (reference muse_maskgit_pytorch.py:91-162) as ONE
    kernel. q: (b, n, h, d), k/v: (b, m, h, d) — RAW projection outputs
    (pre-norm, head dim unsplit-transposed); null_k/null_v: (h, d);
    q_scale/k_scale: (d,); mask: bool (b, m) over REAL kv positions (the null
    position is always attendable). Returns (b, n, h, d).
    """
    b, n, h, d = q.shape
    m = k.shape[1]

    if impl == "auto":
        impl = "flash" if jax.default_backend() == "tpu" else "xla"

    if mask is None:
        bias = jnp.zeros((b, m), jnp.float32)
    else:
        bias = jnp.where(mask, 0.0, NEG_INF).astype(jnp.float32)

    if impl == "xla":
        return _qknorm_xla(q, k, v, null_k, null_v, q_scale, k_scale, bias, scale)

    assert impl == "flash"
    block_q = min(block_q, _round_up(n, 8))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _qknorm_flash(
        q, k, v, null_k, null_v,
        q_scale.astype(jnp.float32), k_scale.astype(jnp.float32),
        bias, float(scale), block_q, interpret,
    )


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
