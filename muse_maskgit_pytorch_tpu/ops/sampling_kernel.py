"""Fused top-k + gumbel sampling kernel for the MaskGit decode loop.

Why this exists: the reference samples each decode step with
`top_k(logits, 0.9)` then `gumbel_sample` then a full-vocab softmax+gather
for confidence scores (`/root/reference/muse_maskgit_pytorch/
muse_maskgit_pytorch.py:576-606`). A direct translation costs ~180 ms/step on
TPU at the recommended scale (vocab 65536): `lax.top_k` is a full sort, and
the filter + noise + softmax each re-stream the (batch*seq, 65536) logits
through HBM. The transformer forward itself is ~13 ms — sampling dominated
the loop 14:1.

This kernel does the whole step in ONE pass with the row resident in VMEM:
  1. top-k threshold via 12 rounds of value bisection on the row (counting
     compares in f32 — v5e Mosaic has no bf16 vector compare); 12 rounds pin
     the threshold to an expected rank slack of V/2^12 ≈ 16 of k=6554
     (0.24%) — immaterial for a tail-truncation heuristic, and ties at the
     threshold are kept like `utils.sampling.top_k`. Iteration count and
     block_rows=16 are v5e-tuned (BASELINE.md);
  2. row logsumexp of the UNFILTERED logits (the reference scores
     confidence with the unfiltered softmax, :603);
  3. gumbel noise from the on-core PRNG (`pltpu.prng_random_bits`), seeded
     per (step, row-block) from the caller's JAX key — deterministic given
     the key, but NOT the same stream as `jax.random` (the XLA fallback path
     keeps the jax.random stream; parity tests pin each path separately);
  4. temperature-scaled filtered gumbel-argmax -> sampled id;
  5. softmax probability of the sampled id -> confidence score.

HBM traffic: one read of the logits + (rows, 1) outputs, ~7x less than the
unfused chain; wall-clock per decode step drops from ~180 ms to ~3 ms at
(8*256, 65536).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e30
# 10 rounds pin the top-k threshold to rank slack V/2^10 = 64 of k = 6554
# (1%) at the reference vocab — boundary-only, immaterial for the tail
# filter. Each round costs 2 full VPU passes over the row block; 12 -> 10
# measured +1 img/s end-to-end with identical output checksums (BASELINE.md).
# NOTE: an r3 attempt to drop to 8 was reverted — its supporting A/B was
# invalid (this function is itself jitted, so the harness's outer-jit
# clear_cache() never retraced it and every arm ran the 10-round kernel;
# see bench_sweep.exp_bisect for the fixed harness).
_BISECT_ITERS = 10


def _sample_kernel(
    temp_ref, seed_ref, scale_ref, logits_ref, *rest, k: int, has_noise: bool,
    has_null: bool = False
):
    null_ref = None
    if has_null:
        null_ref, *rest = rest
    if has_noise:
        noise_ref, idx_ref, prob_ref = rest
    else:
        (idx_ref, prob_ref) = rest
        noise_ref = None
    pid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + pid)

    if has_null:
        # classifier-free guidance folded into the kernel: the cond and null
        # row blocks of the doubled-batch logits combine in VMEM, so the
        # scaled logits never exist in HBM (saves one full elementwise HBM
        # pass per decode step). cond_scale arrives as a prefetched scalar
        # (not a compile-time constant) so guidance-scale SCHEDULES (Muse
        # paper §2.5: linearly increasing guidance through the decode) reuse
        # one compiled kernel across steps.
        cond = logits_ref[:].astype(jnp.float32)
        null = null_ref[:].astype(jnp.float32)
        l = null + (cond - null) * scale_ref[0]  # (bn, V)
    else:
        l = logits_ref[:].astype(jnp.float32)  # (bn, V)
    bn, V = l.shape

    # -- 1) value-bisection top-k threshold (invariant: count(l >= lo) >= k).
    # f32 compares: Mosaic on v5e has no bf16 vector comparison, so there is
    # no cheaper compare path than f32 here.
    lo = jnp.min(l, axis=-1, keepdims=True)
    hi = jnp.max(l, axis=-1, keepdims=True)
    row_max = hi

    def bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((l >= mid).astype(jnp.float32), axis=-1, keepdims=True)
        ge = cnt >= k
        return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, bisect, (lo, hi))
    thresh = lo

    # -- 2) logsumexp over the unfiltered row (for confidence scores)
    lse = jnp.log(jnp.sum(jnp.exp(l - row_max), axis=-1, keepdims=True)) + row_max

    # -- 3) gumbel noise: on-core PRNG in production; injectable for tests
    # (the TPU interpreter's PRNG is a zero stub) and for cross-path parity
    if has_noise:
        g = noise_ref[:].astype(jnp.float32)
    else:
        bits = pltpu.prng_random_bits((bn, V))
        # top 24 bits -> uniform in (0, 1); +2^-25 keeps log() finite.
        # Mosaic has no uint32->f32 cast: shift clears the sign bit, so a
        # bitcast to int32 followed by int->float is exact.
        shifted = jnp.right_shift(pltpu.bitcast(bits, jnp.uint32), 8)
        u = pltpu.bitcast(shifted, jnp.int32).astype(jnp.float32)
        u = u * (1.0 / (1 << 24)) + (1.0 / (1 << 25))
        g = -jnp.log(-jnp.log(u))

    # -- 4) filtered, temperature-scaled gumbel-argmax
    temp = jnp.maximum(temp_ref[0], 1e-10)
    z = jnp.where(l >= thresh, l / temp + g, NEG_INF)
    idx = jnp.argmax(z, axis=-1).astype(jnp.int32)  # (bn,)

    # -- 5) softmax prob of the chosen id (unfiltered, no temperature)
    col = jax.lax.broadcasted_iota(jnp.int32, (bn, V), 1)
    chosen_logit = jnp.max(
        jnp.where(col == idx[:, None], l, NEG_INF), axis=-1, keepdims=True
    )
    prob = jnp.exp(chosen_logit - lse)

    idx_ref[:] = idx[:, None]
    prob_ref[:] = prob


@functools.partial(
    jax.jit, static_argnames=("k", "block_rows", "interpret", "cfg_pair")
)
def fused_topk_gumbel_sample(
    logits: Array,
    k: int,
    temperature: Array,
    seed: Array,
    noise: Array = None,
    block_rows: int = 16,
    interpret: bool = False,
    cfg_pair: bool = False,
    cond_scale=1.0,
) -> Tuple[Array, Array]:
    """logits: (rows, V) f32 or bf16; k static; temperature traced scalar; seed traced
    int32 scalar; noise: optional (rows, V) pre-drawn gumbel noise (overrides
    the on-core PRNG). Returns (sampled_idx (rows,), chosen_prob (rows,)).

    cfg_pair=True: logits carries a CFG-doubled batch — cond rows [0, rows/2)
    and null rows [rows/2, rows) — and the kernel samples from
    `null + (cond - null) * cond_scale` combined in VMEM. Outputs cover the
    rows/2 cond rows. `cond_scale` may be a python float or a traced scalar
    (it rides the scalar-prefetch path), so per-step guidance schedules hit
    one compiled kernel."""
    if cfg_pair:
        assert logits.shape[0] % 2 == 0
        rows = logits.shape[0] // 2
        if noise is not None and noise.shape[0] == logits.shape[0]:
            noise = noise[:rows]
    else:
        rows = logits.shape[0]
    V = logits.shape[1]
    bn = min(block_rows, rows)
    pad = (-rows) % bn
    if pad:
        if cfg_pair:
            logits = jnp.concatenate(
                [
                    jnp.pad(logits[:rows], ((0, pad), (0, 0))),
                    jnp.pad(logits[rows:], ((0, pad), (0, 0))),
                ],
                axis=0,
            )
        else:
            logits = jnp.pad(logits, ((0, pad), (0, 0)))
        if noise is not None:
            noise = jnp.pad(noise, ((0, pad), (0, 0)))

    grid = ((rows + pad) // bn,)
    temp_arr = jnp.reshape(temperature.astype(jnp.float32), (1,))
    seed_arr = jnp.reshape(seed.astype(jnp.int32), (1,))
    scale_arr = jnp.reshape(jnp.asarray(cond_scale, jnp.float32), (1,))
    has_noise = noise is not None

    in_specs = [pl.BlockSpec((bn, V), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)]
    # logits pass through in their own dtype (bf16 halves the HBM read);
    # the kernel upcasts to f32 in VMEM
    operands = [logits]
    if cfg_pair:
        # second view into the SAME array: the null half, offset by rows+pad
        null_off = (rows + pad) // bn
        in_specs.append(
            pl.BlockSpec(
                (bn, V), lambda i, *_, o=null_off: (i + o, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(logits)
    if has_noise:
        in_specs.append(
            pl.BlockSpec((bn, V), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
        )
        operands.append(noise.astype(jnp.float32))

    idx, prob = pl.pallas_call(
        functools.partial(
            _sample_kernel,
            k=k,
            has_noise=has_noise,
            has_null=cfg_pair,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((bn, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bn, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((rows + pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((rows + pad, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(rows + pad) * V * (_BISECT_ITERS + 8),
            bytes_accessed=(rows + pad) * V * 4,
            transcendentals=(rows + pad) * V * 3,
        ),
        # the generic HLO interpreter lacks the TPU PRNG primitives; use the
        # TPU-semantics interpreter for CPU runs
        interpret=pltpu.InterpretParams() if interpret else False,
    )(temp_arr, seed_arr, scale_arr, *operands)

    return idx[:rows, 0], prob[:rows, 0]


def xla_topk_gumbel_sample(
    key: Array, logits: Array, k: int, temperature: Array
) -> Tuple[Array, Array]:
    """XLA reference path with the same semantics (jax.random noise stream):
    used on CPU, for small vocabularies, and as the parity oracle."""
    from muse_maskgit_pytorch_tpu.utils.sampling import gumbel_noise

    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    filtered = jnp.where(logits < kth, -jnp.inf, logits)
    temp = jnp.maximum(jnp.asarray(temperature, logits.dtype), 1e-10)
    z = filtered / temp + gumbel_noise(key, logits.shape, logits.dtype)
    idx = jnp.argmax(z, axis=-1).astype(jnp.int32)
    probs = jax.nn.softmax(logits, axis=-1)
    chosen = jnp.take_along_axis(probs, idx[..., None], axis=-1)[..., 0]
    return idx, chosen
