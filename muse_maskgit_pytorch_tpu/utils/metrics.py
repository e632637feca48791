"""Observability: structured JSONL metrics, step timing, profiler hooks.

The reference has no tracing/profiling at all (SURVEY.md §5 — its only
instrumentation is a tqdm bar, muse_maskgit_pytorch.py:22,556, and host-side
loss prints, trainers.py:275-276,354). This module provides the rebuild's
observability layer:

  * `MetricsLogger` — append-only JSONL of per-step scalars + wall-clock,
    written only on the main process (role of `accelerator.print` rank
    gating, trainers.py:254);
  * `StepTimer` — rolling steps/sec and images/sec without forcing device
    syncs (values are read AFTER the async dispatch returns);
  * `profile_trace` — context manager around `jax.profiler` for on-demand
    TensorBoard traces of the jitted steps.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import deque
from pathlib import Path
from typing import Optional


class MetricsLogger:
    def __init__(self, path, enabled: bool = True, flush_every: int = 1):
        self.path = Path(path)
        self.enabled = enabled
        self.flush_every = flush_every
        self._fh = None
        self._since_flush = 0
        if enabled:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._fh = open(self.path, "a", buffering=1)

    def log(self, step: int, **scalars):
        if not self.enabled or self._fh is None:
            return
        record = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = str(v)
        self._fh.write(json.dumps(record) + "\n")
        self._since_flush += 1
        if self._since_flush >= self.flush_every:
            self._fh.flush()
            self._since_flush = 0

    def close(self):
        if self._fh is not None:
            self._fh.close()
            self._fh = None


class StepTimer:
    """Rolling throughput over the last `window` steps."""

    def __init__(self, window: int = 50):
        self._times = deque(maxlen=window)

    def tick(self) -> None:
        self._times.append(time.perf_counter())

    @property
    def steps_per_sec(self) -> Optional[float]:
        if len(self._times) < 2:
            return None
        span = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / span if span > 0 else None


# ---------------------------------------------------------------------------
# analytic model FLOPs / MFU (VERDICT r2 item 5)
# ---------------------------------------------------------------------------

# TPU v5e peak: 197 TFLOP/s dense bf16 (394 int8) per chip
V5E_BF16_PEAK_FLOPS = 197e12


def transformer_forward_flops(
    rows: int,
    n: int,
    m_cross: int,
    *,
    dim: int,
    depth: int,
    ff_mult: float = 4.0,
    self_cond: bool = False,
) -> float:
    """Matmul FLOPs (2·mults) of one Transformer forward over `rows` batch
    rows of `n` tokens with a cross-attn context of `m_cross` positions —
    counting exactly what `models/transformer.py` computes: fused QKV/out
    projections, self+cross attention dots, GEGLU FF (inner = dim·mult·2/3),
    and the self-conditioning FF. Softmax/LN/elementwise excluded (standard
    model-FLOPs MFU convention). Excludes the logits head and the per-generate
    cross-KV precompute — see `maskgit_generate_flops`."""
    D = dim
    inner = int(D * ff_mult * 2 / 3)
    per_layer = (
        3 * n * 2 * D * D          # self-attn fused q,k,v projections
        + n * 2 * D * D            # self-attn out projection
        + 2 * (2 * n * n * D)      # self-attn scores + value combine
        + n * 2 * D * D            # cross-attn q projection
        + n * 2 * D * D            # cross-attn out projection
        + 2 * (2 * n * m_cross * D)  # cross-attn scores + combine
        + 6 * n * D * inner        # GEGLU FF (proj_in D->2·inner, proj_out)
    )
    total = depth * per_layer
    if self_cond:
        inner_sc = int(D * 4 * 2 / 3)
        total += 6 * n * D * inner_sc  # self_cond_to_init_embed FeedForward
    return float(rows * total)


def maskgit_generate_flops(
    *,
    batch: int,
    timesteps: int,
    seq_len: int,
    text_len: int,
    dim: int,
    depth: int,
    vocab: int,
    ff_mult: float = 4.0,
    cond_scale: float = 3.0,
    self_cond: bool = True,
    cond_seq_len: int = 0,
    head_positions_per_step=None,
    vae_decode_flops: float = 0.0,
) -> float:
    """Analytic model FLOPs of ONE `MaskGit.generate` call (whole batch):
    `timesteps` CFG-doubled transformer forwards + the (compact) vocab logits
    head + the once-per-generate cross-KV projections + the VAE decode.
    `head_positions_per_step`: per-step logits-head position counts (the
    compact-decode buckets); defaults to full `seq_len` every step.
    Divide by `elapsed · V5E_BF16_PEAK_FLOPS` for MFU."""
    rows = batch * (2 if cond_scale != 1 else 1)
    m_cross = text_len + cond_seq_len + 1  # + null KV position
    if head_positions_per_step is None:
        head_positions_per_step = [seq_len] * timesteps
    assert len(head_positions_per_step) == timesteps

    step_fwd = transformer_forward_flops(
        rows, seq_len, m_cross,
        dim=dim, depth=depth, ff_mult=ff_mult, self_cond=self_cond,
    )
    head = sum(
        rows * p * 2 * dim * vocab for p in head_positions_per_step
    )
    # cross-attn K/V of the static context: projected once per generate for
    # the SINGLE batch (both CFG halves share values), per layer, D -> 2D
    ctx_kv = batch * depth * (text_len + cond_seq_len) * 2 * dim * (2 * dim)
    return float(timesteps * step_fwd + head + ctx_kv + vae_decode_flops)


def maskgit_train_flops(
    *,
    batch: int,
    seq_len: int,
    text_len: int,
    dim: int,
    depth: int,
    vocab: int,
    ff_mult: float = 4.0,
    self_cond: bool = True,
    self_cond_prob: float = 0.9,
    cond_seq_len: int = 0,
    critic: bool = False,
    vae_encode_flops: float = 0.0,
) -> float:
    """Analytic model FLOPs of ONE MaskGit train micro-batch (fwd + bwd),
    counting what `MaskGit.__call__` → `MaskGitTrainer._train_step` compute:
    the main forward (backbone + per-forward cross-attn K/V context
    projections + the FULL vocab head — training has no compact gather) at
    3x (1 forward + ~2x backward, the standard matmul accounting), plus the
    expected cost of the no-grad self-conditioning forward (probability
    `self_cond_prob` under `lax.cond`, embed-only: no head), plus optionally
    a TokenCritic forward+backward (dim_out=1 head) and frozen-VAE encode
    FLOPs for the images path. Divide by `elapsed · V5E_BF16_PEAK_FLOPS`
    for train-step MFU. Reference loop being modeled:
    /root/reference/muse_maskgit_pytorch/muse_maskgit_pytorch.py:623-741."""
    m_cross = text_len + cond_seq_len + 1  # + null KV position
    fwd = transformer_forward_flops(
        batch, seq_len, m_cross, dim=dim, depth=depth,
        ff_mult=ff_mult, self_cond=self_cond,
    )
    # cross-attn K/V projections of the context, D -> 2D per layer: training
    # recomputes them every forward (no decode-style ctx-KV cache)
    ctx_kv = batch * depth * (text_len + cond_seq_len) * 2 * dim * (2 * dim)
    head = batch * seq_len * 2 * dim * vocab
    total = 3.0 * (fwd + ctx_kv + head)
    if self_cond:
        total += self_cond_prob * (fwd + ctx_kv)
    if critic:
        critic_fwd = transformer_forward_flops(
            batch, seq_len, m_cross, dim=dim, depth=depth,
            ff_mult=ff_mult, self_cond=False,
        )
        total += 3.0 * (critic_fwd + ctx_kv + batch * seq_len * 2 * dim * 1)
    return float(total + vae_encode_flops)


@contextlib.contextmanager
def profile_trace(log_dir, enabled: bool = True):
    """`with profile_trace('/tmp/trace'): trainer.train_step()` — writes a
    TensorBoard-viewable trace of everything dispatched inside."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
