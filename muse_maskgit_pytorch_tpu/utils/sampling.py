"""Sampling / masking toolkit: pure jittable functions with explicit PRNG keys.

Re-designs the reference's sampling helpers
(`/root/reference/muse_maskgit_pytorch/muse_maskgit_pytorch.py:46-59,390-423`)
for XLA: every function is shape-static and takes an explicit `jax.random` key
instead of mutating a global torch RNG, so the whole MaskGit decode loop can
live inside one `lax.scan` under `jit`.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# ---------------------------------------------------------------------------
# noise schedule (reference muse_maskgit_pytorch.py:422-423)
# ---------------------------------------------------------------------------


def cosine_schedule(t: Array) -> Array:
    """Mask-fraction schedule: p(t) = cos(t * pi / 2), t in [0, 1]."""
    return jnp.cos(t * math.pi * 0.5)


def linear_schedule(t: Array) -> Array:
    return 1.0 - t


NOISE_SCHEDULES = {
    "cosine": cosine_schedule,
    "linear": linear_schedule,
}

# ---------------------------------------------------------------------------
# gumbel sampling (reference muse_maskgit_pytorch.py:403-411)
# ---------------------------------------------------------------------------


def log(t: Array, eps: float = 1e-20) -> Array:
    return jnp.log(jnp.clip(t, min=eps))


def gumbel_noise(key: Array, shape, dtype=jnp.float32) -> Array:
    """-log(-log(u)), u ~ U(0,1). Matches the reference's formulation."""
    u = jax.random.uniform(key, shape, dtype=dtype)
    return -log(-log(u))


def gumbel_sample(key: Array, logits: Array, temperature=1.0, axis: int = -1) -> Array:
    """argmax(logits / max(T, 1e-10) + gumbel). `temperature` may be traced.

    Reference: muse_maskgit_pytorch.py:410-411 (there `max(temperature, 1e-10)`
    is host python; here it is `jnp.maximum` so the annealed temperature can be
    a traced scan-carry value).
    """
    temperature = jnp.maximum(jnp.asarray(temperature, logits.dtype), 1e-10)
    noised = logits / temperature + gumbel_noise(key, logits.shape, logits.dtype)
    return jnp.argmax(noised, axis=axis).astype(jnp.int32)


def top_k(logits: Array, thres: float = 0.9) -> Array:
    """Keep the top ceil((1-thres)*vocab) logits, set the rest to -inf.

    Reference (muse_maskgit_pytorch.py:413-418) scatters the exact top-k set;
    on TPU we threshold at the k-th value instead (ties at the threshold are
    kept). `thres` must be static so k is static.
    """
    vocab = logits.shape[-1]
    k = max(math.ceil((1 - thres) * vocab), 1)
    kth_val = jax.lax.top_k(logits, k)[0][..., -1:]
    neg_inf = jnp.array(-jnp.inf, dtype=logits.dtype)
    return jnp.where(logits < kth_val, neg_inf, logits)


# ---------------------------------------------------------------------------
# probabilistic masks (reference muse_maskgit_pytorch.py:390-399, 46-59)
# ---------------------------------------------------------------------------


def uniform(key: Array, shape, dtype=jnp.float32) -> Array:
    return jax.random.uniform(key, shape, dtype=dtype)


def prob_mask_like(key: Optional[Array], shape, prob: float) -> Array:
    """Bernoulli(prob) boolean mask; degenerate probs short-circuit (so the
    classifier-free-guidance branch stays key-free when prob is 0 or 1)."""
    if prob == 1:
        return jnp.ones(shape, dtype=bool)
    if prob == 0:
        return jnp.zeros(shape, dtype=bool)
    return jax.random.uniform(key, shape) < prob


def get_mask_subset_prob(key: Array, mask: Array, prob, min_mask: int = 0) -> Array:
    """Random subset of `mask` with (per-row) expected fraction `prob`.

    Double-argsort rank trick, identical semantics to the reference
    (muse_maskgit_pytorch.py:46-59): draw uniforms over the row, force
    non-mask positions to the bottom, rank all positions, and keep ranks
    below `mask.sum(-1) * prob` (after discounting padding ranks).
    """
    batch, seq = mask.shape
    num_to_mask = jnp.clip(mask.sum(axis=-1, keepdims=True) * prob, min=min_mask)
    logits = jax.random.uniform(key, (batch, seq))
    logits = jnp.where(mask, logits, -1.0)

    randperm = jnp.argsort(jnp.argsort(logits, axis=-1), axis=-1).astype(jnp.float32)

    num_padding = (~mask).sum(axis=-1, keepdims=True)
    randperm = randperm - num_padding

    subset_mask = randperm < num_to_mask
    return subset_mask & mask


def batch_random_mask(key: Array, batch: int, seq_len: int, num_masked: Array) -> Array:
    """Per-row boolean mask with exactly `num_masked[b]` True entries at
    uniformly random positions. TPU-friendly replacement of the reference's
    `torch.rand(...).argsort() < num_token_masked` (muse_maskgit_pytorch.py:676-677):
    rank positions by random score and threshold at the (traced) count.
    """
    scores = jax.random.uniform(key, (batch, seq_len))
    ranks = jnp.argsort(jnp.argsort(scores, axis=-1), axis=-1)
    return ranks < num_masked.reshape(batch, 1)


def mask_by_topk_scores(scores: Array, num_masked: Array) -> Array:
    """Boolean mask selecting the `num_masked[b]` HIGHEST-score positions of
    each row, where `num_masked` is a traced per-row count.

    This replaces the reference's dynamic-k `scores.topk(num_token_masked)`
    + scatter (muse_maskgit_pytorch.py:561-563): XLA needs static shapes, so
    we compute descending ranks via double argsort and threshold. Ties are
    broken by position (stable argsort), matching torch.topk's first-come
    ordering for equal scores.
    """
    batch, seq_len = scores.shape
    order = jnp.argsort(-scores, axis=-1, stable=True)
    ranks = jnp.argsort(order, axis=-1)
    return ranks < num_masked.reshape(batch, 1)
