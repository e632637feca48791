"""Seeded parity vs the reference's sampling math (SURVEY.md §4 item 6).

The reference's pip deps (vector_quantize_pytorch, memory-efficient-attention)
are not installed here, so the full PyTorch model cannot run; per SURVEY §7
(hard part 2) parity is pinned at the algorithmic level instead: each
reference formula is re-stated in torch from its definition
(muse_maskgit_pytorch.py:46-59,403-423,556-609) and driven with a SHARED
host-generated noise stream, then compared bit-exactly (fp32) against this
framework's implementation. torch and JAX PRNGs differ, so the noise is
injected, not sampled.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from muse_maskgit_pytorch_tpu.utils import sampling as S


def test_cosine_schedule_parity():
    t = np.linspace(0, 1, 100).astype(np.float32)
    ours = np.asarray(S.cosine_schedule(jnp.asarray(t)))
    ref = torch.cos(torch.tensor(t) * math.pi * 0.5).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-7)


def test_num_token_masked_schedule_parity():
    # generate loop: num = max(int(p * seq_len), 1) over 18 linspace steps
    seq_len, T = 256, 18
    ref_counts = [
        max(int((math.cos(float(t) * math.pi * 0.5) * seq_len)), 1)
        for t in torch.linspace(0, 1, T)
    ]
    ts = jnp.linspace(0.0, 1.0, T)
    ours = np.asarray(
        jnp.maximum(jnp.floor(S.cosine_schedule(ts) * seq_len), 1).astype(jnp.int32)
    )
    np.testing.assert_array_equal(ours, ref_counts)


def test_gumbel_sample_parity_with_injected_noise():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 16, 64)).astype(np.float32)
    u = rng.uniform(1e-9, 1 - 1e-9, size=logits.shape).astype(np.float32)
    temperature = 0.7

    # reference gumbel_sample (muse_maskgit_pytorch.py:403-411)
    t_logits = torch.tensor(logits)
    inner = torch.log(torch.tensor(u).clamp(min=1e-20))
    t_noise = -torch.log((-inner).clamp(min=1e-20))
    ref = ((t_logits / max(temperature, 1e-10)) + t_noise).argmax(dim=-1).numpy()

    # ours with the same injected uniforms
    g = -S.log(-S.log(jnp.asarray(u)))
    ours = np.asarray(
        jnp.argmax(jnp.asarray(logits) / max(temperature, 1e-10) + g, axis=-1)
    )
    np.testing.assert_array_equal(ours, ref)


def test_top_k_parity():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(2, 8, 100)).astype(np.float32)
    thres = 0.9
    # reference top_k (muse_maskgit_pytorch.py:413-418)
    t = torch.tensor(logits)
    k = math.ceil((1 - thres) * t.shape[-1])
    val, ind = t.topk(k, dim=-1)
    ref = torch.full_like(t, float("-inf")).scatter_(2, ind, val).numpy()

    ours = np.asarray(S.top_k(jnp.asarray(logits), thres))
    # random floats: no ties, so the kept sets must match exactly
    np.testing.assert_array_equal(np.isfinite(ours), np.isfinite(ref))
    np.testing.assert_allclose(
        np.where(np.isfinite(ours), ours, 0), np.where(np.isfinite(ref), ref, 0)
    )


def test_mask_subset_parity_with_injected_noise():
    rng = np.random.default_rng(2)
    mask = rng.uniform(size=(4, 32)) < 0.7
    u = rng.uniform(size=(4, 32)).astype(np.float32)
    prob = 0.25

    # reference get_mask_subset_prob (muse_maskgit_pytorch.py:46-59)
    t_mask = torch.tensor(mask)
    num_to_mask = (t_mask.sum(dim=-1, keepdim=True) * prob).clamp(min=0)
    logits = torch.tensor(u).masked_fill(~t_mask, -1)
    randperm = logits.argsort(dim=-1).argsort(dim=-1).float()
    randperm -= (~t_mask).sum(dim=-1, keepdim=True)
    ref = ((randperm < num_to_mask) & t_mask).numpy()

    # ours with the same uniforms (re-derive internals)
    j_mask = jnp.asarray(mask)
    j_logits = jnp.where(j_mask, jnp.asarray(u), -1.0)
    j_rank = jnp.argsort(jnp.argsort(j_logits, axis=-1), axis=-1).astype(jnp.float32)
    j_rank = j_rank - (~j_mask).sum(axis=-1, keepdims=True)
    j_num = jnp.clip(j_mask.sum(-1, keepdims=True) * prob, min=0)
    ours = np.asarray((j_rank < j_num) & j_mask)
    np.testing.assert_array_equal(ours, ref)


def test_remask_selection_parity():
    """One decode-loop step: `scores.topk(num).indices` scatter (reference
    :561-563) vs our static-shape rank thresholding, same scores."""
    rng = np.random.default_rng(3)
    scores = rng.normal(size=(3, 64)).astype(np.float32)
    num = 17

    t = torch.tensor(scores)
    idx = t.topk(num, dim=-1).indices
    ref = torch.zeros_like(t, dtype=torch.bool).scatter(1, idx, True).numpy()

    ours = np.asarray(
        S.mask_by_topk_scores(jnp.asarray(scores), jnp.full((3,), num))
    )
    np.testing.assert_array_equal(ours, ref)


def test_training_mask_construction_parity():
    """Training mask: batch_randperm < num_token_masked (reference :669-686)
    with injected uniforms on both sides."""
    rng = np.random.default_rng(4)
    batch, seq_len = 4, 32
    u_time = rng.uniform(size=(batch,)).astype(np.float32)
    u_pos = rng.uniform(size=(batch, seq_len)).astype(np.float32)

    t_probs = torch.cos(torch.tensor(u_time) * math.pi * 0.5)
    t_num = (seq_len * t_probs).round().clamp(min=1)
    t_perm = torch.tensor(u_pos).argsort(dim=-1).argsort(dim=-1)
    ref = (t_perm < t_num[:, None]).numpy()

    j_probs = S.cosine_schedule(jnp.asarray(u_time))
    j_num = jnp.clip(jnp.round(seq_len * j_probs), min=1)
    j_rank = jnp.argsort(jnp.argsort(jnp.asarray(u_pos), axis=-1), axis=-1)
    ours = np.asarray(j_rank < j_num[:, None])
    np.testing.assert_array_equal(ours, ref)

    # row-wise counts match the schedule exactly
    np.testing.assert_array_equal(ours.sum(-1), np.asarray(t_num.numpy(), np.int64))


def test_layernorm_parity():
    """Bias-free LayerNorm (reference :63-70) vs torch F.layer_norm."""
    from flax import nnx
    from muse_maskgit_pytorch_tpu.models.transformer import LayerNorm

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 8, 16)).astype(np.float32)
    gamma = rng.normal(size=(16,)).astype(np.float32)

    ln = LayerNorm(16, rngs=nnx.Rngs(0))
    ln.gamma[...] = jnp.asarray(gamma)
    ours = np.asarray(ln(jnp.asarray(x)))

    ref = torch.nn.functional.layer_norm(
        torch.tensor(x), (16,), torch.tensor(gamma), torch.zeros(16)
    ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_geglu_ff_parity():
    """GEGLU feedforward math (reference :72-89) against a torch restatement."""
    from flax import nnx
    from muse_maskgit_pytorch_tpu.models.transformer import FeedForward

    dim, mult = 16, 4
    ff = FeedForward(dim, mult=mult, rngs=nnx.Rngs(0))
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 4, dim)).astype(np.float32)
    ours = np.asarray(ff(jnp.asarray(x)))

    inner = int(dim * mult * 2 / 3)
    w1 = torch.tensor(np.asarray(ff.proj_in.kernel[...]))
    w2 = torch.tensor(np.asarray(ff.proj_out.kernel[...]))
    g1 = torch.tensor(np.asarray(ff.norm.gamma[...]))
    g2 = torch.tensor(np.asarray(ff.norm_inner.gamma[...]))
    t = torch.nn.functional.layer_norm(torch.tensor(x), (dim,), g1, torch.zeros(dim))
    t = t @ w1
    a, gate = t.chunk(2, dim=-1)
    t = gate * torch.nn.functional.gelu(a)
    t = torch.nn.functional.layer_norm(t, (inner,), g2, torch.zeros(inner))
    ref = (t @ w2).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)
