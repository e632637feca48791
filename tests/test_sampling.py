"""Unit tests for the sampling/masking toolkit (SURVEY.md §4 ladder, level 1)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from muse_maskgit_pytorch_tpu.utils import sampling as S


def test_cosine_schedule_endpoints():
    assert np.isclose(S.cosine_schedule(jnp.array(0.0)), 1.0)
    assert np.isclose(S.cosine_schedule(jnp.array(1.0)), 0.0, atol=1e-7)
    t = jnp.linspace(0, 1, 11)
    p = S.cosine_schedule(t)
    assert np.all(np.diff(np.asarray(p)) < 0)  # strictly decreasing


def test_gumbel_sample_zero_temperature_is_argmax(rng):
    logits = jax.random.normal(rng, (4, 16, 32))
    ids = S.gumbel_sample(rng, logits, temperature=0.0)
    assert np.array_equal(np.asarray(ids), np.asarray(jnp.argmax(logits, -1)))


def test_gumbel_sample_distribution(rng):
    # with temperature 1, sampling follows softmax(logits)
    logits = jnp.log(jnp.array([0.7, 0.2, 0.1]))
    keys = jax.random.split(rng, 8192)
    draws = jax.vmap(lambda k: S.gumbel_sample(k, logits))(keys)
    freqs = np.bincount(np.asarray(draws), minlength=3) / len(keys)
    assert np.allclose(freqs, [0.7, 0.2, 0.1], atol=0.03)


def test_top_k_keeps_expected_count(rng):
    vocab = 100
    logits = jax.random.normal(rng, (2, 5, vocab))
    filtered = S.top_k(logits, thres=0.9)
    k = math.ceil(0.1 * vocab)
    kept = np.isfinite(np.asarray(filtered)).sum(-1)
    assert np.all(kept == k)  # no ties in random floats
    # the kept entries are exactly the k largest
    top_idx = np.argsort(np.asarray(logits), -1)[..., -k:]
    mask = np.full(logits.shape, False)
    np.put_along_axis(mask, top_idx, True, -1)
    assert np.array_equal(np.isfinite(np.asarray(filtered)), mask)


def test_prob_mask_like_degenerate(rng):
    assert np.all(np.asarray(S.prob_mask_like(None, (3, 1), 1.0)))
    assert not np.any(np.asarray(S.prob_mask_like(None, (3, 1), 0.0)))
    m = S.prob_mask_like(rng, (10000, 1), 0.5)
    assert abs(np.mean(np.asarray(m)) - 0.5) < 0.03


def test_get_mask_subset_prob_counts(rng):
    k1, k2 = jax.random.split(rng)
    mask = jax.random.uniform(k1, (8, 64)) < 0.6
    subset = S.get_mask_subset_prob(k2, mask, prob=0.25)
    subset, mask = np.asarray(subset), np.asarray(mask)
    # subset must live inside mask
    assert not np.any(subset & ~mask)
    # per-row count = floor-ish of mask_count * prob (rank strictly below num_to_mask)
    expected = np.ceil(mask.sum(-1) * 0.25) - ((mask.sum(-1) * 0.25) % 1 == 0) * 0
    got = subset.sum(-1)
    # count is within 1 of mask_count*prob (rank threshold semantics)
    assert np.all(np.abs(got - mask.sum(-1) * 0.25) <= 1)


def test_batch_random_mask_exact_counts(rng):
    num = jnp.array([1, 5, 17, 64])
    mask = S.batch_random_mask(rng, 4, 64, num)
    assert np.array_equal(np.asarray(mask).sum(-1), np.asarray(num))


def test_mask_by_topk_scores_selects_highest(rng):
    scores = jax.random.normal(rng, (3, 32))
    num = jnp.array([4, 0, 32])
    mask = S.mask_by_topk_scores(scores, num)
    scores, mask = np.asarray(scores), np.asarray(mask)
    assert np.array_equal(mask.sum(-1), [4, 0, 32])
    # row 0: the 4 selected are the 4 largest
    top4 = np.argsort(-scores[0])[:4]
    assert set(np.flatnonzero(mask[0])) == set(top4)


def test_mask_by_topk_ties_prefer_first():
    scores = jnp.zeros((1, 8))
    mask = S.mask_by_topk_scores(scores, jnp.array([3]))
    assert np.array_equal(np.flatnonzero(np.asarray(mask)), [0, 1, 2])


def test_everything_jits(rng):
    @jax.jit
    def f(key, scores):
        num = jnp.array([2, 3])
        m1 = S.mask_by_topk_scores(scores, num)
        ids = S.gumbel_sample(key, scores, temperature=0.5)
        return m1, ids

    m1, ids = f(rng, jax.random.normal(rng, (2, 16)))
    assert m1.shape == (2, 16) and ids.shape == (2,)
