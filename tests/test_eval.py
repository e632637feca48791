"""Evaluation machinery: streaming feature stats + Fréchet distance.

The math is pinned against the closed form for diagonal gaussians and
against exact identities (FID(X, X) = 0); the pipeline against a real
extractor on the CPU mesh."""

import numpy as np
import pytest

from muse_maskgit_pytorch_tpu.utils.eval import (
    FeatureStats,
    compute_feature_stats,
    fid_score,
    frechet_distance,
    make_vgg_extractor,
)


def test_streaming_stats_match_oneshot():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(257, 8))
    one = FeatureStats(8).update(x)
    chunked = FeatureStats(8)
    for c in np.array_split(x, 7):
        chunked.update(c)
    mu1, c1 = one.mean_cov()
    mu2, c2 = chunked.mean_cov()
    np.testing.assert_allclose(mu1, x.mean(0), rtol=1e-12)
    np.testing.assert_allclose(c1, np.cov(x, rowvar=False), rtol=1e-10)
    np.testing.assert_allclose(mu1, mu2, rtol=1e-12)
    np.testing.assert_allclose(c1, c2, rtol=1e-12)


def test_merge_equals_joint():
    rng = np.random.default_rng(1)
    a, b = rng.normal(size=(100, 4)), rng.normal(size=(50, 4))
    joint = FeatureStats(4).update(np.concatenate([a, b]))
    merged = FeatureStats(4).update(a).merge(FeatureStats(4).update(b))
    for x, y in zip(joint.mean_cov(), merged.mean_cov()):
        np.testing.assert_allclose(x, y, rtol=1e-12)


def test_frechet_identity_is_zero():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(500, 16))
    s = FeatureStats(16).update(x)
    assert abs(fid_score(s, s)) < 1e-8


def test_frechet_diagonal_closed_form():
    # diagonal gaussians: d^2 = |m1-m2|^2 + sum(a + b - 2 sqrt(ab))
    d = 6
    a = np.linspace(0.5, 2.0, d)
    b = np.linspace(1.0, 3.0, d)
    m1, m2 = np.zeros(d), np.full(d, 0.7)
    expected = float(
        ((m1 - m2) ** 2).sum() + (a + b - 2 * np.sqrt(a * b)).sum()
    )
    got = frechet_distance(m1, np.diag(a), m2, np.diag(b), eps=0.0)
    np.testing.assert_allclose(got, expected, rtol=1e-10)


def test_frechet_detects_distribution_shift():
    rng = np.random.default_rng(3)
    base = rng.normal(size=(2000, 8))
    near = FeatureStats(8).update(rng.normal(size=(2000, 8)))
    far = FeatureStats(8).update(rng.normal(loc=2.0, size=(2000, 8)))
    ref = FeatureStats(8).update(base)
    assert fid_score(ref, far) > 10 * fid_score(ref, near)


def test_stats_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    s = FeatureStats(5).update(rng.normal(size=(64, 5)))
    p = s.save(tmp_path / "stats.npz")
    s2 = FeatureStats.load(p)
    assert s2.n == s.n
    for x, y in zip(s.mean_cov(), s2.mean_cov()):
        np.testing.assert_allclose(x, y)


def test_stats_input_validation():
    s = FeatureStats(4)
    with pytest.raises(ValueError, match="expected"):
        s.update(np.zeros((3, 5)))
    with pytest.raises(ValueError, match="covariance"):
        FeatureStats(4).update(np.zeros((1, 4))).mean_cov()
    with pytest.raises(ValueError, match="dim mismatch"):
        FeatureStats(4).merge(FeatureStats(5))


def test_vgg_pipeline_end_to_end():
    """Real extractor on the CPU mesh: identical sets score ~0, a shifted
    set scores measurably higher (random-init VGG still separates
    distributions — the documented env-limit caveat)."""
    import jax

    extract = make_vgg_extractor()
    rng = np.random.default_rng(5)
    imgs_a = rng.uniform(size=(48, 16, 16, 3)).astype(np.float32)
    imgs_b = (imgs_a * 0.25).astype(np.float32)  # darkened: different stats

    def batches(x):
        return [jax.numpy.asarray(c) for c in np.array_split(x, 3)]

    ref = compute_feature_stats(batches(imgs_a), extract)
    same = compute_feature_stats(batches(imgs_a), extract)
    diff = compute_feature_stats(batches(imgs_b), extract)
    assert ref.n == 48 and ref.dim == 4096
    fid_same = fid_score(ref, same)
    fid_diff = fid_score(ref, diff)
    assert fid_same < 1e-6
    assert fid_diff > 100 * max(fid_same, 1e-12)


def test_stats_save_appends_npz_suffix(tmp_path):
    # np.savez APPENDS .npz to non-.npz names; save() must return the file
    # actually written so load(save(...)) always round-trips
    rng = np.random.default_rng(6)
    s = FeatureStats(3).update(rng.normal(size=(16, 3)))
    p = s.save(tmp_path / "coco.ref")
    assert p.endswith("coco.ref.npz")
    s2 = FeatureStats.load(p)
    assert s2.n == s.n
