"""Generative-quality evaluation: streaming feature statistics + Fréchet
distance (the FID family).

The reference ships no evaluation subsystem at all (no metrics anywhere in
/root/reference/); the Muse paper reports FID against CC3M/COCO, so a
production rebuild needs the machinery. This module is extractor-agnostic:
`frechet_distance` is pure math over (mean, covariance) pairs, and
`FeatureStats` accumulates those statistics streamingly so a million-image
reference set never needs to be in memory — feature batches are extracted on
the TPU and folded into host-side f64 moments (covariance in f32 loses ~3
digits at n ~ 1e6, and the accumulation is not the bottleneck: extraction
is).

Standard FID uses pretrained InceptionV3 pool3 features; this environment
cannot fetch pretrained weights (docs/API_PARITY.md "Pretrained weights"),
so the default extractor is the in-framework VGG16 (`make_vgg_extractor`) —
load converted torchvision weights via `utils/convert.py` where available.
Scores from a random-init extractor still order models / detect drift but
are NOT comparable across papers; the distance math is extractor-blind.
"""

from __future__ import annotations

from pathlib import Path
from typing import Callable, Iterable, Optional, Tuple

import numpy as np

Array = np.ndarray


class FeatureStats:
    """Streaming (mean, covariance) over feature batches.

    Accumulates first and second moments in float64 on the host:
    `update()` per extracted batch, `mean_cov()` when done. `merge()`
    combines shards (e.g. per-host stats in a multi-host eval job —
    moment sums are exactly additive). `save()`/`load()` persist the raw
    moments, so a reference set's statistics are computed once per dataset.
    """

    def __init__(self, dim: int):
        self.dim = int(dim)
        self.n = 0
        self._sum = np.zeros((dim,), np.float64)
        self._outer = np.zeros((dim, dim), np.float64)

    def update(self, features) -> "FeatureStats":
        f = np.asarray(features, np.float64)
        if f.ndim != 2 or f.shape[1] != self.dim:
            raise ValueError(f"expected (batch, {self.dim}) features, got {f.shape}")
        self.n += f.shape[0]
        self._sum += f.sum(axis=0)
        self._outer += f.T @ f
        return self

    def merge(self, other: "FeatureStats") -> "FeatureStats":
        if other.dim != self.dim:
            raise ValueError(f"dim mismatch: {self.dim} vs {other.dim}")
        self.n += other.n
        self._sum += other._sum
        self._outer += other._outer
        return self

    def mean_cov(self) -> Tuple[Array, Array]:
        if self.n < 2:
            raise ValueError(f"need >= 2 samples for a covariance, have {self.n}")
        mu = self._sum / self.n
        # unbiased: E[xxT] - n mu muT, normalized by n-1
        cov = (self._outer - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, cov

    def save(self, path) -> str:
        path = Path(path)
        np.savez(path, dim=self.dim, n=self.n, sum=self._sum, outer=self._outer)
        # np.savez APPENDS .npz to any other suffix ('coco.ref' -> 'coco.ref.npz'),
        # it does not replace it — return the name actually written
        return str(path if path.suffix == ".npz" else Path(str(path) + ".npz"))

    @classmethod
    def load(cls, path) -> "FeatureStats":
        with np.load(path) as z:
            stats = cls(int(z["dim"]))
            stats.n = int(z["n"])
            stats._sum = z["sum"].astype(np.float64)
            stats._outer = z["outer"].astype(np.float64)
        return stats


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """Fréchet distance between two gaussians:
    |mu1-mu2|^2 + tr(cov1 + cov2 - 2 (cov1 cov2)^(1/2)).

    The trace of the matrix square root is computed through two symmetric
    eigendecompositions — tr sqrt(C1 C2) = sum sqrt(eig(C1^(1/2) C2 C1^(1/2)))
    — instead of scipy's non-symmetric `sqrtm(C1 @ C2)`: eigh is deterministic,
    robust to the tiny negative eigenvalues sample covariances carry, and has
    no complex-drift fudging. `eps` regularizes both covariances (standard
    practice when n_samples < dim leaves them rank-deficient).
    """
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    cov1 = np.asarray(cov1, np.float64) + eps * np.eye(mu1.shape[0])
    cov2 = np.asarray(cov2, np.float64) + eps * np.eye(mu2.shape[0])

    diff = mu1 - mu2
    w1, v1 = np.linalg.eigh(cov1)
    sqrt_c1 = (v1 * np.sqrt(np.clip(w1, 0, None))) @ v1.T
    inner = sqrt_c1 @ cov2 @ sqrt_c1
    w = np.linalg.eigvalsh((inner + inner.T) / 2)
    tr_sqrt = np.sqrt(np.clip(w, 0, None)).sum()
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * tr_sqrt)


def fid_score(stats_real: FeatureStats, stats_fake: FeatureStats) -> float:
    """Fréchet distance between two accumulated feature distributions."""
    mu1, c1 = stats_real.mean_cov()
    mu2, c2 = stats_fake.mean_cov()
    return frechet_distance(mu1, c1, mu2, c2)


def compute_feature_stats(
    batches: Iterable,
    extract_fn: Callable,
    dim: Optional[int] = None,
    stats: Optional[FeatureStats] = None,
) -> FeatureStats:
    """Fold an iterable of image batches through `extract_fn` into
    `FeatureStats`. `extract_fn`: (b, H, W, 3) images -> (b, d) features
    (jit it once outside — every batch should be the same shape so the
    compiled program is reused). Pass `stats` to continue accumulating."""
    for batch in batches:
        feats = np.asarray(extract_fn(batch))
        if stats is None:
            stats = FeatureStats(dim if dim is not None else feats.shape[1])
        stats.update(feats)
    if stats is None:
        raise ValueError("no batches")
    return stats


def make_vgg_extractor(vgg=None, seed: int = 0) -> Callable:
    """A jitted (b, H, W, 3)->(b, 4096) feature extractor over the
    in-framework VGG16's fc2 embedding (the same tower the GAN perceptual
    loss uses, models/vgg.py). Pass a converted-weights `VGG16` for
    comparable scores; the default random init is only self-consistent."""
    import jax
    from flax import nnx

    from muse_maskgit_pytorch_tpu.models.vgg import VGG16

    if vgg is None:
        vgg = VGG16(rngs=nnx.Rngs(seed))
    graphdef, state = nnx.split(vgg)

    @jax.jit
    def extract(state, images):
        return nnx.merge(graphdef, state)(images)

    return lambda images: extract(state, images)


def make_inception_extractor(
    inception=None, seed: int = 0, resize_to: Optional[int] = 299
) -> Callable:
    """A jitted (b, H, W, 3)-in-[0,1] -> (b, 2048) pool3 feature extractor
    over the in-framework InceptionV3 (`models/inception.py`) — the STANDARD
    FID tower. Follows the pytorch-fid convention: bilinear resize to
    299x299 (`resize_to=None` skips it) and rescale to [-1, 1] before the
    network. Pass an `InceptionV3` loaded via
    `utils.convert.load_torchvision_inception_v3` for scores comparable
    across torchvision-weight FID implementations (published FIDs mostly use
    pytorch-fid's TF-ported checkpoint, which differs systematically — see
    models/inception.py); the default random init only orders models."""
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from muse_maskgit_pytorch_tpu.models.inception import InceptionV3

    if inception is None:
        inception = InceptionV3(rngs=nnx.Rngs(seed))
    graphdef, state = nnx.split(inception)

    @jax.jit
    def extract(state, images):
        images = jnp.asarray(images, jnp.float32)
        if resize_to is not None and images.shape[1:3] != (resize_to, resize_to):
            images = jax.image.resize(
                images,
                (images.shape[0], resize_to, resize_to, images.shape[3]),
                method="bilinear",
            )
        return nnx.merge(graphdef, state)(images * 2.0 - 1.0)

    return lambda images: extract(state, images)
