"""Quantizers: Lookup-Free Quantization (LFQ), EMA Vector Quantization, and
Finite Scalar Quantization (FSQ).

TPU-native re-implementations of the two quantizers the reference pulls in
from `vector_quantize_pytorch` (`/root/reference/muse_maskgit_pytorch/
vqgan_vae.py:7,328-342`):

  * `LFQ` — the default tokenizer quantizer (`lookup_free_quantization=True`,
    codebook_size=65536, diversity_gamma=4, vqgan_vae.py:296,304-305,330-335).
    Each latent channel is quantized to its sign; the token index is the
    binary code. Losses re-derived from the MAGVIT-v2 paper (cited at
    reference README.md:308-315): commitment MSE + entropy aux loss
    (minimize per-sample entropy, maximize batch codebook entropy).
    TPU-first deviation: for large codebooks the entropy terms are computed
    over sub-codebook groups of `entropy_group_bits` bits (factorized
    product-distribution entropy) instead of materializing the full
    (tokens, 2^16) probability matrix — exact when groups are independent,
    and the default 8-bit groups keep it a pair of tiny MXU matmuls.

  * `VectorQuantizeEMA` — the opt-in classic VQ path (vqgan_vae.py:337-342;
    note the reference's construction of this path is dead code due to a
    missing comma — SURVEY.md §2.4 B2 — so this re-build makes it actually
    work). Projected codebook (codebook_dim=256), cosine-similarity search,
    EMA codebook updates (decay=0.8), kmeans init on the first training
    batch, commitment loss, straight-through estimator. The nearest-code
    search runs through the fused Pallas distance+argmax kernel
    (`ops/vq.py`) on TPU.

  * `FSQ` — beyond-reference third family (Mentzer et al. 2023, same
    lineage as LFQ per reference README.md:297-305): per-channel bounded
    rounding to a fixed mixed-radix grid; no codebook, no aux losses,
    pure elementwise math — the most XLA/mesh-friendly quantizer here.
    `VQGanVAE(fsq_levels=(8, 6, 5))` selects it (codebook = prod(levels)).

All take NHWC feature maps `(b, h, w, dim)` (TPU-native layout; the
reference is NCHW) and return `(quantized, indices, aux_loss)` matching the
reference quantizer contract (vqgan_vae.py:422-425).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import nnx

from muse_maskgit_pytorch_tpu.ops.vq import nearest_code

Array = jax.Array


def l2norm(t: Array, eps: float = 1e-12) -> Array:
    return t * jax.lax.rsqrt(jnp.sum(jnp.square(t), axis=-1, keepdims=True) + eps)


def _entropy(p: Array, axis: int = -1, eps: float = 1e-9) -> Array:
    return -jnp.sum(p * jnp.log(p + eps), axis=axis)


class LFQ(nnx.Module):
    """Lookup-free quantization: sign bits + straight-through estimator."""

    def __init__(
        self,
        *,
        dim: int,
        codebook_size: int,
        diversity_gamma: float = 4.0,
        entropy_loss_weight: float = 0.1,
        commitment_loss_weight: float = 0.25,
        inv_temperature: float = 100.0,
        entropy_group_bits: int = 8,
        rngs: nnx.Rngs,
    ):
        codebook_dim = int(math.log2(codebook_size))
        assert 2**codebook_dim == codebook_size, "codebook_size must be a power of 2"
        self.dim = dim
        self.codebook_size = codebook_size
        self.codebook_dim = codebook_dim
        self.diversity_gamma = diversity_gamma
        self.entropy_loss_weight = entropy_loss_weight
        self.commitment_loss_weight = commitment_loss_weight
        self.inv_temperature = inv_temperature
        # largest group size <= entropy_group_bits that divides the code width
        g = min(entropy_group_bits, codebook_dim)
        while codebook_dim % g:
            g -= 1
        self.entropy_group_bits = g

        self.has_projections = dim != codebook_dim
        if self.has_projections:
            self.project_in = nnx.Linear(dim, codebook_dim, use_bias=False, rngs=rngs)
            self.project_out = nnx.Linear(codebook_dim, dim, use_bias=False, rngs=rngs)

    # -- bit <-> index codecs (MSB-first, matching our own decode) ----------

    def _bit_weights(self) -> Array:
        cd = self.codebook_dim
        return jnp.left_shift(1, jnp.arange(cd - 1, -1, -1)).astype(jnp.int32)

    def bits_to_indices(self, bits: Array) -> Array:
        """bits: (..., codebook_dim) bool -> int32 indices."""
        return jnp.sum(bits.astype(jnp.int32) * self._bit_weights(), axis=-1)

    def indices_to_bits(self, indices: Array) -> Array:
        """int indices -> (..., codebook_dim) ±1 float codes."""
        cd = self.codebook_dim
        shifts = jnp.arange(cd - 1, -1, -1)
        bits = jnp.bitwise_and(jnp.right_shift(indices[..., None], shifts), 1)
        return bits.astype(jnp.float32) * 2.0 - 1.0

    def indices_to_codes(self, indices: Array) -> Array:
        """Inverse of quantization: indices -> (..., dim) feature vectors.

        Role of the reference's `quantizer.indices_to_codes`
        (vqgan_vae.py:431).
        """
        codes = self.indices_to_bits(indices)
        if self.has_projections:
            codes = self.project_out(codes)
        return codes

    # -- losses -------------------------------------------------------------

    def _entropy_aux_loss(self, x_flat: Array) -> Array:
        """Per-sample entropy minus diversity_gamma * codebook entropy,
        accumulated over sub-codebook bit groups."""
        g = self.entropy_group_bits
        num_groups = self.codebook_dim // g
        # enumerate the 2^g sub-codebook: (2^g, g) ±1 rows
        combos = (
            jnp.bitwise_and(
                jnp.right_shift(jnp.arange(2**g)[:, None], jnp.arange(g - 1, -1, -1)), 1
            ).astype(jnp.float32)
            * 2.0
            - 1.0
        )
        xg = x_flat.reshape(-1, num_groups, g)
        # softmax over sub-codes of -distance == 2 * x·c (constants drop out)
        logits = 2.0 * self.inv_temperature * jnp.einsum("ngd,kd->ngk", xg, combos)
        probs = jax.nn.softmax(logits, axis=-1)
        per_sample_entropy = _entropy(probs).mean()
        avg_probs = probs.mean(axis=0)  # (num_groups, 2^g)
        codebook_entropy = _entropy(avg_probs).sum() / num_groups
        return per_sample_entropy - self.diversity_gamma * codebook_entropy

    # -- forward ------------------------------------------------------------

    def __call__(self, x: Array, train: bool = True) -> Tuple[Array, Array, Array]:
        """x: (..., dim) -> (quantized (..., dim), indices (...,), aux_loss)."""
        orig_dtype = x.dtype
        z = self.project_in(x) if self.has_projections else x
        z = z.astype(jnp.float32)

        codes = jnp.where(z > 0, 1.0, -1.0)
        quantized = z + jax.lax.stop_gradient(codes - z)  # STE
        indices = self.bits_to_indices(z > 0)

        z_flat = z.reshape(-1, self.codebook_dim)
        if train:
            entropy_aux = self._entropy_aux_loss(z_flat)
            commit = jnp.mean(jnp.square(z - jax.lax.stop_gradient(codes)))
            aux_loss = (
                self.entropy_loss_weight * entropy_aux
                + self.commitment_loss_weight * commit
            )
        else:
            aux_loss = jnp.zeros((), jnp.float32)

        out = quantized.astype(orig_dtype)
        if self.has_projections:
            out = self.project_out(out)
        return out, indices, aux_loss


class FSQ(nnx.Module):
    """Finite Scalar Quantization (Mentzer et al. 2023, "FSQ: VQ-VAE Made
    Simple"; the same family as LFQ, cited at reference README.md:297-305).

    Each projected latent channel i is bounded with tanh and rounded to one
    of `levels[i]` uniformly spaced values; the token index is the
    mixed-radix code over channels. No codebook, no EMA state, no auxiliary
    losses (aux_loss is 0) — the most XLA-friendly quantizer of the three:
    pure elementwise math, nothing to search, nothing to synchronize across
    a mesh. Gradients flow through a straight-through estimator.

    `levels` per the paper, e.g. (8, 8, 8, 5, 5, 5) -> 64000 codes or
    (8, 6, 5) -> 240. codebook_size == prod(levels).
    """

    def __init__(
        self,
        *,
        dim: int,
        levels: Tuple[int, ...],
        rngs: nnx.Rngs,
    ):
        levels = tuple(int(l) for l in levels)
        assert len(levels) >= 1 and all(l >= 2 for l in levels)
        self.dim = dim
        self.levels = levels
        self.codebook_dim = len(levels)
        self.codebook_size = int(math.prod(levels))
        self.has_projections = dim != self.codebook_dim
        if self.has_projections:
            self.project_in = nnx.Linear(
                dim, self.codebook_dim, use_bias=False, rngs=rngs
            )
            self.project_out = nnx.Linear(
                self.codebook_dim, dim, use_bias=False, rngs=rngs
            )

    # -- static tables ------------------------------------------------------

    def _levels_arr(self) -> Array:
        return jnp.asarray(self.levels, jnp.float32)

    def _basis(self) -> Array:
        """Mixed-radix digit weights: index = sum_i digit_i * basis_i."""
        import numpy as _np

        b = _np.concatenate(([1], _np.cumprod(self.levels[:-1])))
        return jnp.asarray(b, jnp.int32)

    # -- quantization -------------------------------------------------------

    def _bound(self, z: Array) -> Array:
        """Squash each channel so rounding lands on exactly `levels[i]`
        integers. For even level counts the grid is offset by 0.5 (codes at
        ±0.5, ±1.5, ...), and z is pre-shifted by atanh(offset/half_l) so
        z = 0 still maps onto a code center."""
        levels = self._levels_arr()
        # (1 + eps), not (1 - eps): with a 2-level channel half_l must stay
        # ABOVE offset=0.5 or arctanh(offset/half_l) is NaN; the slight
        # overshoot cannot push a rounded digit out of range (max bounded
        # value is half_width + eps', which rounds back to half_width)
        half_l = (levels - 1.0) * (1.0 + 1e-3) / 2.0
        offset = jnp.where(levels % 2 == 0, 0.5, 0.0)
        shift = jnp.arctanh(offset / half_l)
        return jnp.tanh(z + shift) * half_l - offset

    def _quantize_digits(self, z: Array) -> Array:
        """z (..., codebook_dim) -> integer digits in [0, levels_i)."""
        half_width = jnp.floor(self._levels_arr() / 2.0)
        return jnp.round(self._bound(z) + half_width).astype(jnp.int32)

    def _digits_to_values(self, digits: Array) -> Array:
        """Integer digits -> normalized code values in ~[-1, 1]."""
        half_width = jnp.floor(self._levels_arr() / 2.0)
        return (digits.astype(jnp.float32) - half_width) / half_width

    def digits_to_indices(self, digits: Array) -> Array:
        return jnp.sum(digits * self._basis(), axis=-1)

    def indices_to_digits(self, indices: Array) -> Array:
        codes = indices[..., None] // self._basis()
        return codes % jnp.asarray(self.levels, jnp.int32)

    def indices_to_codes(self, indices: Array) -> Array:
        """Inverse of quantization: indices -> (..., dim) feature vectors
        (same contract as LFQ.indices_to_codes / reference vqgan_vae.py:431)."""
        codes = self._digits_to_values(self.indices_to_digits(indices))
        if self.has_projections:
            codes = self.project_out(codes)
        return codes

    # -- forward ------------------------------------------------------------

    def __call__(self, x: Array, train: bool = True) -> Tuple[Array, Array, Array]:
        """x: (..., dim) -> (quantized (..., dim), indices (...,), aux 0.0)."""
        orig_dtype = x.dtype
        z = self.project_in(x) if self.has_projections else x
        z = z.astype(jnp.float32)

        digits = self._quantize_digits(z)
        values = self._digits_to_values(digits)
        bounded = self._bound(z)
        half_width = jnp.floor(self._levels_arr() / 2.0)
        soft = bounded / half_width  # differentiable surrogate of `values`
        quantized = soft + jax.lax.stop_gradient(values - soft)  # STE
        indices = self.digits_to_indices(digits)

        out = quantized.astype(orig_dtype)
        if self.has_projections:
            out = self.project_out(out)
        return out, indices, jnp.zeros((), jnp.float32)


class VectorQuantizeEMA(nnx.Module):
    """Classic VQ with EMA codebook updates and cosine-sim search."""

    def __init__(
        self,
        *,
        dim: int,
        codebook_size: int,
        codebook_dim: int = 256,
        decay: float = 0.8,
        commitment_weight: float = 1.0,
        use_cosine_sim: bool = True,
        kmeans_init: bool = True,
        kmeans_iters: int = 10,
        threshold_ema_dead_code: float = 0.0,
        eps: float = 1e-5,
        rngs: nnx.Rngs,
    ):
        self.dim = dim
        self.codebook_size = codebook_size
        self.codebook_dim = codebook_dim
        self.decay = decay
        self.commitment_weight = commitment_weight
        self.use_cosine_sim = use_cosine_sim
        self.kmeans_init = kmeans_init
        self.kmeans_iters = kmeans_iters
        # codes whose EMA cluster size falls below this get re-seeded from
        # the current batch (vector_quantize_pytorch's expired-code revival;
        # 0 disables, the upstream default)
        self.threshold_ema_dead_code = threshold_ema_dead_code
        self.eps = eps

        self.has_projections = dim != codebook_dim
        if self.has_projections:
            self.project_in = nnx.Linear(dim, codebook_dim, rngs=rngs)
            self.project_out = nnx.Linear(codebook_dim, dim, rngs=rngs)

        init = jax.random.normal(rngs.params(), (codebook_size, codebook_dim))
        if use_cosine_sim:
            init = l2norm(init)
        # EMA state — not trainable parameters
        self.codebook = nnx.BatchStat(init)
        self.cluster_size = nnx.BatchStat(jnp.zeros((codebook_size,)))
        self.embed_avg = nnx.BatchStat(init.copy())
        self.initted = nnx.BatchStat(jnp.array(not kmeans_init))

    # -- codebook bootstrap -------------------------------------------------

    def _kmeans(self, z: Array, key: Array) -> Array:
        """Static-iteration kmeans over the first batch (kmeans_init=True,
        reference vq_kwargs at vqgan_vae.py:297-303)."""
        n = z.shape[0]
        idx = jax.random.randint(key, (self.codebook_size,), 0, n)
        centers = z[idx]

        def step(_, centers):
            cb = l2norm(centers) if self.use_cosine_sim else centers
            zq = l2norm(z) if self.use_cosine_sim else z
            assign = nearest_code(zq, cb, impl="xla")
            onehot = jax.nn.one_hot(assign, self.codebook_size, dtype=z.dtype)
            counts = onehot.sum(0)
            sums = onehot.T @ z
            new_centers = sums / jnp.maximum(counts[:, None], 1.0)
            return jnp.where(counts[:, None] > 0, new_centers, centers)

        centers = jax.lax.fori_loop(0, self.kmeans_iters, step, centers)
        return l2norm(centers) if self.use_cosine_sim else centers

    def _maybe_init(self, z: Array, key: Optional[Array]):
        if not self.kmeans_init or key is None:
            return
        centers = jax.lax.cond(
            self.initted[...],
            lambda: self.codebook[...],
            lambda: self._kmeans(z, key),
        )
        self.codebook[...] = centers
        self.embed_avg[...] = jnp.where(
            self.initted[...], self.embed_avg[...], centers
        )
        self.cluster_size[...] = jnp.where(
            self.initted[...], self.cluster_size[...], jnp.ones_like(self.cluster_size[...])
        )
        self.initted[...] = jnp.array(True)

    # -- EMA update ---------------------------------------------------------

    def _ema_update(self, z: Array, onehot: Array, rng: Optional[Array] = None):
        counts = onehot.sum(0)  # (K,)
        sums = onehot.T @ z  # (K, d)
        d = self.decay
        self.cluster_size[...] = d * self.cluster_size[...] + (1 - d) * counts
        self.embed_avg[...] = d * self.embed_avg[...] + (1 - d) * sums

        # Laplace-smoothed cluster sizes
        n = self.cluster_size[...].sum()
        smoothed = (
            (self.cluster_size[...] + self.eps)
            / (n + self.codebook_size * self.eps)
            * n
        )
        embed = self.embed_avg[...] / smoothed[:, None]
        if self.use_cosine_sim:
            embed = l2norm(embed)

        if self.threshold_ema_dead_code > 0 and rng is not None:
            # expired-code revival: re-seed dead codes from random batch rows
            dead = self.cluster_size[...] < self.threshold_ema_dead_code
            pick = jax.random.randint(rng, (self.codebook_size,), 0, z.shape[0])
            samples = z[pick]
            if self.use_cosine_sim:
                samples = l2norm(samples)
            embed = jnp.where(dead[:, None], samples, embed)
            self.cluster_size[...] = jnp.where(
                dead, self.threshold_ema_dead_code, self.cluster_size[...]
            )
            self.embed_avg[...] = jnp.where(
                dead[:, None],
                samples * self.threshold_ema_dead_code,
                self.embed_avg[...],
            )

        self.codebook[...] = embed

    # -- forward ------------------------------------------------------------

    def get_codes_from_indices(self, indices: Array) -> Array:
        codes = self.codebook[...][indices]
        if self.has_projections:
            codes = self.project_out(codes)
        return codes

    def update_from_input(self, x: Array, rng: Optional[Array] = None) -> None:
        """Apply kmeans-init + EMA codebook updates for a batch. MUST be
        called OUTSIDE any jax.grad trace (flax only allows Variable mutation
        under its own lifted transforms); the trainers call it after the
        gradient computation with `update_stats=False` in the loss."""
        z = self.project_in(x) if self.has_projections else x
        z_flat = jax.lax.stop_gradient(
            z.reshape(-1, self.codebook_dim).astype(jnp.float32)
        )
        self._maybe_init(z_flat, rng)
        cb = self.codebook[...]
        if self.use_cosine_sim:
            indices = nearest_code(l2norm(z_flat), cb, cb_sq=jnp.zeros(cb.shape[0]))
        else:
            indices = nearest_code(z_flat, cb)
        onehot = jax.nn.one_hot(indices, self.codebook_size, dtype=jnp.float32)
        self._ema_update(z_flat, onehot, rng=rng)

    def __call__(
        self,
        x: Array,
        train: bool = True,
        rng: Optional[Array] = None,
        update_stats: Optional[bool] = None,
    ) -> Tuple[Array, Array, Array]:
        """x: (..., dim) -> (quantized (..., dim), indices (...,), aux_loss).

        `update_stats` (default: follows `train`) gates the kmeans-init/EMA
        mutations — pass False inside differentiated code and call
        `update_from_input` afterwards."""
        update_stats = train if update_stats is None else update_stats
        lead_shape = x.shape[:-1]
        z = self.project_in(x) if self.has_projections else x
        z_flat = z.reshape(-1, self.codebook_dim).astype(jnp.float32)

        if update_stats:
            self._maybe_init(z_flat, rng)

        cb = self.codebook[...]
        if self.use_cosine_sim:
            zq_search = l2norm(z_flat)
            indices = nearest_code(zq_search, cb, cb_sq=jnp.zeros(cb.shape[0]))
        else:
            indices = nearest_code(z_flat, cb)

        quantized_flat = cb[indices]
        commit = jnp.mean(
            jnp.square(jax.lax.stop_gradient(quantized_flat) - z_flat)
        )
        aux_loss = self.commitment_weight * commit

        if update_stats:
            onehot = jax.nn.one_hot(indices, self.codebook_size, dtype=jnp.float32)
            self._ema_update(z_flat, onehot, rng=rng)

        # straight-through
        quantized_flat = z_flat + jax.lax.stop_gradient(quantized_flat - z_flat)

        quantized = quantized_flat.reshape(*lead_shape, self.codebook_dim).astype(x.dtype)
        if self.has_projections:
            quantized = self.project_out(quantized)
        indices = indices.reshape(lead_shape)
        return quantized, indices, aux_loss.astype(jnp.float32)
