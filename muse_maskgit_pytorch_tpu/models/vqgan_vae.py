"""VQ-GAN VAE image tokenizer: conv ResNet encoder/decoder + quantizer +
PatchGAN discriminator + GAN loss toolkit.

TPU-native rebuild of `/root/reference/muse_maskgit_pytorch/vqgan_vae.py`:
  * layout is NHWC (TPU conv-native) instead of the reference's NCHW;
  * the quantizers are this framework's LFQ / EMA-VQ (`models/quantizers.py`)
    — the EMA-VQ construction bug (missing comma, vqgan_vae.py:341; undefined
    `self.codebook` in decode, :434 — SURVEY.md §2.4 B2) is fixed: the non-LFQ
    path works end to end here;
  * the adaptive generator weight (vqgan_vae.py:517-525) and the R1-style
    gradient penalty (vqgan_vae.py:88-101) are computed with nested
    `jax.grad` closures instead of torch's `autograd.grad(create_graph=True)`,
    so the whole GAN step stays inside one jitted function;
  * randomness is explicit (`rngs` / key arguments), no global RNG.

Public surface mirrors the reference: `encode` (vqgan_vae.py:422-425),
`decode`, `decode_from_ids` (:427-438), `__call__` with
`return_loss` / `return_discr_loss` / `return_recons` /
`add_gradient_penalty` (:443-534), `get_encoded_fmap_size` (:391-392),
`copy_for_eval` (:394-403), `save` / `load` (:413-420).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import chex
import jax
import jax.numpy as jnp
from flax import nnx

from muse_maskgit_pytorch_tpu.models.quantizers import FSQ, LFQ, VectorQuantizeEMA
from muse_maskgit_pytorch_tpu.utils.helpers import default, exists, groupby_prefix_and_trim

Array = jax.Array


def leaky_relu(x: Array) -> Array:
    return jax.nn.leaky_relu(x, negative_slope=0.1)


def safe_div(numer: Array, denom: Array, eps: float = 1e-8) -> Array:
    return numer / jnp.clip(denom, min=eps)


# ---------------------------------------------------------------------------
# GAN losses (reference vqgan_vae.py:85-129)
# ---------------------------------------------------------------------------


def hinge_discr_loss(fake: Array, real: Array) -> Array:
    # losses are f32 regardless of the towers' compute dtype (gan_dtype)
    fake, real = fake.astype(jnp.float32), real.astype(jnp.float32)
    return jnp.mean(jax.nn.relu(1 + fake) + jax.nn.relu(1 - real))


def hinge_gen_loss(fake: Array) -> Array:
    return -jnp.mean(fake.astype(jnp.float32))


def _log(t: Array, eps: float = 1e-10) -> Array:
    return jnp.log(t + eps)


def bce_discr_loss(fake: Array, real: Array) -> Array:
    fake, real = fake.astype(jnp.float32), real.astype(jnp.float32)
    return jnp.mean(-_log(1 - jax.nn.sigmoid(fake)) - _log(jax.nn.sigmoid(real)))


def bce_gen_loss(fake: Array) -> Array:
    return jnp.mean(-_log(jax.nn.sigmoid(fake.astype(jnp.float32))))


def gradient_penalty(images: Array, discr_fn, weight: float = 10.0) -> Array:
    """R1-style penalty: (||d discr(img).sum() / d img||_2 - 1)^2 per sample.

    Matches reference `gradient_penalty` (vqgan_vae.py:88-101); torch's
    `create_graph=True` double-backward becomes plain nested `jax.grad`.
    """
    grads = jax.grad(lambda im: jnp.sum(discr_fn(im).astype(jnp.float32)))(images)
    grads = grads.reshape(grads.shape[0], -1).astype(jnp.float32)
    return weight * jnp.mean(jnp.square(jnp.linalg.norm(grads, axis=1) - 1))


class LayerNormChan(nnx.Module):
    """Channel-wise LayerNorm over feature maps (reference vqgan_vae.py:133-146
    — defined there but unused; provided for inventory parity). Our layout is
    NHWC so the normalized axis is the last one; biased variance, gamma-only,
    like the reference."""

    def __init__(self, dim: int, eps: float = 1e-5, *, rngs: nnx.Rngs):
        self.eps = eps
        self.gamma = nnx.Param(jnp.ones((dim,)))

    def __call__(self, x: Array) -> Array:
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(jnp.clip(var, min=self.eps)) * self.gamma[...]


# ---------------------------------------------------------------------------
# blocks (reference vqgan_vae.py:251-281)
# ---------------------------------------------------------------------------


class ResBlock(nnx.Module):
    def __init__(self, chan: int, groups: int = 16, dtype=jnp.float32, *, rngs: nnx.Rngs):
        self.conv1 = nnx.Conv(chan, chan, (3, 3), padding=1, dtype=dtype, rngs=rngs)
        self.norm1 = nnx.GroupNorm(chan, num_groups=groups, rngs=rngs)
        self.conv2 = nnx.Conv(chan, chan, (3, 3), padding=1, dtype=dtype, rngs=rngs)
        self.norm2 = nnx.GroupNorm(chan, num_groups=groups, rngs=rngs)
        self.conv3 = nnx.Conv(chan, chan, (1, 1), dtype=dtype, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        h = leaky_relu(self.norm1(self.conv1(x)))
        h = leaky_relu(self.norm2(self.conv2(h)))
        return self.conv3(h) + x


class GLUResBlock(nnx.Module):
    def __init__(self, chan: int, groups: int = 16, dtype=jnp.float32, *, rngs: nnx.Rngs):
        self.conv1 = nnx.Conv(chan, chan * 2, (3, 3), padding=1, dtype=dtype, rngs=rngs)
        self.norm1 = nnx.GroupNorm(chan, num_groups=groups, rngs=rngs)
        self.conv2 = nnx.Conv(chan, chan * 2, (3, 3), padding=1, dtype=dtype, rngs=rngs)
        self.norm2 = nnx.GroupNorm(chan, num_groups=groups, rngs=rngs)
        self.conv3 = nnx.Conv(chan, chan, (1, 1), dtype=dtype, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        h = jax.nn.glu(self.conv1(x), axis=-1)
        h = self.norm1(h)
        h = jax.nn.glu(self.conv2(h), axis=-1)
        h = self.norm2(h)
        return self.conv3(h) + x


# ---------------------------------------------------------------------------
# encoder / decoder (reference vqgan_vae.py:185-249)
# ---------------------------------------------------------------------------


class ResnetEncDec(nnx.Module):
    """Symmetric conv pyramid: stride-2 downs with ResBlocks on the encoder
    side, transpose-conv ups with GLUResBlocks on the decoder side."""

    def __init__(
        self,
        dim: int,
        *,
        channels: int = 3,
        layers: int = 4,
        layer_mults: Optional[Sequence[int]] = None,
        num_resnet_blocks: Union[int, Tuple[int, ...]] = 1,
        resnet_groups: int = 16,
        first_conv_kernel_size: int = 5,
        dtype=jnp.float32,
        remat: bool = False,
        rngs: nnx.Rngs,
    ):
        assert dim % resnet_groups == 0
        self.dtype = dtype
        # rematerialize each enc/dec layer's activations on backward
        # (jax.checkpoint): the GAN step at the reference scale (dim 256,
        # 256px) exceeds one v5e's 16G HBM at micro-batch 8 without it —
        # the nested-grad adaptive weight + R1 penalty hold every conv
        # activation live. Enable via `VQGanVAE(..., encdec_remat=True)`.
        self.remat = remat

        self.layers = layers
        layer_mults = list(default(layer_mults, [2**t for t in range(layers)]))
        assert len(layer_mults) == layers
        layer_dims = [dim * mult for mult in layer_mults]
        dims = (dim, *layer_dims)
        self.encoded_dim = dims[-1]
        dim_pairs = list(zip(dims[:-1], dims[1:]))

        if not isinstance(num_resnet_blocks, (tuple, list)):
            num_resnet_blocks = (*((0,) * (layers - 1)), num_resnet_blocks)
        assert len(num_resnet_blocks) == layers

        pad5 = first_conv_kernel_size // 2
        encoders = [
            nnx.Conv(channels, dim, (first_conv_kernel_size,) * 2, padding=pad5, dtype=dtype, rngs=rngs)
        ]
        decoders = []  # built back-to-front like the reference (prepend)

        for (dim_in, dim_out), n_res in zip(dim_pairs, num_resnet_blocks):
            encoders.append(
                _StridedConv(dim_in, dim_out, dtype=dtype, rngs=rngs)
            )
            decoders.insert(0, _UpConv(dim_out, dim_in, dtype=dtype, rngs=rngs))
            for _ in range(n_res):
                encoders.append(ResBlock(dim_out, groups=resnet_groups, dtype=dtype, rngs=rngs))
                decoders.insert(0, GLUResBlock(dim_out, groups=resnet_groups, dtype=dtype, rngs=rngs))

        self.encoders = nnx.List(encoders)
        self.decoder_trunk = nnx.List(decoders)
        # final 1x1 conv kept separate: its kernel is the reference's
        # `last_dec_layer` (vqgan_vae.py:237-239) used by the adaptive weight
        # (always f32: it feeds pixel outputs and the adaptive-weight grads)
        self.final_conv = nnx.Conv(dim, channels, (1, 1), rngs=rngs)

    def get_encoded_fmap_size(self, image_size: int) -> int:
        return image_size // (2**self.layers)

    @property
    def last_dec_layer(self) -> Array:
        return self.final_conv.kernel[...]

    def encode(self, x: Array) -> Array:
        for enc in self.encoders:
            f = (lambda x, enc=enc: enc(x))
            x = jax.checkpoint(f)(x) if self.remat else f(x)
        return x

    def decode_trunk_fn(self, x: Array) -> Array:
        for dec in self.decoder_trunk:
            f = (lambda x, dec=dec: dec(x))
            x = jax.checkpoint(f)(x) if self.remat else f(x)
        return x

    def decode(self, x: Array) -> Array:
        return self.final_conv(self.decode_trunk_fn(x))


class _StridedConv(nnx.Module):
    def __init__(self, dim_in: int, dim_out: int, dtype=jnp.float32, *, rngs: nnx.Rngs):
        self.conv = nnx.Conv(
            dim_in, dim_out, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)), dtype=dtype, rngs=rngs
        )

    def __call__(self, x: Array) -> Array:
        return leaky_relu(self.conv(x))


class _UpConv(nnx.Module):
    def __init__(self, dim_in: int, dim_out: int, dtype=jnp.float32, *, rngs: nnx.Rngs):
        self.conv = nnx.ConvTranspose(
            dim_in, dim_out, (4, 4), strides=(2, 2), padding="SAME", dtype=dtype, rngs=rngs
        )

    def __call__(self, x: Array) -> Array:
        return leaky_relu(self.conv(x))


# ---------------------------------------------------------------------------
# discriminator (reference vqgan_vae.py:150-181)
# ---------------------------------------------------------------------------


class Discriminator(nnx.Module):
    def __init__(
        self,
        dims: Sequence[int],
        channels: int = 3,
        groups: int = 16,
        init_kernel_size: int = 5,
        dtype=None,
        *,
        rngs: nnx.Rngs,
    ):
        # dtype = conv compute dtype (params f32); GroupNorms stay f32
        pad = init_kernel_size // 2
        self.init_conv = nnx.Conv(
            channels, dims[0], (init_kernel_size,) * 2, padding=pad, dtype=dtype, rngs=rngs
        )
        convs, norms = [], []
        for dim_in, dim_out in zip(dims[:-1], dims[1:]):
            convs.append(
                nnx.Conv(dim_in, dim_out, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)), dtype=dtype, rngs=rngs)
            )
            norms.append(nnx.GroupNorm(dim_out, num_groups=groups, rngs=rngs))
        self.convs = nnx.List(convs)
        self.norms = nnx.List(norms)
        dim = dims[-1]
        # PatchGAN-style 5x5 logit map head (vqgan_vae.py:171-175)
        self.to_logits_conv1 = nnx.Conv(dim, dim, (1, 1), dtype=dtype, rngs=rngs)
        self.to_logits_conv2 = nnx.Conv(dim, 1, (4, 4), padding="VALID", dtype=dtype, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        x = leaky_relu(self.init_conv(x))
        for conv, norm in zip(self.convs, self.norms):
            x = leaky_relu(norm(conv(x)))
        x = leaky_relu(self.to_logits_conv1(x))
        # tiny inputs can shrink below the 4x4 head kernel; pad so the VALID
        # conv still emits at least one logit (the reference would just crash)
        if x.shape[1] < 4 or x.shape[2] < 4:
            ph, pw = max(0, 4 - x.shape[1]), max(0, 4 - x.shape[2])
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        return self.to_logits_conv2(x)


# ---------------------------------------------------------------------------
# main VQGanVAE
# ---------------------------------------------------------------------------


class VQGanVAE(nnx.Module):
    def __init__(
        self,
        *,
        dim: int,
        channels: int = 3,
        layers: int = 4,
        l2_recon_loss: bool = False,
        use_hinge_loss: bool = True,
        vgg: Optional[nnx.Module] = None,
        lookup_free_quantization: bool = True,
        codebook_size: int = 65536,
        fsq_levels: Optional[tuple] = None,
        vq_kwargs: Optional[dict] = None,
        lfq_kwargs: Optional[dict] = None,
        use_vgg_and_gan: bool = True,
        discr_layers: int = 4,
        dtype=jnp.float32,
        vgg_dtype=None,
        discr_dtype=None,
        rngs: nnx.Rngs,
        **kwargs,
    ):
        # `dtype` is the enc/dec compute dtype; `vgg_dtype`/`discr_dtype`
        # (default f32) separately control the loss towers' compute. bf16
        # VGG is a measured +5% on the reference-scale GAN step (BASELINE.md
        # r3); bf16 DISCRIMINATOR deterministically crashes the current v5e
        # XLA compiler (SIGSEGV in the R1 grad-of-grad through bf16 convs) —
        # the knob exists for other toolchains but is not recommended here.
        # Losses and GroupNorms compute f32 regardless.
        vq_kwargs = dict(
            codebook_dim=256,
            decay=0.8,
            commitment_weight=1.0,
            kmeans_init=True,
            use_cosine_sim=True,
        ) | (vq_kwargs or {})
        lfq_kwargs = dict(diversity_gamma=4.0) | (lfq_kwargs or {})

        # kwarg prefix routing — the reference's config system
        # (vqgan_vae.py:60-81,312-313)
        extra_vq_kwargs, kwargs = groupby_prefix_and_trim("vq_", kwargs)
        encdec_kwargs, kwargs = groupby_prefix_and_trim("encdec_", kwargs)
        assert not kwargs, f"unknown kwargs: {sorted(kwargs)}"
        vq_kwargs |= extra_vq_kwargs

        if fsq_levels is not None:
            # FSQ's vocabulary is determined by its level spec
            import math as _math

            codebook_size = int(_math.prod(int(l) for l in fsq_levels))

        self.channels = channels
        self.codebook_size = codebook_size
        self.dim_divisor = 2**layers

        self.enc_dec = ResnetEncDec(
            dim=dim, channels=channels, layers=layers, dtype=dtype, rngs=rngs, **encdec_kwargs
        )

        self.lookup_free_quantization = lookup_free_quantization
        if fsq_levels is not None:
            self.lookup_free_quantization = False
            self.quantizer = FSQ(
                dim=self.enc_dec.encoded_dim,
                levels=tuple(fsq_levels),
                rngs=rngs,
            )
        elif lookup_free_quantization:
            self.quantizer = LFQ(
                dim=self.enc_dec.encoded_dim,
                codebook_size=codebook_size,
                rngs=rngs,
                **lfq_kwargs,
            )
        else:
            self.quantizer = VectorQuantizeEMA(
                dim=self.enc_dec.encoded_dim,
                codebook_size=codebook_size,
                rngs=rngs,
                **vq_kwargs,
            )

        self.vgg_dtype = vgg_dtype
        self.l2_recon_loss = l2_recon_loss
        self.use_hinge_loss = use_hinge_loss
        self.use_vgg_and_gan = use_vgg_and_gan

        self._vgg = nnx.data(None)
        self.discr = nnx.data(None)
        if not use_vgg_and_gan:
            return

        if exists(vgg):
            self._vgg = nnx.data(vgg)

        layer_mults = [2**t for t in range(discr_layers)]
        layer_dims = [dim * mult for mult in layer_mults]
        dims = (dim, *layer_dims)
        self.discr = Discriminator(
            dims=dims, channels=channels, dtype=discr_dtype, rngs=rngs
        )

    # -- properties ----------------------------------------------------------

    @property
    def encoded_dim(self) -> int:
        return self.enc_dec.encoded_dim

    def get_encoded_fmap_size(self, image_size: int) -> int:
        return self.enc_dec.get_encoded_fmap_size(image_size)

    @property
    def vgg(self):
        """Perceptual feature extractor. Unlike the reference's lazy
        torchvision download (vqgan_vae.py:377-385) the module must be
        provided (or injected via `set_vgg`) — zero-egress environments have
        no model hub. Random-init VGG is created on demand as a fallback."""
        if self._vgg is None:
            from muse_maskgit_pytorch_tpu.models.vgg import VGG16

            self._vgg = nnx.data(VGG16(dtype=self.vgg_dtype, rngs=nnx.Rngs(0)))
        return self._vgg

    def set_vgg(self, vgg: nnx.Module):
        self._vgg = nnx.data(vgg)

    # -- persistence (reference vqgan_vae.py:405-420) ------------------------

    def save(self, path):
        from muse_maskgit_pytorch_tpu.utils.checkpoint import save_module

        # `remove_vgg` semantics: the VGG tower is never checkpointed
        save_module(self, path, exclude=("_vgg",))

    def load(self, path):
        from muse_maskgit_pytorch_tpu.utils.checkpoint import load_module

        load_module(self, path, exclude=("_vgg",))

    def copy_for_eval(self) -> "VQGanVAE":
        """Deep copy with the discriminator and VGG stripped
        (reference vqgan_vae.py:394-403)."""
        vae_copy = nnx.clone(self)
        vae_copy.discr = nnx.data(None)
        vae_copy._vgg = nnx.data(None)
        vae_copy.use_vgg_and_gan = False
        return vae_copy

    # -- core codec ----------------------------------------------------------

    def encode(
        self,
        img: Array,
        train: bool = False,
        rng: Optional[Array] = None,
        update_stats: Optional[bool] = None,
    ) -> Tuple[Array, Array, Array]:
        """img: (b, h, w, c) in [0, 1] -> (fmap (b,h',w',d), ids (b,h',w'), aux).

        `update_stats` gates EMA-VQ codebook mutations (must be False inside
        jax.grad; see `update_quantizer_stats`)."""
        chex.assert_rank(img, 4)  # NHWC
        fmap = self.enc_dec.encode(img)
        if isinstance(self.quantizer, VectorQuantizeEMA):
            return self.quantizer(fmap, train=train, rng=rng, update_stats=update_stats)
        return self.quantizer(fmap, train=train)

    def update_quantizer_stats(self, img: Array, rng: Optional[Array] = None) -> None:
        """EMA-VQ codebook statistics update for a batch (no-op for LFQ).
        Called by the trainer outside the gradient computation."""
        if isinstance(self.quantizer, VectorQuantizeEMA):
            fmap = jax.lax.stop_gradient(self.enc_dec.encode(img))
            self.quantizer.update_from_input(fmap, rng=rng)

    def decode(self, fmap: Array) -> Array:
        return self.enc_dec.decode(fmap)

    def decode_from_ids(self, ids: Array) -> Array:
        """ids: (b, h', w') int -> images (b, h, w, c)."""
        if isinstance(self.quantizer, VectorQuantizeEMA):
            fmap = self.quantizer.get_codes_from_indices(ids)
        else:  # LFQ and FSQ share the indices_to_codes contract
            fmap = self.quantizer.indices_to_codes(ids)
        return self.decode(fmap)

    # -- losses (reference vqgan_vae.py:443-534) ------------------------------

    def __call__(
        self,
        img: Array,
        return_loss: bool = False,
        return_discr_loss: bool = False,
        return_recons: bool = False,
        add_gradient_penalty: bool = True,
        apply_adaptive_weight: bool = True,
        train: bool = True,
        rng: Optional[Array] = None,
        update_stats: Optional[bool] = None,
    ):
        b, height, width, channels = img.shape
        for name, size in (("height", height), ("width", width)):
            assert size % self.dim_divisor == 0, f"{name} must be divisible by {self.dim_divisor}"
        assert channels == self.channels

        fmap, _indices, commit_loss = self.encode(
            img, train=train, rng=rng, update_stats=update_stats
        )

        # keep the decoder split so the adaptive weight can grad wrt the
        # final conv kernel only (reference vqgan_vae.py:517-525)
        h = self.enc_dec.decode_trunk_fn(fmap)
        recon = self.enc_dec.final_conv(h)

        if not return_loss and not return_discr_loss:
            return recon

        assert return_loss ^ return_discr_loss

        if return_discr_loss:
            assert exists(self.discr), "discriminator must exist to train it"
            fake = jax.lax.stop_gradient(recon)
            discr_loss_fn = hinge_discr_loss if self.use_hinge_loss else bce_discr_loss
            fake_logits = self.discr(fake)
            real_logits = self.discr(img)
            loss = discr_loss_fn(fake_logits, real_logits)
            if add_gradient_penalty:
                loss = loss + gradient_penalty(img, self.discr)
            if return_recons:
                return loss, recon
            return loss

        # -- autoencoder loss
        recon_loss_fn = (
            (lambda a, b: jnp.mean(jnp.square(a - b)))
            if self.l2_recon_loss
            else (lambda a, b: jnp.mean(jnp.abs(a - b)))
        )
        recon_loss = recon_loss_fn(recon, img)

        if not self.use_vgg_and_gan:
            if return_recons:
                return recon_loss, recon
            return recon_loss

        # perceptual loss: raw [0,1] images into VGG (the reference does not
        # ImageNet-normalize, vqgan_vae.py:502-511); grayscale replicated to 3
        img_vgg_in, recon_vgg_in = img, recon
        if channels == 1:
            img_vgg_in = jnp.repeat(img_vgg_in, 3, axis=-1)
            recon_vgg_in = jnp.repeat(recon_vgg_in, 3, axis=-1)

        img_vgg_feats = self.vgg(img_vgg_in)
        recon_vgg_feats = self.vgg(recon_vgg_in)
        perceptual_loss = jnp.mean(
            jnp.square(
                img_vgg_feats.astype(jnp.float32)
                - recon_vgg_feats.astype(jnp.float32)
            )
        )

        gen_loss_fn = hinge_gen_loss if self.use_hinge_loss else bce_gen_loss
        gen_loss = gen_loss_fn(self.discr(recon))

        # adaptive weight = ||∂perceptual/∂w_last|| / ||∂gen/∂w_last||, clamped
        if apply_adaptive_weight and exists(self.discr):
            h_sg = jax.lax.stop_gradient(h)
            bias = jax.lax.stop_gradient(self.enc_dec.final_conv.bias[...])
            img_feats_sg = jax.lax.stop_gradient(img_vgg_feats)

            def recon_of_w(w):
                # final conv is 1x1: plain channel matmul
                return jnp.einsum("bhwc,co->bhwo", h_sg, w[0, 0]) + bias

            def perceptual_of_w(w):
                r = recon_of_w(w)
                if channels == 1:
                    r = jnp.repeat(r, 3, axis=-1)
                return jnp.mean(
                    jnp.square(
                        img_feats_sg.astype(jnp.float32)
                        - self.vgg(r).astype(jnp.float32)
                    )
                )

            def gen_of_w(w):
                return gen_loss_fn(self.discr(recon_of_w(w)))

            w_last = self.enc_dec.final_conv.kernel[...]
            g_p = jax.grad(perceptual_of_w)(w_last)
            g_g = jax.grad(gen_of_w)(w_last)
            adaptive_weight = safe_div(
                jnp.linalg.norm(g_p.reshape(-1)), jnp.linalg.norm(g_g.reshape(-1))
            )
            adaptive_weight = jax.lax.stop_gradient(
                jnp.clip(adaptive_weight, max=1e4)
            )
        else:
            adaptive_weight = jnp.float32(1.0)

        loss = recon_loss + perceptual_loss + commit_loss + adaptive_weight * gen_loss
        if return_recons:
            return loss, recon
        return loss
