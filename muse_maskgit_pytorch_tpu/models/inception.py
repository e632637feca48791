"""InceptionV3 pool3 feature extractor — the STANDARD FID architecture.

The reference repo has no evaluation metrics at all (SURVEY.md §5); this
framework's streaming FID (`utils/eval.py`) previously offered only the
in-framework VGG16 tower, whose scores order models but match no published
number. This module is the torchvision `inception_v3` architecture (2048-d
global-average-pool "pool3" features), NHWC and inference-only, with a
torchvision-layout weight converter in
`utils/convert.py::load_torchvision_inception_v3` — one weight file obtained
on a connected machine (`examples/fetch_and_convert.py`) makes scores
comparable to other torchvision-weight FID implementations. Caveat for
cross-PAPER comparisons: most published FIDs use pytorch-fid's TF-ported
`pt_inception-2015-12-05` checkpoint, whose weights and pooling details
(count_include_pad=False avg pools) differ from torchvision's ImageNet
inception_v3 — the two towers give systematically different FID values, so
re-measure the reference set with THIS tower instead of quoting printed
numbers.

Structure mirrors torchvision exactly (same attribute names, so the
converter can walk the module tree against the state_dict): a `BasicConv2d`
(bias-free conv + BatchNorm(eps=1e-3) + ReLU) stem, Inception blocks A/B/C/
D/E, global average pool -> (b, 2048). Aux classifier and fc omitted (FID
never uses them). BatchNorm runs in inference mode from stored statistics —
the tower is frozen by definition.

Input convention (pytorch-fid): (b, 299, 299, 3) in [-1, 1];
`utils/eval.py::make_inception_extractor` handles the resize + rescale from
[0, 1] images. Any spatial size >= 75 works (tests use small inputs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

Array = jax.Array


def _avg_pool_3x3_s1_pad1(x: Array) -> Array:
    """torch AvgPool2d(3, stride=1, padding=1) with count_include_pad=True
    (the torchvision inception default): zero-padded sum / 9."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    return s / 9.0


def _max_pool_3x3_s2(x: Array) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


class BasicConv2d(nnx.Module):
    """conv(bias=False) + BatchNorm(eps=0.001, inference) + ReLU —
    torchvision `BasicConv2d`."""

    def __init__(self, in_ch: int, out_ch: int, kernel, stride=1, padding=0,
                 *, rngs: nnx.Rngs):
        if isinstance(kernel, int):
            kernel = (kernel, kernel)
        if isinstance(padding, int):
            padding = ((padding, padding), (padding, padding))
        else:
            padding = ((padding[0], padding[0]), (padding[1], padding[1]))
        if isinstance(stride, int):
            stride = (stride, stride)
        self.conv = nnx.Conv(
            in_ch, out_ch, kernel, strides=stride, padding=padding,
            use_bias=False, rngs=rngs,
        )
        self.bn_scale = nnx.Param(jnp.ones((out_ch,)))
        self.bn_bias = nnx.Param(jnp.zeros((out_ch,)))
        self.bn_mean = nnx.Param(jnp.zeros((out_ch,)))
        self.bn_var = nnx.Param(jnp.ones((out_ch,)))

    def __call__(self, x: Array) -> Array:
        x = self.conv(x)
        inv = jax.lax.rsqrt(self.bn_var[...] + 1e-3)
        x = (x - self.bn_mean[...]) * (inv * self.bn_scale[...]) + self.bn_bias[...]
        return jax.nn.relu(x)


class InceptionA(nnx.Module):
    def __init__(self, in_ch: int, pool_features: int, *, rngs: nnx.Rngs):
        self.branch1x1 = BasicConv2d(in_ch, 64, 1, rngs=rngs)
        self.branch5x5_1 = BasicConv2d(in_ch, 48, 1, rngs=rngs)
        self.branch5x5_2 = BasicConv2d(48, 64, 5, padding=2, rngs=rngs)
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, 1, rngs=rngs)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, 3, padding=1, rngs=rngs)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, 3, padding=1, rngs=rngs)
        self.branch_pool = BasicConv2d(in_ch, pool_features, 1, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(_avg_pool_3x3_s1_pad1(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nnx.Module):
    def __init__(self, in_ch: int, *, rngs: nnx.Rngs):
        self.branch3x3 = BasicConv2d(in_ch, 384, 3, stride=2, rngs=rngs)
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 64, 1, rngs=rngs)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, 3, padding=1, rngs=rngs)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, 3, stride=2, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nnx.Module):
    def __init__(self, in_ch: int, channels_7x7: int, *, rngs: nnx.Rngs):
        c7 = channels_7x7
        self.branch1x1 = BasicConv2d(in_ch, 192, 1, rngs=rngs)
        self.branch7x7_1 = BasicConv2d(in_ch, c7, 1, rngs=rngs)
        self.branch7x7_2 = BasicConv2d(c7, c7, (1, 7), padding=(0, 3), rngs=rngs)
        self.branch7x7_3 = BasicConv2d(c7, 192, (7, 1), padding=(3, 0), rngs=rngs)
        self.branch7x7dbl_1 = BasicConv2d(in_ch, c7, 1, rngs=rngs)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, (7, 1), padding=(3, 0), rngs=rngs)
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, (1, 7), padding=(0, 3), rngs=rngs)
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, (7, 1), padding=(3, 0), rngs=rngs)
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, (1, 7), padding=(0, 3), rngs=rngs)
        self.branch_pool = BasicConv2d(in_ch, 192, 1, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(
            self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))
            )
        )
        bp = self.branch_pool(_avg_pool_3x3_s1_pad1(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nnx.Module):
    def __init__(self, in_ch: int, *, rngs: nnx.Rngs):
        self.branch3x3_1 = BasicConv2d(in_ch, 192, 1, rngs=rngs)
        self.branch3x3_2 = BasicConv2d(192, 320, 3, stride=2, rngs=rngs)
        self.branch7x7x3_1 = BasicConv2d(in_ch, 192, 1, rngs=rngs)
        self.branch7x7x3_2 = BasicConv2d(192, 192, (1, 7), padding=(0, 3), rngs=rngs)
        self.branch7x7x3_3 = BasicConv2d(192, 192, (7, 1), padding=(3, 0), rngs=rngs)
        self.branch7x7x3_4 = BasicConv2d(192, 192, 3, stride=2, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(
            self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
        )
        bp = _max_pool_3x3_s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nnx.Module):
    def __init__(self, in_ch: int, *, rngs: nnx.Rngs):
        self.branch1x1 = BasicConv2d(in_ch, 320, 1, rngs=rngs)
        self.branch3x3_1 = BasicConv2d(in_ch, 384, 1, rngs=rngs)
        self.branch3x3_2a = BasicConv2d(384, 384, (1, 3), padding=(0, 1), rngs=rngs)
        self.branch3x3_2b = BasicConv2d(384, 384, (3, 1), padding=(1, 0), rngs=rngs)
        self.branch3x3dbl_1 = BasicConv2d(in_ch, 448, 1, rngs=rngs)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, 3, padding=1, rngs=rngs)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, (1, 3), padding=(0, 1), rngs=rngs)
        self.branch3x3dbl_3b = BasicConv2d(384, 384, (3, 1), padding=(1, 0), rngs=rngs)
        self.branch_pool = BasicConv2d(in_ch, 192, 1, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = jnp.concatenate([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], axis=-1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = jnp.concatenate(
            [self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], axis=-1
        )
        bp = self.branch_pool(_avg_pool_3x3_s1_pad1(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nnx.Module):
    """torchvision inception_v3, stem through Mixed_7c + global average pool
    (the FID "pool3" features). No aux head, no fc. Input: NHWC in [-1, 1]."""

    FEATURE_DIM = 2048

    def __init__(self, *, rngs: nnx.Rngs):
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, 3, stride=2, rngs=rngs)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, 3, rngs=rngs)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, 3, padding=1, rngs=rngs)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, 1, rngs=rngs)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, 3, rngs=rngs)
        self.Mixed_5b = InceptionA(192, 32, rngs=rngs)
        self.Mixed_5c = InceptionA(256, 64, rngs=rngs)
        self.Mixed_5d = InceptionA(288, 64, rngs=rngs)
        self.Mixed_6a = InceptionB(288, rngs=rngs)
        self.Mixed_6b = InceptionC(768, 128, rngs=rngs)
        self.Mixed_6c = InceptionC(768, 160, rngs=rngs)
        self.Mixed_6d = InceptionC(768, 160, rngs=rngs)
        self.Mixed_6e = InceptionC(768, 192, rngs=rngs)
        self.Mixed_7a = InceptionD(768, rngs=rngs)
        self.Mixed_7b = InceptionE(1280, rngs=rngs)
        self.Mixed_7c = InceptionE(2048, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        """(b, H, W, 3) in [-1, 1] -> (b, 2048) pool3 features."""
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = _max_pool_3x3_s2(x)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = _max_pool_3x3_s2(x)
        x = self.Mixed_5b(x)
        x = self.Mixed_5c(x)
        x = self.Mixed_5d(x)
        x = self.Mixed_6a(x)
        x = self.Mixed_6b(x)
        x = self.Mixed_6c(x)
        x = self.Mixed_6d(x)
        x = self.Mixed_6e(x)
        x = self.Mixed_7a(x)
        x = self.Mixed_7b(x)
        x = self.Mixed_7c(x)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> (b, 2048)
