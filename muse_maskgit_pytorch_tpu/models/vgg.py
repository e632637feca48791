"""VGG16 perceptual feature extractor (configuration D).

In-framework replacement for the reference's `torchvision.models.vgg16`
perceptual tower (`/root/reference/muse_maskgit_pytorch/vqgan_vae.py:377-385`):
the classifier is truncated by its last two modules (`classifier[:-2]`), so
the output is the post-ReLU 4096-d fc2 feature. The reference feeds raw [0,1]
images with NO ImageNet normalization (vqgan_vae.py:502-511) — replicated
here.

Layout is NHWC. Pretrained torchvision weights can be injected with
`muse_maskgit_pytorch_tpu.utils.convert.load_torchvision_vgg16` (the flatten
between features and classifier follows torch's CHW ordering so converted
weights line up); with no weights available (zero-egress environments) the
tower is random-init — still a valid perceptual metric for smoke tests, and
documented as such.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

Array = jax.Array

# configuration "D": conv widths with 'M' = 2x2 maxpool
VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M")


def max_pool_2x2(x: Array) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def adaptive_avg_pool(x: Array, out_hw: int = 7) -> Array:
    """torch F.adaptive_avg_pool2d semantics: output cell (i, j) averages
    input rows floor(i*H/o) .. ceil((i+1)*H/o). Static python loop (49 cells);
    handles inputs smaller or larger than the output grid."""
    b, h, w, c = x.shape
    rows = []
    for i in range(out_hw):
        r0, r1 = (i * h) // out_hw, -(-((i + 1) * h) // out_hw)
        cols = []
        for j in range(out_hw):
            c0, c1 = (j * w) // out_hw, -(-((j + 1) * w) // out_hw)
            cols.append(jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (b, out, out, c)


class VGG16(nnx.Module):
    def __init__(self, *, dtype=None, rngs: nnx.Rngs):
        # dtype = compute dtype (params stay f32): bf16 halves the perceptual
        # tower's HBM traffic inside the GAN step
        convs = []
        in_ch = 3
        for v in VGG16_CFG:
            if v == "M":
                continue
            convs.append(
                nnx.Conv(in_ch, v, (3, 3), padding=1, dtype=dtype, rngs=rngs)
            )
            in_ch = v
        self.convs = nnx.List(convs)
        self.fc1 = nnx.Linear(512 * 7 * 7, 4096, dtype=dtype, rngs=rngs)
        self.fc2 = nnx.Linear(4096, 4096, dtype=dtype, rngs=rngs)

    def features(self, x: Array) -> Array:
        ci = 0
        for v in VGG16_CFG:
            if v == "M":
                # tiny test images can shrink to 1x1 before the last pools;
                # a 2x2 VALID pool would emit an empty map (NaN means) — skip
                if x.shape[1] >= 2 and x.shape[2] >= 2:
                    x = max_pool_2x2(x)
            else:
                x = jax.nn.relu(self.convs[ci](x))
                ci += 1
        return x

    def __call__(self, x: Array) -> Array:
        """x: (b, h, w, 3) in [0, 1] -> (b, 4096) post-ReLU fc2 features."""
        x = self.features(x)
        x = adaptive_avg_pool(x, 7)
        # flatten in torch's CHW order so converted torchvision fc weights match
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = jax.nn.relu(self.fc1(x))
        x = jax.nn.relu(self.fc2(x))
        return x
