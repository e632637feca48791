"""Edit / inpaint / outpaint an image with a trained MaskGit (optionally the
full cascade): regenerate only the masked region under a prompt, keeping
every other token of the source image. The mask is a grayscale PNG the size
of the input image — white (>127) pixels are REgenerated, black kept.

    python examples/edit_image.py "a red balloon" \
        --image photo.png --mask region.png \
        --base-checkpoint base.ckpt [--superres-checkpoint sr.ckpt]
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo-root run without install

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("prompt")
    p.add_argument("--image", required=True, help="source image (png/jpg)")
    p.add_argument("--mask", required=True, help="grayscale mask png, white = regenerate")
    p.add_argument("--base-checkpoint", required=True)
    p.add_argument("--superres-checkpoint", default=None)
    p.add_argument("--vae-dim", type=int, default=256)
    p.add_argument("--codebook-size", type=int, default=65536)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--t5-name", default="google/t5-v1_1-base")
    p.add_argument("--timesteps", type=int, default=18)
    p.add_argument("--cond-scale", type=float, default=3.0)
    p.add_argument(
        "--cond-scale-end", type=float, default=None,
        help="ramp guidance linearly from --cond-scale to this across steps",
    )
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="edited.png")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from examples.sample import load_maskgit
    from muse_maskgit_pytorch_tpu import Muse

    size = 512 if args.superres_checkpoint else 256
    src = Image.open(args.image).convert("RGB").resize((size, size))
    images = jnp.asarray(np.asarray(src, np.float32) / 255.0)[None]
    mask_img = Image.open(args.mask).convert("L").resize((size, size), Image.NEAREST)
    edit_mask = jnp.asarray(np.asarray(mask_img) > 127)[None]

    cond_scale = (
        (args.cond_scale, args.cond_scale_end)
        if args.cond_scale_end is not None
        else args.cond_scale
    )
    rng = jax.random.PRNGKey(args.seed)

    base = load_maskgit(
        args.base_checkpoint, args.vae_dim, args.codebook_size, 256, args.dim,
        args.depth, args.t5_name,
    )
    if args.superres_checkpoint:
        sr = load_maskgit(
            args.superres_checkpoint, args.vae_dim, args.codebook_size, 512,
            args.dim, args.depth, args.t5_name, cond_image_size=256,
        )
        out = Muse(base, sr).edit(
            images, edit_mask, [args.prompt], rng=rng,
            cond_scale=cond_scale, temperature=args.temperature,
            timesteps=args.timesteps,
        )
        out[0].save(args.out)
    else:
        out = base.edit(
            images, edit_mask, texts=[args.prompt], rng=rng,
            cond_scale=cond_scale, temperature=args.temperature,
            timesteps=args.timesteps,
        )
        arr = np.asarray(jnp.clip(out[0], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
