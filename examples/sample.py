"""Sample text->image with a trained base (and optionally super-res) MaskGit
— the reference README.md:159-219 usage, cascade included."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo-root run without install

import argparse

import jax
from flax import nnx

from muse_maskgit_pytorch_tpu import MaskGit, MaskGitTransformer, Muse, VQGanVAE
from muse_maskgit_pytorch_tpu.training.data import to_pil_images


def load_maskgit(ckpt, vae_dim, codebook_size, image_size, dim, depth, t5_name, cond_image_size=None):
    vae = VQGanVAE(dim=vae_dim, codebook_size=codebook_size, use_vgg_and_gan=False, rngs=nnx.Rngs(0))
    fmap = vae.get_encoded_fmap_size(image_size)
    transformer = MaskGitTransformer(
        num_tokens=codebook_size, seq_len=fmap * fmap, dim=dim, depth=depth,
        t5_name=t5_name, rngs=nnx.Rngs(0),
    )
    mg = MaskGit(
        image_size=image_size,
        cond_image_size=cond_image_size,
        transformer=transformer,
        vae=vae,
        cond_vae=vae if cond_image_size else None,
    )
    mg.load(ckpt)
    return mg


def _size(s):
    """Parse --image-size: '256' (square) or '192x256' ((h, w) rectangular)."""
    if "x" in s:
        h, w = s.split("x", 1)
        return (int(h), int(w))
    return int(s)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("prompts", nargs="+")
    p.add_argument("--base-checkpoint", required=True)
    p.add_argument("--superres-checkpoint", default=None)
    p.add_argument("--negative-prompt", default=None)
    p.add_argument("--vae-dim", type=int, default=256)
    p.add_argument("--codebook-size", type=int, default=65536)
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--t5-name", default="google/t5-v1_1-base")
    p.add_argument("--timesteps", type=int, default=18)
    p.add_argument("--cond-scale", type=float, default=3.0)
    p.add_argument(
        "--cond-scale-end", type=float, default=None,
        help="ramp guidance linearly from --cond-scale to this across steps "
        "(Muse paper guidance schedule)",
    )
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out-prefix", default="sample")
    p.add_argument(
        "--image-size", type=_size, default=None, metavar="N|HxW",
        help="generate at a non-native resolution — an int, or HxW for a "
        "non-square aspect ratio (positional grid is resized, must divide "
        "by the VAE factor; for the cascade this is the BASE resolution, "
        "super-res scales it by the trained ratio)",
    )
    args = p.parse_args()

    base = load_maskgit(
        args.base_checkpoint, args.vae_dim, args.codebook_size, 256, args.dim,
        args.depth, args.t5_name,
    )
    rng = jax.random.PRNGKey(args.seed)
    cond_scale = (
        (args.cond_scale, args.cond_scale_end)
        if args.cond_scale_end is not None
        else args.cond_scale
    )

    if args.superres_checkpoint:
        sr = load_maskgit(
            args.superres_checkpoint, args.vae_dim, args.codebook_size, 512,
            args.dim, args.depth, args.t5_name, cond_image_size=256,
        )
        muse = Muse(base, sr)
        images = muse(
            args.prompts, rng=rng, cond_scale=cond_scale,
            temperature=args.temperature, timesteps=args.timesteps,
            image_size=args.image_size,
        )
    else:
        raw = base.generate(
            texts=args.prompts,
            negative_texts=[args.negative_prompt] * len(args.prompts)
            if args.negative_prompt
            else None,
            rng=rng,
            cond_scale=cond_scale,
            temperature=args.temperature,
            timesteps=args.timesteps,
            image_size=args.image_size,
        )
        images = to_pil_images(raw)

    for i, img in enumerate(images):
        path = f"{args.out_prefix}_{i}.png"
        img.save(path)
        print(f"saved {path}")


if __name__ == "__main__":
    main()
