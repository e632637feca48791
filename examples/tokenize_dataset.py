"""Pre-tokenize an image folder into binary token shards for large-scale
MaskGit training via the native C++ shard loader (native/shard_loader.cpp).

Encoding once and streaming int32 ids beats re-running the frozen VAE encoder
every epoch: a 256px image is 192 KB of pixels but only 1 KB of tokens.

Rectangular / aspect-bucketed datasets: `--image-size HxW` tokenizes every
image at one rectangular resolution; `--auto-bucket N` instead splits the
folder into N aspect-ratio buckets (quantiles of the folder's log-aspect
distribution, snapped to the VAE's downsampling divisor at ~constant area)
and writes per-bucket shards. Either way the shards carry v2 grid metadata
(fh, fw), so `MaskGitTrainer.train_from_shards` trains each bucket under the
correct resized positional grid — the training-side twin of rectangular
sampling (models/maskgit.py grid contract)."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo-root run without install

import argparse

import jax
import numpy as np
from flax import nnx

from muse_maskgit_pytorch_tpu import VQGanVAE
from muse_maskgit_pytorch_tpu.training.data import DataLoader, ImageDataset
from muse_maskgit_pytorch_tpu.training.shard_loader import write_shard


def parse_size(s: str):
    """'256' -> (256, 256); '256x192' -> (256, 192) as (H, W)."""
    if "x" in s:
        h, w = s.lower().split("x")
        return int(h), int(w)
    return int(s), int(s)


def pick_buckets(paths, base_hw, n_buckets, divisor):
    """N bucket shapes from the folder's aspect distribution: quantile
    log-aspects, snapped to `divisor` multiples at ~the base area."""
    from PIL import Image

    aspects = []
    for p in paths:
        with Image.open(p) as im:
            w, h = im.size
        aspects.append(np.log(h / w))
    qs = np.quantile(aspects, (np.arange(n_buckets) + 0.5) / n_buckets)
    area = base_hw[0] * base_hw[1]
    shapes = []
    for la in qs:
        a = np.exp(la)  # h/w
        h = divisor * max(1, round(np.sqrt(area * a) / divisor))
        w = divisor * max(1, round(np.sqrt(area / a) / divisor))
        if (h, w) not in shapes:
            shapes.append((h, w))
    return shapes, np.asarray(aspects)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--folder", required=True)
    p.add_argument("--vae-checkpoint", required=True)
    p.add_argument("--vae-dim", type=int, default=256)
    p.add_argument("--vae-layers", type=int, default=4)
    p.add_argument("--codebook-size", type=int, default=65536)
    p.add_argument(
        "--image-size", default="256",
        help="'S' (square) or 'HxW' (one rectangular resolution for the "
             "whole folder); with --auto-bucket this is the base area",
    )
    p.add_argument(
        "--auto-bucket", type=int, default=0, metavar="N",
        help="split the folder into N aspect-ratio buckets (per-bucket "
             "shards, shapes derived from the folder at ~image-size area)",
    )
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--shard-size", type=int, default=8192, help="sequences per shard")
    p.add_argument("--out-prefix", default="tokens/shard")
    p.add_argument(
        "--captions", action="store_true",
        help="also write <shard>.captions sidecars from <image-stem>.txt "
             "files (missing captions become empty prompts) for "
             "MaskGitTrainer.train_from_shards(use_captions=True)",
    )
    p.add_argument(
        "--cond-image-size", type=int, default=None,
        help="ALSO tokenize a downsized copy of each image and append its "
             "ids to the row ([target ids ++ cond ids]) — paired super-res "
             "shards for train_from_shards(cond_token_len=...); one shuffle "
             "stream keeps target and conditioning aligned by construction",
    )
    args = p.parse_args()

    vae = VQGanVAE(
        dim=args.vae_dim, layers=args.vae_layers, codebook_size=args.codebook_size,
        use_vgg_and_gan=False, rngs=nnx.Rngs(0),
    )
    vae.load(args.vae_checkpoint)
    div = vae.dim_divisor

    @jax.jit
    def encode(imgs):
        return vae.encode(imgs, train=False)[1]

    @jax.jit
    def encode_cond(imgs):
        low = jax.image.resize(
            imgs,
            (imgs.shape[0], args.cond_image_size, args.cond_image_size, imgs.shape[-1]),
            method="nearest",  # the MaskGit auto-resize contract (B3 fix)
        )
        return vae.encode(low, train=False)[1]

    base_hw = parse_size(args.image_size)
    assert base_hw[0] % div == 0 and base_hw[1] % div == 0, (
        f"--image-size must be divisible by the VAE downsampling factor {div}"
    )

    from pathlib import Path

    Path(args.out_prefix).parent.mkdir(parents=True, exist_ok=True)

    probe = ImageDataset(args.folder, base_hw, random_flip=False)
    if args.auto_bucket > 1:
        shapes, aspects = pick_buckets(probe.paths, base_hw, args.auto_bucket, div)
        # each image joins the bucket with the nearest log-aspect
        las = np.log([h / w for h, w in shapes])
        assign = np.argmin(np.abs(aspects[:, None] - las[None, :]), axis=1)
        buckets = [
            (hw, [p for p, a in zip(probe.paths, assign) if a == bi])
            for bi, hw in enumerate(shapes)
        ]
        print("buckets:", [(f"{h}x{w}", len(ps)) for (h, w), ps in buckets])
    else:
        buckets = [(base_hw, probe.paths)]

    total = 0
    for (H, W), paths in buckets:
        if not paths:
            continue
        ds = ImageDataset(args.folder, (H, W), random_flip=False)
        ds.paths = paths  # restrict to this bucket's images
        dl = DataLoader(ds, args.batch_size, shuffle=False)
        grid = (H // div, W // div)
        tag = f"_{H}x{W}" if len(buckets) > 1 else ""

        def caption_for(i: int) -> str:
            txt = ds.paths[i].with_suffix(".txt")
            return txt.read_text().strip() if txt.exists() else ""

        def flush(buf, caps, shard_idx):
            write_shard(
                f"{args.out_prefix}{tag}_{shard_idx:05d}.bin",
                np.concatenate(buf),
                captions=caps if args.captions else None,
                grid=grid,
            )

        buf, caps, shard_idx, done = [], [], 0, 0
        for batch in dl:
            ids = np.asarray(encode(batch))  # (b, fh, fw)
            row = ids.reshape(ids.shape[0], -1).astype(np.int32)
            if args.cond_image_size:
                cond = np.asarray(encode_cond(batch))
                row = np.concatenate(
                    [row, cond.reshape(cond.shape[0], -1).astype(np.int32)], axis=1
                )
            buf.append(row)
            if args.captions:  # DataLoader is unshuffled: ds.paths order
                caps.extend(caption_for(done + j) for j in range(ids.shape[0]))
            done += ids.shape[0]
            if sum(b.shape[0] for b in buf) >= args.shard_size:
                flush(buf, caps, shard_idx)
                print(f"wrote shard{tag} {shard_idx} ({done} sequences in bucket)")
                buf, caps, shard_idx = [], [], shard_idx + 1
        if buf:
            flush(buf, caps, shard_idx)
        total += done
    print(f"done: {total} sequences")


if __name__ == "__main__":
    main()
