"""Pre-tokenize an image folder into binary token shards for large-scale
MaskGit training via the native C++ shard loader (native/shard_loader.cpp).

Encoding once and streaming int32 ids beats re-running the frozen VAE encoder
every epoch: a 256px image is 192 KB of pixels but only 1 KB of tokens."""

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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--folder", required=True)
    p.add_argument("--vae-checkpoint", required=True)
    p.add_argument("--vae-dim", type=int, default=256)
    p.add_argument("--codebook-size", type=int, default=65536)
    p.add_argument("--image-size", type=int, default=256)
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
        dim=args.vae_dim, codebook_size=args.codebook_size,
        use_vgg_and_gan=False, rngs=nnx.Rngs(0),
    )
    vae.load(args.vae_checkpoint)

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

    ds = ImageDataset(args.folder, args.image_size, random_flip=False)
    dl = DataLoader(ds, args.batch_size, shuffle=False)

    def caption_for(i: int) -> str:
        txt = ds.paths[i].with_suffix(".txt")
        return txt.read_text().strip() if txt.exists() else ""

    from pathlib import Path

    Path(args.out_prefix).parent.mkdir(parents=True, exist_ok=True)

    def flush(buf, caps, shard_idx):
        write_shard(
            f"{args.out_prefix}_{shard_idx:05d}.bin",
            np.concatenate(buf),
            captions=caps if args.captions else None,
        )

    buf, caps, shard_idx, total = [], [], 0, 0
    for batch in dl:
        ids = np.asarray(encode(batch))  # (b, f, f)
        row = ids.reshape(ids.shape[0], -1).astype(np.int32)
        if args.cond_image_size:
            cond = np.asarray(encode_cond(batch))
            row = np.concatenate(
                [row, cond.reshape(cond.shape[0], -1).astype(np.int32)], axis=1
            )
        buf.append(row)
        if args.captions:  # DataLoader is unshuffled: ds.paths order
            caps.extend(caption_for(total + j) for j in range(ids.shape[0]))
        total += ids.shape[0]
        if sum(b.shape[0] for b in buf) >= args.shard_size:
            flush(buf, caps, shard_idx)
            print(f"wrote shard {shard_idx} ({total} sequences so far)")
            buf, caps, shard_idx = [], [], shard_idx + 1
    if buf:
        flush(buf, caps, shard_idx)
    print(f"done: {total} sequences")


if __name__ == "__main__":
    main()
