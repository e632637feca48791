"""Train a base or super-res MaskGit (the trainer the reference left as a
Todo — README.md:235). Captions come from `<image-stem>.txt` files next to
each image; images without a caption train with an empty prompt (pure CFG
null conditioning)."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo-root run without install

import argparse
from pathlib import Path

import numpy as np
from flax import nnx

from muse_maskgit_pytorch_tpu import MaskGit, MaskGitTrainer, MaskGitTransformer, VQGanVAE
from muse_maskgit_pytorch_tpu.training.data import DataLoader, ImageDataset, cycle


class CaptionedImageDataset(ImageDataset):
    def caption(self, index: int) -> str:
        txt = self.paths[index].with_suffix(".txt")
        return txt.read_text().strip() if txt.exists() else ""

    def __getitem__(self, index):
        return super().__getitem__(index), self.caption(index)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--folder", help="captioned image folder (images path)")
    p.add_argument(
        "--token-shards", nargs="+", default=None,
        help="pre-tokenized shard files from examples/tokenize_dataset.py "
             "(fast ids path via the native C++ loader; data stream resumes "
             "exactly with --resume)",
    )
    p.add_argument(
        "--shard-captions", action="store_true",
        help="join <shard>.captions sidecars for text conditioning "
             "(tokenize_dataset.py --captions)",
    )
    p.add_argument("--vae-checkpoint", required=True, help="msgpack from VQGanVAE.save")
    p.add_argument("--vae-dim", type=int, default=256)
    p.add_argument("--codebook-size", type=int, default=65536)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--cond-image-size", type=int, default=None, help="set for super-res stage")
    p.add_argument("--dim", type=int, default=512)
    p.add_argument("--depth", type=int, default=8)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--grad-accum-every", type=int, default=1)
    p.add_argument("--num-train-steps", type=int, default=100000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--lr-decay-steps", type=int, default=None,
                   help="cosine-decay the lr over this many steps after warmup")
    p.add_argument("--t5-name", default="google/t5-v1_1-base")
    p.add_argument("--self-token-critic", action="store_true")
    p.add_argument("--results-folder", default="./results-maskgit")
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--shard-state", action="store_true",
        help="FSDP/ZeRO: shard params + optimizer state + EMA over the mesh "
             "(per-chip state bytes divide by the device count)",
    )
    p.add_argument(
        "--async-checkpoints", action="store_true",
        help="checkpoint saves block only for the device->host copy and "
             "write to disk on a background thread",
    )
    p.add_argument(
        "--max-checkpoints", type=int, default=None,
        help="retain only the newest N train-state checkpoints",
    )
    p.add_argument(
        "--save-results-every", type=int, default=None,
        help="render a sample grid from --sample-texts every N steps",
    )
    p.add_argument(
        "--sample-texts", nargs="+", default=None,
        help="prompts for the periodic sample grid",
    )
    args = p.parse_args()
    assert args.folder or args.token_shards, "pass --folder or --token-shards"

    vae = VQGanVAE(dim=args.vae_dim, codebook_size=args.codebook_size, rngs=nnx.Rngs(0))
    vae.load(args.vae_checkpoint)

    fmap = vae.get_encoded_fmap_size(args.image_size)
    transformer = MaskGitTransformer(
        num_tokens=args.codebook_size,
        seq_len=fmap * fmap,
        dim=args.dim,
        depth=args.depth,
        t5_name=args.t5_name,
        rngs=nnx.Rngs(0),
    )
    maskgit = MaskGit(
        image_size=args.image_size,
        cond_image_size=args.cond_image_size,
        transformer=transformer,
        vae=vae,
        cond_vae=vae if args.cond_image_size else None,
        self_token_critic=args.self_token_critic,
        rngs=nnx.Rngs(0),
    )

    trainer = MaskGitTrainer(
        maskgit,
        num_train_steps=args.num_train_steps,
        batch_size=args.batch_size,
        lr=args.lr,
        warmup_steps=args.warmup_steps,
        lr_decay_steps=args.lr_decay_steps,
        grad_accum_every=args.grad_accum_every,
        results_folder=args.results_folder,
        shard_state=args.shard_state,
        auto_resume=args.resume,
        async_checkpoints=args.async_checkpoints,
        max_checkpoints=args.max_checkpoints,
        save_results_every=args.save_results_every,
        sample_texts=args.sample_texts,
    )

    if args.token_shards:
        trainer.train_from_shards(
            args.token_shards, use_captions=args.shard_captions
        )
        return

    ds = CaptionedImageDataset(args.folder, args.image_size)

    def batches():
        # DataLoader stacks (image, caption) pairs awkwardly; iterate manually
        import random

        idx = list(range(len(ds)))
        while True:
            random.shuffle(idx)
            for i in range(0, len(idx) - args.batch_size + 1, args.batch_size):
                chunk = idx[i : i + args.batch_size]
                imgs = np.stack([ds[j][0] for j in chunk])
                texts = [ds.caption(j) for j in chunk]
                yield imgs, texts

    trainer.train(batches())


if __name__ == "__main__":
    main()
