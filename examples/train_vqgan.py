"""Train the VQ-GAN VAE image tokenizer (reference README.md:19-56 workflow)."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo-root run without install

import argparse

from flax import nnx

from muse_maskgit_pytorch_tpu import VQGanVAE, VQGanVAETrainer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--folder", required=True, help="image folder (recursive jpg/jpeg/png)")
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--codebook-size", type=int, default=65536)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--grad-accum-every", type=int, default=8)
    p.add_argument("--num-train-steps", type=int, default=50000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--warmup-steps", type=int, default=0)
    p.add_argument("--lr-decay-steps", type=int, default=None,
                   help="cosine-decay the lr over this many steps after warmup")
    p.add_argument("--results-folder", default="./results")
    p.add_argument("--use-ema-vq", action="store_true", help="EMA vector quantizer instead of LFQ")
    p.add_argument(
        "--fsq-levels", type=int, nargs="+", default=None,
        help="FSQ quantizer levels, e.g. 8 8 8 5 5 5 (codebook = product)",
    )
    p.add_argument(
        "--bf16-vgg", action="store_true",
        help="bf16 compute in the VGG perceptual tower (+5%% GAN step, "
        "BASELINE.md; losses stay f32)",
    )
    p.add_argument(
        "--bf16", action="store_true",
        help="bf16-compute enc/dec with f32 master weights (the reference's "
             "generator-step autocast, trainers.py:315); discr/VGG/losses stay f32",
    )
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
        "--no-random-flip", action="store_true",
        help="disable the RandomHorizontalFlip augmentation (measured -8 dB "
             "held-out recon PSNR on edge-sharp synthetic data, BASELINE.md r5)",
    )
    args = p.parse_args()

    import jax.numpy as jnp

    vae = VQGanVAE(
        dim=args.dim,
        codebook_size=args.codebook_size,
        lookup_free_quantization=not args.use_ema_vq,
        fsq_levels=tuple(args.fsq_levels) if args.fsq_levels else None,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        vgg_dtype=jnp.bfloat16 if args.bf16_vgg else None,
        rngs=nnx.Rngs(0),
    )

    trainer = VQGanVAETrainer(
        vae,
        folder=args.folder,
        num_train_steps=args.num_train_steps,
        batch_size=args.batch_size,
        image_size=args.image_size,
        lr=args.lr,
        warmup_steps=args.warmup_steps,
        lr_decay_steps=args.lr_decay_steps,
        grad_accum_every=args.grad_accum_every,
        results_folder=args.results_folder,
        use_ema=True,
        shard_state=args.shard_state,
        auto_resume=args.resume,
        async_checkpoints=args.async_checkpoints,
        max_checkpoints=args.max_checkpoints,
        random_flip=not args.no_random_flip,
    )
    trainer.train()


if __name__ == "__main__":
    main()
