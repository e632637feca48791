"""End-to-end smoke demo: train a tiny VQ-GAN + MaskGit on synthetic data,
then sample text->image. Runs in a few minutes on one chip (or CPU with
--cpu). This is the README's full workflow in miniature.
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo-root run without install

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--vae-steps", type=int, default=30)
    p.add_argument("--maskgit-steps", type=int, default=30)
    p.add_argument("--out", default="smoke_samples.png")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from muse_maskgit_pytorch_tpu import (
        MaskGit,
        MaskGitTrainer,
        MaskGitTransformer,
        VQGanVAE,
        VQGanVAETrainer,
    )
    from muse_maskgit_pytorch_tpu.models import t5 as t5mod
    from muse_maskgit_pytorch_tpu.models.t5 import T5Config
    from muse_maskgit_pytorch_tpu.training.data import make_grid, save_image

    # tiny offline text encoder (random weights + byte tokenizer)
    name = "smoke/tiny-t5"
    if name not in t5mod.T5_CONFIGS:
        t5mod.T5_CONFIGS[name] = T5Config(32, 64, 2, 16, 2, True)

    # synthetic dataset: colored gradients
    rng = np.random.default_rng(0)
    size, n = 32, 64
    xs = np.linspace(0, 1, size)
    data = []
    captions = []
    for i in range(n):
        gx, gy = rng.uniform(0.2, 1, 2)
        mx, my = np.meshgrid(xs * gx, xs * gy, indexing="ij")
        c = rng.uniform()
        data.append(np.stack([mx, my, np.full((size, size), c)], -1))
        captions.append(f"gradient {i % 4}")
    data = np.stack(data).astype(np.float32)

    class DS:
        def __len__(self):
            return n

        def __getitem__(self, i):
            return data[i]

    print("== training tiny VQ-GAN VAE")
    vae = VQGanVAE(dim=32, layers=2, codebook_size=256, use_vgg_and_gan=False, rngs=nnx.Rngs(0))
    vae_trainer = VQGanVAETrainer(
        vae,
        folder=None,
        dataset=DS(),
        num_train_steps=args.vae_steps,
        batch_size=8,
        image_size=size,
        lr=2e-3,
        valid_frac=0.0,
        use_ema=False,
        save_results_every=10**9,
        save_model_every=10**9,
        results_folder="/tmp/smoke-vae",
    )
    t0 = time.perf_counter()
    vae_trainer.train()
    print(f"   {args.vae_steps} steps in {time.perf_counter()-t0:.1f}s")
    trained_vae = vae_trainer.vae_module()

    print("== training tiny MaskGit")
    fmap = trained_vae.get_encoded_fmap_size(size)
    transformer = MaskGitTransformer(
        num_tokens=256, dim=64, seq_len=fmap * fmap, depth=2, dim_head=16,
        heads=4, t5_name=name, rngs=nnx.Rngs(0),
    )
    maskgit = MaskGit(image_size=size, transformer=transformer, vae=trained_vae)
    mg_trainer = MaskGitTrainer(
        maskgit,
        num_train_steps=args.maskgit_steps,
        batch_size=8,
        lr=1e-3,
        results_folder="/tmp/smoke-mg",
        save_model_every=10**9,
        use_ema=False,
    )

    def batches():
        while True:
            idx = rng.integers(0, n, 8)
            yield data[idx], [captions[i] for i in idx]

    t0 = time.perf_counter()
    mg_trainer.train(batches())
    print(f"   {args.maskgit_steps} steps in {time.perf_counter()-t0:.1f}s")

    print("== sampling")
    trained = mg_trainer.maskgit_module()
    images = trained.generate(
        texts=["gradient 0", "gradient 1", "gradient 2", "gradient 3"],
        rng=jax.random.PRNGKey(0),
        timesteps=8,
        cond_scale=3.0,
    )
    grid = make_grid(np.clip(np.asarray(images), 0, 1), nrow=2)
    save_image(grid, args.out)
    print(f"saved {args.out}; pixel range [{float(images.min()):.2f}, {float(images.max()):.2f}]")


if __name__ == "__main__":
    main()
