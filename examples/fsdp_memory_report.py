"""Reference-scale FSDP memory report (VERDICT r2 item 1 evidence).

Compiles (does NOT run) the VQGanVAETrainer GAN step over an 8-device mesh
at the reference VAE scale (dim 256, 256px — README.md:29) twice — replicated
state vs FSDP/ZeRO-sharded state — and prints `compiled.memory_analysis()`
per-device numbers. BASELINE.md r2 measured the replicated 5.8G state
(375M params + Adam + EMA) capping one v5e at micro-batch 4; sharded, the
per-chip state divides by the mesh axis.

Runs on 8 virtual CPU devices (compile-only; no TPU needed):
    python examples/fsdp_memory_report.py --dim 256 --image-size 256 --batch 8
"""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo-root run without install

import argparse
import sys


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dim", type=int, default=256, help="VAE base dim (reference: 256)")
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--batch", type=int, default=8, help="micro-batch per step")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--codebook", type=int, default=65536)
    p.add_argument("--real-vgg", action="store_true",
                   help="use the full VGG16 perceptual tower (slower compile)")
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.devices)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np
    from flax import nnx

    from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE
    from muse_maskgit_pytorch_tpu.parallel.mesh import create_mesh, sharded_state_bytes
    from muse_maskgit_pytorch_tpu.training.trainers import VQGanVAETrainer

    mesh = create_mesh(devices=jax.devices()[: args.devices])

    class _Synthetic:
        def __init__(self, n, size):
            self.data = np.zeros((n, size, size, 3), np.float32)

        def __len__(self):
            return len(self.data)

        def __getitem__(self, i):
            return self.data[i]

    class _TinyPerceptual(nnx.Module):
        # stand-in tower: state-size numbers change little (VGG16 is frozen,
        # no optimizer state) but CPU compile drops from ~hours to minutes;
        # pass --real-vgg for the exact reference configuration
        def __init__(self, *, rngs):
            self.conv1 = nnx.Conv(3, 8, (3, 3), strides=2, padding=1, rngs=rngs)
            self.fc = nnx.Linear(8, 16, rngs=rngs)

        def __call__(self, x):
            import jax

            x = jax.nn.relu(self.conv1(x))
            return jax.nn.relu(self.fc(jnp.mean(x, axis=(1, 2))))

    rows = {}
    for shard in (False, True):
        vae = VQGanVAE(
            dim=args.dim, layers=4, codebook_size=args.codebook,
            use_vgg_and_gan=True, rngs=nnx.Rngs(0),
        )
        if not args.real_vgg:
            vae.set_vgg(_TinyPerceptual(rngs=nnx.Rngs(1)))
        trainer = VQGanVAETrainer(
            vae,
            folder=None,
            dataset=_Synthetic(2 * args.batch, args.image_size),
            num_train_steps=1,
            batch_size=args.batch,
            image_size=args.image_size,
            mesh=mesh,
            shard_state=shard,
            use_ema=True,
            save_results_every=10**9,
            save_model_every=10**9,
            results_folder=f"/tmp/fsdp-mem-{shard}",
            valid_frac=0.0,
        )
        total, per_dev = sharded_state_bytes(trainer.state)
        imgs = jnp.zeros((1, args.batch, args.image_size, args.image_size, 3))
        from muse_maskgit_pytorch_tpu.training.trainers import _put_microbatched

        imgs = _put_microbatched(imgs, mesh)
        print(f"[{'sharded' if shard else 'replicated'}] compiling...",
              file=sys.stderr, flush=True)
        with mesh:
            compiled = trainer._train_step.lower(trainer.state, imgs, imgs).compile()
        ma = compiled.memory_analysis()
        rows[shard] = (total, per_dev, ma)
        print(
            f"[{'sharded' if shard else 'replicated'}] state {total / 1e9:.3f}G total, "
            f"{per_dev / 1e9:.3f}G per device | memory_analysis/device: "
            f"args {ma.argument_size_in_bytes / 1e9:.3f}G, "
            f"temps {ma.temp_size_in_bytes / 1e9:.3f}G, "
            f"output {ma.output_size_in_bytes / 1e9:.3f}G, "
            f"aliased {ma.alias_size_in_bytes / 1e9:.3f}G",
            flush=True,
        )
        del trainer, vae, compiled

    rep, sh = rows[False], rows[True]
    print(
        f"FSDP state reduction: {rep[1] / 1e9:.3f}G -> {sh[1] / 1e9:.3f}G per device "
        f"({rep[1] / max(sh[1], 1):.2f}x) over {dict(mesh.shape)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
