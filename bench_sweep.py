"""Perf exploration on real TPU (not the driver harness — see bench.py).

Sweeps batch size and attention impl for the 256px base sampling loop, and
measures the full two-stage text->512px cascade (the BASELINE.json north-star
configuration: >= 4 images/sec/chip). Generation runs the production
defaults, including the segmented compact decode (r2); pass compact=False to
`time_generate(..., compact=False)` to A/B the full-sequence path. Headline
numbers and the r2 sweep history live in BASELINE.md.
"""

import sys
import time

import jax
import jax.numpy as jnp
from flax import nnx

from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit
from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer
from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(seq_len, image_size, cond_image_size=None, vae=None, cond_vae=None, dtype=jnp.bfloat16):
    transformer = MaskGitTransformer(
        num_tokens=65536,
        dim=512,
        seq_len=seq_len,
        depth=8,
        dim_head=64,
        heads=8,
        text_embed_dim=768,
        dtype=dtype,
        rngs=nnx.Rngs(0),
    )
    return MaskGit(
        image_size=image_size,
        cond_image_size=cond_image_size,
        transformer=transformer,
        vae=vae,
        cond_vae=cond_vae,
    )


def time_generate(mg, batch, timesteps=18, attn_impl="auto", n_runs=5, **kw):
    te = jax.random.normal(jax.random.PRNGKey(0), (batch, 64, 768), jnp.float32)
    tm = jnp.ones((batch, 64), bool)

    def run(key):
        return mg.generate(
            text_embeds=te, text_mask=tm, rng=key, timesteps=timesteps,
            cond_scale=3.0, attn_impl=attn_impl, **kw,
        )

    out = run(jax.random.PRNGKey(9))
    checksum = float(out.sum())  # host fetch: honest barrier on lazy runtimes
    t0 = time.perf_counter()
    for i in range(n_runs):
        out = run(jax.random.PRNGKey(i))
        checksum += float(out.sum())
    dt = (time.perf_counter() - t0) / n_runs
    return batch / dt, dt


def main():
    vae = VQGanVAE(dim=128, layers=4, codebook_size=65536, use_vgg_and_gan=False, rngs=nnx.Rngs(0))

    log("== base 256px: batch sweep (flash attn)")
    base = build(256, 256, vae=vae)
    for batch in [8, 16, 32, 64]:
        ips, dt = time_generate(base, batch)
        log(f"  batch {batch:3d}: {ips:8.2f} img/s  ({dt*1000:.0f} ms/batch)")

    log("== base 256px: attention impl comparison at batch 32")
    for impl in ["flash", "xla"]:
        ips, dt = time_generate(base, 32, attn_impl=impl)
        log(f"  {impl:6s}: {ips:8.2f} img/s")

    log("== two-stage cascade text->512px (north star: >=4 img/s/chip)")
    sr = build(1024, 512, cond_image_size=256, vae=vae, cond_vae=vae)
    te = jax.random.normal(jax.random.PRNGKey(0), (8, 64, 768), jnp.float32)
    tm = jnp.ones((8, 64), bool)

    def cascade(key, batch):
        k1, k2 = jax.random.split(key)
        low = base.generate(text_embeds=te[:batch], text_mask=tm[:batch], rng=k1, timesteps=18, cond_scale=3.0)
        low = jnp.clip(low, 0, 1)
        return sr.generate(
            text_embeds=te[:batch], text_mask=tm[:batch], rng=k2,
            cond_images=low, timesteps=18, cond_scale=3.0,
        )

    for batch in [8]:
        out = cascade(jax.random.PRNGKey(0), batch)
        checksum = float(out.sum())
        t0 = time.perf_counter()
        n = 3
        for i in range(n):
            out = cascade(jax.random.PRNGKey(i), batch)
            checksum += float(out.sum())
        dt = (time.perf_counter() - t0) / n
        log(f"  batch {batch}: {batch/dt:.2f} img/s two-stage 512px ({dt:.2f} s/batch)")


if __name__ == "__main__":
    main()
