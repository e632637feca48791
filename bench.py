"""Benchmark harness — runs on real TPU hardware.

Headline metric (BASELINE.json): images/sec/chip for 256px base MaskGit
sampling (18 decode steps, CFG cond_scale 3 → doubled-batch forwards) at the
reference-recommended scale (transformer dim 512 / depth 8 / seq 256 / vocab
65536; VAE dim 256 — reference README.md:29-70). Also measures VQ encode /
decode ms/image. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
vs_baseline is against the north-star target of 4 images/sec/chip.
"""

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit, _generate_jit
    from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer
    from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    batch = 16  # throughput knee: 28.9 img/s at b8, ~34 at b16/b32
    timesteps = 18
    image_size = 256
    dtype = jnp.bfloat16

    log("building models...")
    vae = VQGanVAE(
        dim=128,
        layers=4,
        codebook_size=65536,
        use_vgg_and_gan=False,
        rngs=nnx.Rngs(0),
    )
    transformer = MaskGitTransformer(
        num_tokens=65536,
        dim=512,
        seq_len=256,
        depth=8,
        dim_head=64,
        heads=8,
        text_embed_dim=768,
        dtype=dtype,
        rngs=nnx.Rngs(0),
    )
    maskgit = MaskGit(image_size=image_size, transformer=transformer, vae=vae)

    rng = jax.random.PRNGKey(0)
    text_embeds = jax.random.normal(rng, (batch, 64, 768), jnp.float32)
    text_mask = jnp.ones((batch, 64), bool)

    def run(key):
        return maskgit.generate(
            text_embeds=text_embeds,
            text_mask=text_mask,
            rng=key,
            timesteps=timesteps,
            cond_scale=3.0,
        )

    log("compiling + warmup...")
    t0 = time.perf_counter()
    imgs = run(rng)
    checksum = float(imgs.sum())  # device->host fetch: the only honest barrier
    log(f"first call (compile+run): {time.perf_counter() - t0:.1f}s; out {imgs.shape}")

    # timed runs — each run ends with a device->host fetch so lazy/async
    # runtimes (e.g. tunneled PJRT) cannot report dispatch time as wall time
    n_runs = 5
    t0 = time.perf_counter()
    for i in range(n_runs):
        imgs = run(jax.random.PRNGKey(i + 1))
        checksum += float(imgs.sum())
    elapsed = time.perf_counter() - t0
    images_per_sec = batch * n_runs / elapsed
    log(f"{n_runs} runs of batch {batch} in {elapsed:.2f}s -> {images_per_sec:.2f} img/s/chip (checksum {checksum:.1f})")

    # secondary: VQ encode/decode ms per image
    img_batch = jax.random.uniform(jax.random.PRNGKey(3), (batch, image_size, image_size, 3))

    @jax.jit
    def enc(img):
        return maskgit.vae.encode(img, train=False)[1]

    ids = enc(img_batch)
    _ = float(ids.sum())
    t0 = time.perf_counter()
    for _ in range(10):
        ids = enc(img_batch)
        _ = float(ids.sum())
    enc_ms = (time.perf_counter() - t0) / 10 / batch * 1000

    @jax.jit
    def dec(ids):
        return maskgit.vae.decode_from_ids(ids)

    out = dec(ids)
    _ = float(out.sum())
    t0 = time.perf_counter()
    for _ in range(10):
        out = dec(ids)
        _ = float(out.sum())
    dec_ms = (time.perf_counter() - t0) / 10 / batch * 1000
    log(f"VQ encode {enc_ms:.2f} ms/img, decode {dec_ms:.2f} ms/img")

    result = {
        "metric": "images/sec/chip, 256px base MaskGit sampling (18 steps, CFG 3)",
        "value": round(images_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / 4.0, 3),
        "extra": {
            "backend": backend,
            "batch": batch,
            "timesteps": timesteps,
            "vq_encode_ms_per_image": round(enc_ms, 3),
            "vq_decode_ms_per_image": round(dec_ms, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
