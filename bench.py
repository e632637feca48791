"""Benchmark harness — runs on real TPU hardware.

Headline metric (BASELINE.json): images/sec/chip for 256px base MaskGit
sampling (18 decode steps, CFG cond_scale 3 → doubled-batch forwards) at the
reference-recommended scale (transformer dim 512 / depth 8 / seq 256 / vocab
65536, VAE dim 256 / 4 layers — reference README.md:29-70). Also measures VQ
encode / decode ms/image and the full text→512px two-stage cascade (the
literal north-star config). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
vs_baseline is against the north-star target of 4 images/sec/chip.
"""

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def retry_compile(fn, attempts=4, wait=45):
    """The tunnel's remote-compile service intermittently 500s under load
    (r3: 'tpu_compile_helper subprocess exit code 1' on programs that
    compiled fine an hour earlier). Retry the first (compiling) call a few
    times with a pause so one server hiccup doesn't sink the whole bench."""
    import time as _time

    for i in range(attempts):
        try:
            return fn()
        except Exception as e:
            if "remote_compile" not in repr(e) or i == attempts - 1:
                raise
            log(f"remote compile failed (attempt {i + 1}/{attempts}): retrying in {wait}s")
            _time.sleep(wait)


def main():
    import jax

    # persistent compile cache: the full generate scan's first compile can
    # take minutes over the tunnel; cache hits make repeat runs (driver
    # re-benches every round) near-instant. Harmless if the backend declines.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:
        log(f"compilation cache unavailable: {e}")

    import jax.numpy as jnp
    from flax import nnx

    from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit, _generate_jit
    from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer
    from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    batch = 32  # r2 knee: 46.7 img/s at b16, 58 at b32, 46.6 at b64
    timesteps = 18
    image_size = 256
    dtype = jnp.bfloat16

    log("building models...")
    # dim 256 is the reference-recommended VAE scale (README.md:29). It is
    # benchmarkable over the tunnel ONLY with params as jit arguments —
    # closing over the module in jax.jit embeds 325M params as HLO constants
    # and trips the tunnel's compile-request cap (r1's HTTP 413).
    vae = VQGanVAE(
        dim=256,
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
    imgs = retry_compile(lambda: run(rng))
    checksum = float(imgs.sum())  # device->host fetch: the only honest barrier
    # warm the accumulator-chain programs (scalar add on the sum's dtype)
    # OUTSIDE the window: a first-time remote compile of even a trivial eager
    # op can take minutes on a bad-weather tunnel day (CLAUDE.md)
    _ = float(jnp.float32(0.0) + imgs.sum())
    log(f"first call (compile+run): {time.perf_counter() - t0:.1f}s; out {imgs.shape}")

    # timed runs — checksums accumulate ON DEVICE (each run's sum feeds the
    # accumulator, so no program can be skipped) and ONE final fetch closes
    # the window: lazy/async runtimes (tunneled PJRT) cannot report dispatch
    # time as wall time, and the tunnel's per-fetch RPC jitter (30-200 ms on
    # a bad-weather day) is paid once instead of once per run
    n_runs = 5
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(n_runs):
        imgs = run(jax.random.PRNGKey(i + 1))
        acc = acc + imgs.sum()
    checksum += float(acc)
    elapsed = time.perf_counter() - t0
    images_per_sec = batch * n_runs / elapsed
    log(f"{n_runs} runs of batch {batch} in {elapsed:.2f}s -> {images_per_sec:.2f} img/s/chip (checksum {checksum:.1f})")

    # secondary: VQ encode/decode ms per image (params as jit args, see above)
    img_batch = jax.random.uniform(jax.random.PRNGKey(3), (batch, image_size, image_size, 3))
    vae_graphdef, vae_state = nnx.split(maskgit.vae)

    @jax.jit
    def enc(state, img):
        return nnx.merge(vae_graphdef, state).encode(img, train=False)[1]

    ids = retry_compile(lambda: enc(vae_state, img_batch))
    _ = float(jnp.float32(0.0) + ids.sum())  # fetch + warm the acc chain
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(10):
        ids = enc(vae_state, img_batch)
        acc = acc + ids.sum()
    _ = float(acc)
    enc_ms = (time.perf_counter() - t0) / 10 / batch * 1000

    @jax.jit
    def dec(state, ids):
        return nnx.merge(vae_graphdef, state).decode_from_ids(ids)

    out = retry_compile(lambda: dec(vae_state, ids))
    _ = float(jnp.float32(0.0) + out.sum())  # fetch + warm the acc chain
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(10):
        out = dec(vae_state, ids)
        acc = acc + out.sum()
    _ = float(acc)
    dec_ms = (time.perf_counter() - t0) / 10 / batch * 1000
    log(f"VQ encode {enc_ms:.2f} ms/img, decode {dec_ms:.2f} ms/img")

    # -- analytic model-FLOPs MFU of the headline metric (VERDICT r2 item 5):
    # 18 CFG-doubled transformer forwards + compact logits head + ctx-KV
    # precompute + VAE decode, against the v5e bf16 peak. The VAE decode's
    # FLOPs come from XLA's own cost model of the compiled decoder.
    from muse_maskgit_pytorch_tpu.models.maskgit import _compact_segments
    from muse_maskgit_pytorch_tpu.utils.metrics import (
        V5E_BF16_PEAK_FLOPS,
        maskgit_generate_flops,
    )
    from muse_maskgit_pytorch_tpu.utils.sampling import cosine_schedule

    head_pos = []
    for s, e, kb in _compact_segments(cosine_schedule, 256, timesteps):
        head_pos += [min(kb, 256)] * (e - s)
    try:
        dec_flops = float(dec.lower(vae_state, ids).compile().cost_analysis()["flops"])
    except Exception as e:
        log(f"decoder cost_analysis unavailable ({e}); MFU excludes VAE decode")
        dec_flops = 0.0
    gen_flops = maskgit_generate_flops(
        batch=batch, timesteps=timesteps, seq_len=256, text_len=64,
        dim=512, depth=8, vocab=65536, cond_scale=3.0, self_cond=False,
        head_positions_per_step=head_pos, vae_decode_flops=dec_flops,
    )
    mfu_pct = 100.0 * gen_flops / (elapsed / n_runs) / V5E_BF16_PEAK_FLOPS
    log(
        f"model FLOPs/generate: {gen_flops / 1e12:.2f} TF (VAE decode "
        f"{dec_flops / 1e12:.2f} TF) -> MFU {mfu_pct:.1f}% of v5e bf16 peak"
    )

    # north-star configuration: full two-stage text->512px cascade
    # (base 256px -> super-res 512px conditioned on the clamped base output;
    # reference muse_maskgit_pytorch.py:745-791)
    log("building super-res stage (seq 1024)...")
    sr_transformer = MaskGitTransformer(
        num_tokens=65536,
        dim=512,
        seq_len=1024,
        depth=8,
        dim_head=64,
        heads=8,
        text_embed_dim=768,
        dtype=dtype,
        rngs=nnx.Rngs(1),
    )
    superres = MaskGit(
        image_size=512,
        cond_image_size=256,
        transformer=sr_transformer,
        vae=vae,
        cond_vae=vae,
    )
    # compact decode made the cascade batch-scalable (pre-compact it was flat
    # 9.5-9.7 img/s across b8-b16; with it: b8 10.5 -> b16 11.2)
    cas_batch = 16
    te_c, tm_c = text_embeds[:cas_batch], text_mask[:cas_batch]

    # the stages share one VAE, so the base stage's token grid conditions the
    # super-res decode DIRECTLY (Muse cond_via='ids'): skips the
    # decode->clip->re-encode pixel round trip — ~46 ms/batch16 and, more to
    # the point, encode(decode(ids)) is NOT the identity, so the ids path
    # hands the super-res stage the exact tokens the base stage chose
    # (bench_sweep.py sranatomy; pixels-path cascade: 12.0 img/s)
    def cascade(key):
        k1, k2 = jax.random.split(key)
        low_ids = maskgit.generate(
            text_embeds=te_c, text_mask=tm_c, rng=k1,
            timesteps=timesteps, cond_scale=3.0, return_ids=True,
        )
        return superres.generate(
            text_embeds=te_c, text_mask=tm_c, rng=k2, cond_token_ids=low_ids,
            timesteps=timesteps, cond_scale=3.0,
        )

    log("compiling cascade...")
    t0 = time.perf_counter()
    out = retry_compile(lambda: cascade(jax.random.PRNGKey(0)))
    checksum = float(out.sum())
    _ = float(jnp.float32(0.0) + out.sum())  # warm the acc chain pre-window
    log(f"cascade first call: {time.perf_counter() - t0:.1f}s; out {out.shape}")
    n_cas = 3
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(n_cas):
        out = cascade(jax.random.PRNGKey(i + 1))
        acc = acc + out.sum()  # device-side chain; one fetch closes the window
    checksum += float(acc)
    cas_elapsed = time.perf_counter() - t0
    cascade_img_s = cas_batch * n_cas / cas_elapsed
    log(f"{n_cas} cascade runs of batch {cas_batch} in {cas_elapsed:.2f}s -> {cascade_img_s:.2f} img/s/chip text->512px")

    # cascade MFU: base-stage + super-res-stage model FLOPs at cas_batch.
    # Super-res: seq 1024, cross-attn over text + 256 conditioning tokens
    # (the base stage's 16x16 token grid, passed as ids), 512px VAE decode.
    # Conv FLOPs scale linearly with batch and pixel area, so the 512px
    # decode is scaled from the measured 256px cost-model number (x4 area)
    # rather than paying another remote compile just for cost_analysis.
    # The ids conditioning path runs NO base-stage decode and NO cond
    # encode, so neither contributes FLOPs here (honest numerator).
    sr_head_pos = []
    for s, e, kb in _compact_segments(cosine_schedule, 1024, timesteps):
        sr_head_pos += [min(kb, 1024)] * (e - s)
    base16_flops = maskgit_generate_flops(
        batch=cas_batch, timesteps=timesteps, seq_len=256, text_len=64,
        dim=512, depth=8, vocab=65536, cond_scale=3.0, self_cond=False,
        head_positions_per_step=head_pos,
        vae_decode_flops=0.0,
    )
    sr_flops = maskgit_generate_flops(
        batch=cas_batch, timesteps=timesteps, seq_len=1024, text_len=64,
        dim=512, depth=8, vocab=65536, cond_scale=3.0, self_cond=False,
        cond_seq_len=256,
        head_positions_per_step=sr_head_pos,
        vae_decode_flops=4.0 * dec_flops * cas_batch / batch,
    )
    cas_flops = base16_flops + sr_flops
    cas_mfu_pct = 100.0 * cas_flops / (cas_elapsed / n_cas) / V5E_BF16_PEAK_FLOPS
    log(
        f"cascade model FLOPs/generate: {cas_flops / 1e12:.2f} TF "
        f"(base {base16_flops / 1e12:.2f} + superres {sr_flops / 1e12:.2f}) "
        f"-> cascade MFU {cas_mfu_pct:.1f}%"
    )

    result = {
        "metric": "images/sec/chip, 256px base MaskGit sampling (18 steps, CFG 3)",
        "value": round(images_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / 4.0, 3),
        "extra": {
            "backend": backend,
            "batch": batch,
            "timesteps": timesteps,
            "vae_dim": 256,
            "vq_encode_ms_per_image": round(enc_ms, 3),
            "vq_decode_ms_per_image": round(dec_ms, 3),
            "mfu_pct": round(mfu_pct, 2),
            "model_tflops_per_generate": round(gen_flops / 1e12, 3),
            "cascade_text_to_512px_img_per_sec_chip": round(cascade_img_s, 3),
            "cascade_mfu_pct": round(cas_mfu_pct, 2),
            "cascade_model_tflops_per_generate": round(cas_flops / 1e12, 3),
            "cascade_batch": cas_batch,
            "cascade_cond_via": "ids",
            "cascade_vs_north_star_4imgs": round(cascade_img_s / 4.0, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
