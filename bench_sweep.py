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


def build(seq_len, image_size, cond_image_size=None, vae=None, cond_vae=None, dtype=jnp.bfloat16, **tkw):
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
        **tkw,
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

    cond_scale = kw.pop("cond_scale_override", 3.0)

    def run(key):
        return mg.generate(
            text_embeds=te, text_mask=tm, rng=key, timesteps=timesteps,
            cond_scale=cond_scale, attn_impl=attn_impl, **kw,
        )

    out = run(jax.random.PRNGKey(9))
    checksum = float(out.sum())  # host fetch: honest barrier on lazy runtimes
    t0 = time.perf_counter()
    for i in range(n_runs):
        out = run(jax.random.PRNGKey(i))
        checksum += float(out.sum())
    dt = (time.perf_counter() - t0) / n_runs
    return batch / dt, dt


def exp_residual():
    """Isolate the decode loop's NON-compute stages (VERDICT r2 item 4): the
    remask rank block, the scan/carry overhead, and the compact batch-scaling
    knee — each as its own jitted scan over 18 steps, timings ending in a
    device->host fetch. Run: python bench_sweep.py residual"""
    # NOTE r3: at T=18 the ~30 ms/call tunnel RPC floor swamps the block
    # cost (carry-only == RPC). T amplified 50x so device time dominates;
    # divide the printed number by AMP for the per-18-step cost.
    AMP = 50
    T = 18 * AMP
    for batch, seq, kb in [(32, 256, 256), (32, 256, 96), (16, 1024, 384)]:
        scores0 = jax.random.uniform(jax.random.PRNGKey(0), (batch, seq))
        ids0 = jnp.zeros((batch, seq), jnp.int32)
        pred = jax.random.randint(jax.random.PRNGKey(1), (batch, kb), 0, 65536)
        prob = jax.random.uniform(jax.random.PRNGKey(2), (batch, kb))

        @jax.jit
        def remask_block_scan(scores, ids):
            # exactly the compact body's rank plumbing: 2 argsorts, compare,
            # wheres, 2 gathers — chained through the carry to defeat DCE
            def step(carry, _):
                scores, ids = carry
                order = jnp.argsort(-scores, axis=-1, stable=True)
                ranks = jnp.argsort(order, axis=-1)
                remask = ranks < kb // 2
                x_in = jnp.where(remask, 65536, ids)
                rank_idx = jnp.minimum(ranks, kb - 1)
                pred_at = jnp.take_along_axis(pred, rank_idx, axis=1)
                prob_at = jnp.take_along_axis(prob, rank_idx, axis=1)
                ids = jnp.where(remask, pred_at, x_in)
                scores = jnp.where(remask, 1.0 - prob_at, -1e5)
                return (scores, ids), None

            return jax.lax.scan(step, (scores, ids), None, length=T)[0]

        @jax.jit
        def topk_variant_scan(scores, ids):
            # candidate variant AS SHIPPED in the compact body: lax.top_k for
            # the candidate set + one-hot placement via masked REDUCTIONS
            # (same ops as models/maskgit.py — not einsum: TPU f32 dots
            # default to bf16 MXU passes that would corrupt token ids)
            def step(carry, _):
                scores, ids = carry
                _, cand = jax.lax.top_k(scores, kb)  # (b, kb) desc, ties low-idx
                onehot = (
                    cand[:, :, None] == jnp.arange(seq)[None, None, :]
                )  # (b, kb, seq)
                sel = (jnp.arange(kb) < kb // 2)[None, :, None]
                remask = jnp.any(onehot & sel, axis=1)
                pred_at = jnp.sum(jnp.where(onehot, pred[:, :, None], 0), axis=1)
                prob_at = jnp.sum(jnp.where(onehot, prob[:, :, None], 0.0), axis=1)
                ids = jnp.where(remask, pred_at, ids)
                scores = jnp.where(remask, 1.0 - prob_at, -1e5)
                return (scores, ids), None

            return jax.lax.scan(step, (scores, ids), None, length=T)[0]

        @jax.jit
        def carry_only_scan(scores, ids):
            # floor: scan overhead + trivial carry touch, same shapes
            def step(carry, _):
                scores, ids = carry
                return (scores + 1.0, ids + 1), None

            return jax.lax.scan(step, (scores, ids), None, length=T)[0]

        for name, fn in [
            ("remask-block", remask_block_scan),
            ("topk+onehot ", topk_variant_scan),
            ("carry-only  ", carry_only_scan),
        ]:
            out = fn(scores0, ids0)
            _ = float(out[0].sum())
            t0 = time.perf_counter()
            n = 10
            for _i in range(n):
                out = fn(scores0, ids0)
                _ = float(out[0].sum())
            dt = (time.perf_counter() - t0) / n
            log(
                f"  b{batch} seq{seq} kb{kb} {name}: {dt*1e3/AMP:7.3f} ms "
                f"/ 18 steps (amortized over {AMP}x)"
            )


def exp_vae_dtype():
    """bf16 vs f32 VAE inference at the reference dim-256 scale: decode
    ms/img and end-to-end base generate. Run: python bench_sweep.py vae"""
    # persistent cache: dodges the tunnel's flaky remote_compile on repeats
    from muse_maskgit_pytorch_tpu.serving import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    # NOTE: a standalone jitted dim-256 f32 decoder deterministically 500s
    # in this tunnel's remote-compile helper (4/4 attempts, r3) while the
    # SAME decode compiles fine inside the generate program — so the A/B
    # runs through generate: (e2e with VAE) - (ids-only, no VAE) isolates
    # the decode stage, and the f32-vs-bf16 image diff uses the same seed
    # (identical token ids: the bf16 transformer is shared).
    outs = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        vae = VQGanVAE(
            dim=256, layers=4, codebook_size=65536, use_vgg_and_gan=False,
            dtype=dtype, rngs=nnx.Rngs(0),
        )
        base = build(256, 256, vae=vae, dtype=jnp.bfloat16)
        te = jax.random.normal(jax.random.PRNGKey(0), (32, 64, 768), jnp.float32)
        tm = jnp.ones((32, 64), bool)
        out = base.generate(
            text_embeds=te, text_mask=tm, rng=jax.random.PRNGKey(5),
            timesteps=18, cond_scale=3.0,
        )
        outs[jnp.dtype(dtype).name] = jnp.asarray(out, jnp.float32)
        ips, dt = time_generate(base, 32)
        log(f"  base generate w/ {jnp.dtype(dtype).name} VAE: {ips:.2f} img/s ({dt*1000:.0f} ms/batch)")
    mg0 = build(256, 256, vae=None)
    ips0, dt0 = time_generate(mg0, 32, return_ids=True, fmap_size=16)
    log(f"  ids-only (no VAE decode): {ips0:.2f} img/s ({dt0*1000:.0f} ms/batch)")
    diff = jnp.abs(outs["float32"] - outs["bfloat16"]).max()
    log(f"  max |f32 - bf16| pixel diff: {float(diff):.4f} (images in [0,1])")


def exp_bisect():
    """Sampler bisection rounds A/B: fewer rounds = coarser top-k threshold
    = faster VPU loop; checks token agreement vs the 10-round default.
    Run: python bench_sweep.py bisect"""
    import muse_maskgit_pytorch_tpu.ops.sampling_kernel as sk

    vae = VQGanVAE(dim=256, layers=4, codebook_size=65536, use_vgg_and_gan=False, rngs=nnx.Rngs(0))
    base = build(256, 256, vae=vae)
    te = jax.random.normal(jax.random.PRNGKey(0), (32, 64, 768), jnp.float32)
    tm = jnp.ones((32, 64), bool)
    from muse_maskgit_pytorch_tpu.models.maskgit import _generate_jit
    from muse_maskgit_pytorch_tpu.ops.sampling_kernel import fused_topk_gumbel_sample

    orig_iters = sk._BISECT_ITERS
    ref_ids = None
    for iters in (10, 9, 8):
        sk._BISECT_ITERS = iters
        # the constant is read at trace time and is NOT part of any jit key —
        # clear BOTH caches: the sampler is itself jitted, so clearing only
        # the outer _generate_jit leaves its cached 10-round jaxpr live
        # (r3 bug: an A/B without this line ran the same kernel in every arm)
        _generate_jit.clear_cache()
        fused_topk_gumbel_sample.clear_cache()
        ids = base.generate(
            text_embeds=te, text_mask=tm, rng=jax.random.PRNGKey(7),
            timesteps=18, cond_scale=3.0, return_ids=True,
        )
        ids.block_until_ready()
        t0 = time.perf_counter()
        n = 5
        for i in range(n):
            out = base.generate(
                text_embeds=te, text_mask=tm, rng=jax.random.PRNGKey(7),
                timesteps=18, cond_scale=3.0, return_ids=True,
            )
            _ = int(out.sum())
        dt = (time.perf_counter() - t0) / n
        if ref_ids is None:
            ref_ids = out
            agree = 1.0
        else:
            agree = float((out == ref_ids).mean())
        log(
            f"  bisect {iters} rounds: {32/dt:7.2f} img/s "
            f"(token agreement vs 10 rounds: {agree:.4f})"
        )
    sk._BISECT_ITERS = orig_iters
    _generate_jit.clear_cache()
    fused_topk_gumbel_sample.clear_cache()


def exp_ctx_cache():
    """A/B the r3 context-KV caching on the negative-prompt and
    critic-guided decode paths (VERDICT item 7 evidence). 'uncached' arms
    monkeypatch the precompute to return None so the per-step context
    rebuild of the r2 code runs. Run: python bench_sweep.py ctx"""
    from muse_maskgit_pytorch_tpu.models import transformer as tr_mod
    from muse_maskgit_pytorch_tpu.models.maskgit import _generate_jit
    from muse_maskgit_pytorch_tpu.models.transformer import TokenCritic

    vae = VQGanVAE(dim=256, layers=4, codebook_size=65536, use_vgg_and_gan=False, rngs=nnx.Rngs(0))
    batch = 16
    te = jax.random.normal(jax.random.PRNGKey(0), (batch, 64, 768), jnp.float32)
    tm = jnp.ones((batch, 64), bool)
    nte = jax.random.normal(jax.random.PRNGKey(1), (batch, 64, 768), jnp.float32)

    def timed(mg, **kw):
        def run(key):
            return mg.generate(
                text_embeds=te, text_mask=tm, rng=key, timesteps=18,
                cond_scale=3.0, **kw,
            )

        out = run(jax.random.PRNGKey(9))
        _ = float(out.sum())
        t0 = time.perf_counter()
        n = 4
        for i in range(n):
            out = run(jax.random.PRNGKey(i))
            _ = float(out.sum())
        return batch / ((time.perf_counter() - t0) / n)

    base = build(256, 256, vae=vae)
    orig_neg = tr_mod.Transformer.precompute_context_kv_neg

    def no_cache_neg(self, *, text_embeds, neg_text_embeds, text_mask=None,
                     neg_text_mask=None, conditioning_token_ids=None):
        _, pos, neg = orig_neg(
            self, text_embeds=text_embeds, neg_text_embeds=neg_text_embeds,
            text_mask=text_mask, neg_text_mask=neg_text_mask,
            conditioning_token_ids=conditioning_token_ids,
        )
        return None, pos, neg

    for label, patch in (("cached", None), ("uncached", no_cache_neg)):
        if patch:
            tr_mod.Transformer.precompute_context_kv_neg = patch
        _generate_jit.clear_cache()
        ips = timed(base, neg_text_embeds=nte)
        log(f"  neg-prompt generate, ctx-KV {label}: {ips:7.2f} img/s")
    tr_mod.Transformer.precompute_context_kv_neg = orig_neg

    # critic-guided sampling (full TokenCritic transformer per step)
    critic = TokenCritic(
        num_tokens=65536, dim=512, seq_len=256, depth=8, dim_head=64, heads=8,
        text_embed_dim=768, dtype=jnp.bfloat16, rngs=nnx.Rngs(2),
    )
    mg_c = build(256, 256, vae=vae)
    mg_c.token_critic = nnx.data(critic)
    _generate_jit.clear_cache()
    ips = timed(mg_c)
    log(f"  critic-guided generate (ctx-KV cached, r2 baseline 41.4): {ips:7.2f} img/s")


def exp_batch_knee():
    """Compact-decode batch scaling incl. the r2 b64 regression re-exam.
    Run: python bench_sweep.py knee"""
    vae = VQGanVAE(dim=256, layers=4, codebook_size=65536, use_vgg_and_gan=False, rngs=nnx.Rngs(0))
    base = build(256, 256, vae=vae)
    for batch in [16, 32, 48, 64]:
        ips, dt = time_generate(base, batch)
        log(f"  batch {batch:3d}: {ips:8.2f} img/s  ({dt*1000:.0f} ms/batch)")


def exp_varres():
    """Variable-resolution sampling at the reference scale: a model built
    for 256px (seq 256) generating 192px (seq 144) and 384px (seq 576) via
    positional-grid resize. Run: python bench_sweep.py varres"""
    from muse_maskgit_pytorch_tpu.serving import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    vae = VQGanVAE(
        dim=256, layers=4, codebook_size=65536, use_vgg_and_gan=False,
        dtype=jnp.bfloat16, rngs=nnx.Rngs(0),
    )
    base = build(256, 256, vae=vae)
    for image_size, batch in [(256, 32), (192, 32), (384, 16)]:
        kw = {} if image_size == 256 else {"image_size": image_size}
        ips, dt = time_generate(base, batch, **kw)
        seq = (image_size // 16) ** 2
        log(
            f"  {image_size}px (seq {seq:4d}) batch {batch}: "
            f"{ips:8.2f} img/s  ({dt*1000:.0f} ms/batch)"
        )
    # rectangular aspect ratios (anisotropic pos-grid resize; same scan)
    for (h, w), batch in [((192, 320), 32), ((320, 192), 32)]:
        ips, dt = time_generate(base, batch, image_size=(h, w))
        seq = (h // 16) * (w // 16)
        log(
            f"  {h}x{w}px (seq {seq:4d}) batch {batch}: "
            f"{ips:8.2f} img/s  ({dt*1000:.0f} ms/batch)"
        )



def exp_cfg_fold():
    """r4 headline lever: CFG combine folded into the embeddings before the
    bias-free vocab head (halves the head matmul rows AND the fused
    sampler's HBM read) vs the r3 structure (raw doubled logits, combine in
    the sampling kernel). Arms alternate in ONE process; BOTH the outer
    generate jit and the nested fused-sampler jit caches are left alone
    (different static cfg_fold values trace separately — no cache pollution,
    the r3 bisect post-mortem does not apply). Also drives the critic path
    (SelfCritic now skips the generator's vocab head entirely) and the
    per-row dynamic-scale program. Run: python bench_sweep.py cfgfold"""
    from muse_maskgit_pytorch_tpu.serving import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    vae = VQGanVAE(
        dim=256, layers=4, codebook_size=65536, use_vgg_and_gan=False,
        rngs=nnx.Rngs(0),
    )
    base = build(256, 256, vae=vae)
    log("== base 256px b32: cfg_fold A/B (interleaved, best of 3 each)")
    results = {True: [], False: []}
    for rep in range(2):
        for fold in (False, True):
            ips, dt = time_generate(base, 32, cfg_fold=fold, n_runs=3)
            results[fold].append(ips)
            log(f"  rep {rep} cfg_fold={fold}: {ips:8.2f} img/s ({dt*1000:.0f} ms/batch)")
    for fold in (False, True):
        log(f"  cfg_fold={fold}: best {max(results[fold]):.2f} img/s, all {[f'{x:.1f}' for x in results[fold]]}")

    log("== super-res stage (seq 1024) b16: cfg_fold A/B")
    sr = build(1024, 512, cond_image_size=256, vae=vae, cond_vae=vae)
    cond = jnp.zeros((16, 256, 256, 3), jnp.float32)
    for fold in (False, True):
        ips, dt = time_generate(sr, 16, cfg_fold=fold, n_runs=3, cond_images=cond)
        log(f"  cfg_fold={fold}: {ips:8.2f} img/s ({dt*1000:.0f} ms/batch)")

    log("== self-critic decode b16 (critic vocab-head skip rides cfg_fold commit)")
    base_sc = build(256, 256, vae=vae, self_cond=False)
    # SelfCritic shares the generator backbone
    from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit as _MG
    base_sc = _MG(
        image_size=256, transformer=base_sc.transformer, vae=vae,
        self_token_critic=True, rngs=nnx.Rngs(1),
    )
    ips, dt = time_generate(base_sc, 16, n_runs=3)
    log(f"  self-critic guided: {ips:8.2f} img/s ({dt*1000:.0f} ms/batch)")

    log("== per-row dynamic guidance b32 (serving per-request program)")
    scales = jnp.linspace(1.0, 6.0, 32)[None, :]
    ips, dt = time_generate(base, 32, cond_scale_override=scales, n_runs=3)
    log(f"  per-row traced scales: {ips:8.2f} img/s ({dt*1000:.0f} ms/batch)")



def exp_null_fold():
    """r4 trunk lever: the CFG null half's cross-attention is exactly the
    per-layer constant to_out(null_v) when no conditioning tokens are
    attendable (Attention.null_out), so null rows skip cross-attention
    entirely — q/out projections included. Interleaved in-process A/B at the
    headline config (different static null_fold values trace separately).
    Also drives the critic path (the critic's doubled forward folds too) and
    the per-row dynamic-scale serving program. Run:
    python bench_sweep.py nullfold"""
    from muse_maskgit_pytorch_tpu.serving import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    vae = VQGanVAE(
        dim=256, layers=4, codebook_size=65536, use_vgg_and_gan=False,
        rngs=nnx.Rngs(0),
    )
    base = build(256, 256, vae=vae)
    log("== base 256px b32: null_fold A/B (interleaved, best of 3 each)")
    results = {True: [], False: []}
    for rep in range(2):
        for fold in (False, True):
            ips, dt = time_generate(base, 32, null_fold=fold, n_runs=3)
            results[fold].append(ips)
            log(f"  rep {rep} null_fold={fold}: {ips:8.2f} img/s ({dt*1000:.0f} ms/batch)")
    for fold in (False, True):
        log(f"  null_fold={fold}: best {max(results[fold]):.2f} img/s, all {[f'{x:.1f}' for x in results[fold]]}")

    log("== self-critic decode b16: null_fold A/B (critic forward folds too)")
    from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit as _MG
    base_sc = _MG(
        image_size=256, transformer=base.transformer, vae=vae,
        self_token_critic=True, rngs=nnx.Rngs(1),
    )
    for fold in (False, True):
        ips, dt = time_generate(base_sc, 16, null_fold=fold, n_runs=3)
        log(f"  null_fold={fold}: {ips:8.2f} img/s ({dt*1000:.0f} ms/batch)")

    log("== per-row dynamic guidance b32: null_fold A/B (serving program)")
    scales = jnp.linspace(1.0, 6.0, 32)[None, :]
    for fold in (False, True):
        ips, dt = time_generate(
            base, 32, cond_scale_override=scales, null_fold=fold, n_runs=3
        )
        log(f"  null_fold={fold}: {ips:8.2f} img/s ({dt*1000:.0f} ms/batch)")


def exp_anatomy():
    """Post-fold decode anatomy at the headline config (b32, T=18, compact,
    fused sampler): what dominates now that the head matmul + sampler HBM
    read are halved? Stage isolation:
      * full vs return_ids=True  -> the VAE decode's share (both arms fetch
        only a device-side scalar checksum, so host transfer cancels);
      * T=18 vs T=1 (ids-only)   -> per-step cost (ctx precompute + compile
        fixtures cancel);
      * amortized in-process scans of the fused sampler and the bare vocab
        head at the production single-batch compact shapes.
    Run: python bench_sweep.py anatomy"""
    import functools

    from muse_maskgit_pytorch_tpu.ops.sampling_kernel import fused_topk_gumbel_sample
    from muse_maskgit_pytorch_tpu.serving import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    vae = VQGanVAE(dim=256, layers=4, codebook_size=65536, use_vgg_and_gan=False, rngs=nnx.Rngs(0))
    base = build(256, 256, vae=vae)
    batch = 32
    te = jax.random.normal(jax.random.PRNGKey(0), (batch, 64, 768), jnp.float32)
    tm = jnp.ones((batch, 64), bool)

    def timed(T, ids_only, n=5):
        def run(key):
            return base.generate(
                text_embeds=te, text_mask=tm, rng=key, timesteps=T,
                cond_scale=3.0, return_ids=ids_only,
            )
        out = run(jax.random.PRNGKey(9))
        cs = float(out.sum())
        t0 = time.perf_counter()
        for i in range(n):
            cs += float(run(jax.random.PRNGKey(i)).sum())
        return (time.perf_counter() - t0) / n * 1000  # ms

    full18 = timed(18, False)
    ids18 = timed(18, True)
    ids1 = timed(1, True)
    per_step = (ids18 - ids1) / 17
    log(f"  full T18: {full18:7.1f} ms/batch ({batch/ (full18/1000):.1f} img/s)")
    log(f"  ids  T18: {ids18:7.1f} ms  -> VAE decode share {full18 - ids18:6.1f} ms")
    log(f"  ids  T1 : {ids1:7.1f} ms  (ctx precompute + step0 + RPC floor)")
    log(f"  per decode step (steps 2..18): {per_step:6.2f} ms")

    # fused sampler at the production compact post-fold shape: single-batch
    # rows (the CFG pair is folded before the head). Average masked count
    # under the cosine schedule at seq/8 buckets ~ 0.35*seq; use the step-0
    # worst case AND the mid-schedule bucket.
    V = 65537
    for rows in (batch * 256, batch * 128):
        logits = jax.random.normal(jax.random.PRNGKey(0), (rows, V), jnp.bfloat16)

        @jax.jit
        def samp_scan(logits, seed):
            def body(c, i):
                ids, prob = fused_topk_gumbel_sample(
                    logits, 6554, jnp.float32(1.0), seed + i
                )
                return c + prob.sum() + ids.sum(), None
            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(20))
            return out
        _ = float(samp_scan(logits, jnp.int32(7)))
        t0 = time.perf_counter()
        _ = float(samp_scan(logits, jnp.int32(8)))
        dt = (time.perf_counter() - t0) / 20 * 1000
        log(f"  fused sampler ({rows} rows x {V}): {dt:6.2f} ms/step")

    # bare vocab head at the same shapes (bf16 MXU)
    W = jax.random.normal(jax.random.PRNGKey(1), (512, V), jnp.bfloat16)
    for rows in (batch * 256, batch * 128):
        e = jax.random.normal(jax.random.PRNGKey(2), (rows, 512), jnp.bfloat16)

        @jax.jit
        def head_scan(e, W):
            def body(c, _):
                y = e @ W
                return c + y.sum().astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(20))
            return out
        _ = float(head_scan(e, W))
        t0 = time.perf_counter()
        _ = float(head_scan(e, W))
        dt = (time.perf_counter() - t0) / 20 * 1000
        log(f"  vocab head ({rows} x 512 @ 512 x {V}): {dt:6.2f} ms/step")



def exp_superres_anatomy():
    """Cascade second-stage anatomy at the bench.py headline config (vae dim
    256, transformer dim 512 depth 8, b16, T=18): where does the super-res
    stage's time go, and how much of it is the cond-image PIXEL ROUND-TRIP
    (base ids -> 256px decode -> clip -> re-encode -> cond ids) that a
    shared-VAE cascade doesn't strictly need?  Stage isolation mirrors
    exp_anatomy: full-vs-ids for the 512px VAE decode share, T18-vs-T1 for
    the per-step cost, plus a cond_images-vs-cond_token_ids A/B (identical
    grids when both stages share the VAE: 256px/16 = 512px/16/2 = 16x16).
    Run: python bench_sweep.py sranatomy"""
    from muse_maskgit_pytorch_tpu.serving import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    vae = VQGanVAE(dim=256, layers=4, codebook_size=65536, use_vgg_and_gan=False, rngs=nnx.Rngs(0))
    base = build(256, 256, vae=vae)
    sr = build(1024, 512, cond_image_size=256, vae=vae, cond_vae=vae)
    batch = 16
    te = jax.random.normal(jax.random.PRNGKey(0), (batch, 64, 768), jnp.float32)
    tm = jnp.ones((batch, 64), bool)

    def fetch(x):
        return float(x.sum())

    # fixed base-stage output to feed the super-res arms (both forms)
    low_ids = base.generate(
        text_embeds=te, text_mask=tm, rng=jax.random.PRNGKey(9),
        timesteps=18, cond_scale=3.0, return_ids=True,
    )
    low_img = jnp.clip(base.vae.decode_from_ids(low_ids), 0.0, 1.0)
    fetch(low_img)

    def timed(fn, n=5):
        fetch(fn(jax.random.PRNGKey(99)))
        t0 = time.perf_counter()
        for i in range(n):
            fetch(fn(jax.random.PRNGKey(i)))
        return (time.perf_counter() - t0) / n * 1000

    # base stage alone (ids only vs full image): what the first stage costs
    base_ids = timed(lambda k: base.generate(
        text_embeds=te, text_mask=tm, rng=k, timesteps=18, cond_scale=3.0,
        return_ids=True))
    base_full = timed(lambda k: base.generate(
        text_embeds=te, text_mask=tm, rng=k, timesteps=18, cond_scale=3.0))
    log(f"  base stage  T18 ids : {base_ids:7.1f} ms/batch")
    log(f"  base stage  T18 full: {base_full:7.1f} ms  (256px VAE decode share {base_full - base_ids:5.1f} ms)")

    # super-res stage, cond_images path (the shipped cascade contract)
    def sr_gen(k, T, ids_only, **kw):
        return sr.generate(
            text_embeds=te, text_mask=tm, rng=k, timesteps=T,
            cond_scale=3.0, return_ids=ids_only, **kw)

    sr_full = timed(lambda k: sr_gen(k, 18, False, cond_images=low_img))
    sr_ids = timed(lambda k: sr_gen(k, 18, True, cond_images=low_img))
    sr_ids1 = timed(lambda k: sr_gen(k, 1, True, cond_images=low_img))
    per_step = (sr_ids - sr_ids1) / 17
    log(f"  superres    T18 full: {sr_full:7.1f} ms/batch ({batch / (sr_full / 1000):.2f} img/s)")
    log(f"  superres    T18 ids : {sr_ids:7.1f} ms  (512px VAE decode share {sr_full - sr_ids:5.1f} ms)")
    log(f"  superres    T1  ids : {sr_ids1:7.1f} ms  (cond encode + ctx precompute + step0 + RPC floor)")
    log(f"  per superres decode step (2..18): {per_step:6.2f} ms")

    # cond-token fast path: skip decode(ids)->clip->encode when the stages
    # share a VAE and the grids match (base 16x16 == superres cond 16x16)
    sr_ids_direct = timed(lambda k: sr_gen(k, 18, True, cond_token_ids=low_ids))
    sr_ids1_direct = timed(lambda k: sr_gen(k, 1, True, cond_token_ids=low_ids))
    log(f"  superres    T18 ids, cond_token_ids direct: {sr_ids_direct:7.1f} ms  (vs {sr_ids:7.1f})")
    log(f"  superres    T1  ids, cond_token_ids direct: {sr_ids1_direct:7.1f} ms  (vs {sr_ids1:7.1f})")

    # the round-trip itself, isolated (what the direct path deletes); jitted
    # as ONE program — eager would pay a ~30 ms tunnel RPC per op
    rt_fn = nnx.jit(
        lambda m, ids: m.encode(
            jnp.clip(m.decode_from_ids(ids), 0.0, 1.0), train=False
        )[1]
    )
    rt = timed(lambda k: rt_fn(vae, low_ids))
    log(f"  cond pixel round-trip (decode 256px + clip + encode), isolated: {rt:6.1f} ms/batch")

    # round-trip token fidelity: how many ids survive encode(decode(ids))?
    rt_ids = base.vae.encode(low_img, train=False)[1]
    agree = float(jnp.mean((rt_ids.reshape(batch, -1) == low_ids.reshape(batch, -1)).astype(jnp.float32)))
    log(f"  encode(decode(ids)) id agreement (random-init VAE): {agree:.3f}")

    # full cascade, both cond forms, end to end
    dec_fn = nnx.jit(lambda m, ids: jnp.clip(m.decode_from_ids(ids), 0.0, 1.0))

    def cas(form):
        def run(k):
            k1, k2 = jax.random.split(k)
            ids = base.generate(
                text_embeds=te, text_mask=tm, rng=k1, timesteps=18,
                cond_scale=3.0, return_ids=True)
            if form == "pixels":
                return sr_gen(k2, 18, False, cond_images=dec_fn(vae, ids))
            return sr_gen(k2, 18, False, cond_token_ids=ids)
        return run

    for form in ("pixels", "ids"):
        dt = timed(cas(form), n=3)
        log(f"  full cascade (cond via {form:6s}): {dt:7.1f} ms/batch ({batch / (dt / 1000):.2f} img/s)")


def exp_ln_dtype():
    """Probe: LayerNorm computes in f32 with casts (models/transformer.py) —
    if XLA materializes those intermediates, bf16 LN would halve that HBM
    traffic (~33 LN applications/step). Monkeypatch A/B in one process,
    clearing the generate jit cache between arms (the LN is not inside any
    nested jit). MEASUREMENT ONLY — changing LN dtype changes tokens, so a
    win would ship as an opt-in knob. Run: python bench_sweep.py lndtype"""
    import muse_maskgit_pytorch_tpu.models.transformer as T
    from muse_maskgit_pytorch_tpu.models.maskgit import _generate_jit
    from muse_maskgit_pytorch_tpu.serving import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    vae = VQGanVAE(dim=256, layers=4, codebook_size=65536, use_vgg_and_gan=False, rngs=nnx.Rngs(0))
    base = build(256, 256, vae=vae)

    orig = T.LayerNorm.__call__

    def ln_bf16(self, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        normed = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return normed * self.gamma[...].astype(x.dtype)

    for rep in range(2):
        for arm, fn in [("f32-LN", orig), ("bf16-LN", ln_bf16)]:
            T.LayerNorm.__call__ = fn
            _generate_jit.clear_cache()
            ips, dt = time_generate(base, 32, n_runs=3)
            log(f"  rep {rep} {arm}: {ips:8.2f} img/s ({dt*1000:.0f} ms/batch)")
    T.LayerNorm.__call__ = orig


def exp_train_mfu():
    """MaskGit train-step throughput + model-FLOPs MFU at reference scale
    (ids path, the r2 535 img/s configuration). Amortizes 20 donated steps
    per timing (dispatches pipeline; only the final loss fetch syncs).
    Run: python bench_sweep.py trainmfu"""
    from muse_maskgit_pytorch_tpu.training.trainers import MaskGitTrainer
    from muse_maskgit_pytorch_tpu.utils.metrics import (
        V5E_BF16_PEAK_FLOPS,
        maskgit_train_flops,
    )

    batch, seq, text_len = 64, 256, 64
    mg = build(seq, 256, self_cond=True)  # dim 512 / depth 8 / vocab 65536, no VAE (ids path)
    trainer = MaskGitTrainer(
        mg, num_train_steps=1, batch_size=batch, grad_accum_every=1,
        results_folder="/tmp/trainmfu", use_ema=True,
    )
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (1, batch, seq), 0, 65536, jnp.int32)
    te = jax.random.normal(key, (1, batch, text_len, 768), jnp.float32)
    tm = jnp.ones((1, batch, text_len), bool)

    state = trainer.state
    state, logs = trainer._train_step(state, ids, te, tm, None)  # compile
    float(logs["loss"])
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        state, logs = trainer._train_step(state, ids, te, tm, None)
    float(logs["loss"])  # single sync at the end: honest device-time amortization
    dt = (time.perf_counter() - t0) / n

    flops = maskgit_train_flops(
        batch=batch, seq_len=seq, text_len=text_len, dim=512, depth=8,
        vocab=65536, self_cond=True, self_cond_prob=0.9,
    )
    mfu = flops / dt / V5E_BF16_PEAK_FLOPS * 100
    log(
        f"  ids-path train step b{batch}: {dt*1e3:.1f} ms/step, "
        f"{batch/dt:.0f} img/s, {flops/1e12:.2f} TF/step (expected-value "
        f"incl. 0.9-prob self-cond fwd), train MFU {mfu:.1f}%"
    )
    # self-cond off: removes the lax.cond no-grad forward -> pure fwd+bwd MFU
    mg2 = build(seq, 256)  # self_cond=False
    trainer2 = MaskGitTrainer(
        mg2, num_train_steps=1, batch_size=batch, grad_accum_every=1,
        results_folder="/tmp/trainmfu2", use_ema=True,
    )
    state2 = trainer2.state
    state2, logs = trainer2._train_step(state2, ids, te, tm, None)
    float(logs["loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        state2, logs = trainer2._train_step(state2, ids, te, tm, None)
    float(logs["loss"])
    dt2 = (time.perf_counter() - t0) / n
    flops2 = maskgit_train_flops(
        batch=batch, seq_len=seq, text_len=text_len, dim=512, depth=8,
        vocab=65536, self_cond=False,
    )
    mfu2 = flops2 / dt2 / V5E_BF16_PEAK_FLOPS * 100
    log(
        f"  same w/o self-cond: {dt2*1e3:.1f} ms/step, {batch/dt2:.0f} img/s, "
        f"{flops2/1e12:.2f} TF/step, train MFU {mfu2:.1f}%"
    )


def exp_train_loss():
    """A/B the train-step CE implementation at reference scale (ids path,
    b64 / seq 256 / vocab 65536). The shipped `cross_entropy_ignore_index`
    materializes the FULL (b, n, V) f32 log_softmax output (~4.3 GB at this
    shape) only to gather one element per position; the fused arm computes
    `picked_logit - logsumexp(logits)` directly so the only (b, n, V)
    traffic is reading the bf16 logits into the reductions. Interleaved in
    ONE process, fresh trainer per timing (donation invalidates modules —
    CLAUDE.md), 20 amortized donated steps, single end fetch.
    Run: python bench_sweep.py trainloss"""
    import muse_maskgit_pytorch_tpu.models.transformer as T
    from muse_maskgit_pytorch_tpu.training.trainers import MaskGitTrainer
    from muse_maskgit_pytorch_tpu.utils.metrics import (
        V5E_BF16_PEAK_FLOPS,
        maskgit_train_flops,
    )

    batch, seq, text_len = 64, 256, 64
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (1, batch, seq), 0, 65536, jnp.int32)
    te = jax.random.normal(key, (1, batch, text_len, 768), jnp.float32)
    tm = jnp.ones((1, batch, text_len), bool)
    flops = maskgit_train_flops(
        batch=batch, seq_len=seq, text_len=text_len, dim=512, depth=8,
        vocab=65536, self_cond=False,
    )

    shipped = T.cross_entropy_ignore_index

    def fused_ce(logits, labels, ignore_index):
        lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
        valid = labels != ignore_index
        safe = jnp.where(valid, labels, 0)
        picked = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
        ll = picked.astype(jnp.float32) - lse
        denom = jnp.maximum(valid.sum(), 1)
        return -(ll * valid).sum() / denom

    def run_arm(ce_fn):
        T.cross_entropy_ignore_index = ce_fn
        mg = build(seq, 256)  # fresh module: the previous arm's step donated its buffers
        trainer = MaskGitTrainer(
            mg, num_train_steps=1, batch_size=batch, grad_accum_every=1,
            results_folder="/tmp/trainloss", use_ema=True,
        )
        state = trainer.state
        state, logs = trainer._train_step(state, ids, te, tm, None)  # compile
        loss0 = float(logs["loss"])
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            state, logs = trainer._train_step(state, ids, te, tm, None)
        float(logs["loss"])
        dt = (time.perf_counter() - t0) / n
        return dt, loss0

    try:
        for rep in range(2):
            for name, fn in [("shipped", shipped), ("fused", fused_ce)]:
                dt, loss0 = run_arm(fn)
                mfu = flops / dt / V5E_BF16_PEAK_FLOPS * 100
                log(
                    f"  rep {rep} {name:8s}: {dt*1e3:6.1f} ms/step, "
                    f"{batch/dt:4.0f} img/s, train MFU {mfu:.1f}%  "
                    f"(step-0 loss {loss0:.6f})"
                )
    finally:
        T.cross_entropy_ignore_index = shipped


def exp_gan_step():
    """Reference-scale VQ-GAN GAN train step, f32 vs bf16-compute encdec.
    bf16 here IS the reference's mixed-precision semantics (autocast wraps
    only the generator step, trainers.py:315): the enc/dec computes in bf16
    with f32 master weights while the discriminator/VGG/losses stay f32.
    Both arms in one process (tunnel A/B rule), 10 donated steps amortized.
    Run: python bench_sweep.py ganstep"""
    import gc

    import numpy as np

    from muse_maskgit_pytorch_tpu.training.trainers import VQGanVAETrainer

    class _DS:
        def __init__(self, n, size):
            rng = np.random.default_rng(0)
            self.d = rng.uniform(size=(n, size, size, 3)).astype(np.float32)

        def __len__(self):
            return len(self.d)

        def __getitem__(self, i):
            return self.d[i]

    imgs_np = np.random.default_rng(1).uniform(size=(8, 256, 256, 3)).astype(np.float32)

    def arm(dtype, micro, n=10, vgg_dtype=None, discr_dtype=None):
        vae = VQGanVAE(
            dim=256, layers=4, codebook_size=65536, use_vgg_and_gan=True,
            dtype=dtype, vgg_dtype=vgg_dtype, discr_dtype=discr_dtype,
            rngs=nnx.Rngs(0),
        )
        tr = VQGanVAETrainer(
            vae, folder=None, dataset=_DS(8, 256), num_train_steps=1,
            batch_size=micro, image_size=256, grad_accum_every=1,
            save_results_every=10**9, save_model_every=10**9,
            results_folder="/tmp/ganstep", valid_frac=0.25, use_ema=True,
        )
        imgs = jnp.asarray(imgs_np[:micro][None])  # (accum=1, B, H, W, C)
        state = tr.state
        try:
            state, logs = tr._train_step(state, imgs, imgs)  # compile + warm
            float(logs["loss"])
            t0 = time.perf_counter()
            for _ in range(n):
                state, logs = tr._train_step(state, imgs, imgs)
            float(logs["loss"])  # single fetch: honest device-time amortization
            dt = (time.perf_counter() - t0) / n
            tag = jnp.dtype(dtype).name + (
                "+vgg_bf16" if vgg_dtype is not None else ""
            ) + ("+discr_bf16" if discr_dtype is not None else "")
            log(
                f"  {tag} micro-batch {micro}: {dt*1e3:.1f} ms/step "
                f"({micro/dt:.1f} img/s), loss={float(logs['loss']):.4f} "
                f"discr={float(logs['discr_loss']):.4f}"
            )
        except Exception as e:  # e.g. RESOURCE_EXHAUSTED at larger micro-batches
            log(f"  {jnp.dtype(dtype).name} (vgg={vgg_dtype}, discr={discr_dtype}) micro-batch {micro}: FAILED {type(e).__name__}: {str(e)[:200]}")
        finally:
            del state, tr, vae
            gc.collect()

    arm(jnp.float32, 4)
    arm(jnp.bfloat16, 4)
    arm(jnp.bfloat16, 4, vgg_dtype=jnp.bfloat16)  # bf16 perceptual tower
    arm(jnp.bfloat16, 8)  # f32 OOMs here on one v5e (r2, BASELINE.md)
    arm(jnp.bfloat16, 8, vgg_dtype=jnp.bfloat16)
    # NOT swept: discr_dtype=bf16 — deterministic XLA-TPU compiler SIGSEGV
    # (R1 grad-of-grad through bf16 convs; 5/5 across 3 processes, r3)


def exp_edit():
    """Drive the editing/inpainting path at bench scale on real TPU: verify
    the per-row-budget decode + fused sampler compile and run under Mosaic,
    known tokens survive the round trip, and measure the edit img/s vs plain
    generate (edit runs the full-sequence decode body — compact's static
    segment counts don't apply to data-dependent editable regions).
    Run: python bench_sweep.py edit"""
    import numpy as np

    batch, size = 32, 256
    vae = VQGanVAE(dim=256, layers=4, codebook_size=65536, use_vgg_and_gan=False, rngs=nnx.Rngs(0))
    mg = build(256, size, vae=vae)
    te = jax.random.normal(jax.random.PRNGKey(0), (batch, 64, 768), jnp.float32)
    tm = jnp.ones((batch, 64), bool)
    images = jax.random.uniform(jax.random.PRNGKey(1), (batch, size, size, 3))

    # regenerate the center half of the token grid (outpainting-style border keep)
    mask = np.zeros((batch, 16, 16), bool)
    mask[:, 4:12, 4:12] = True
    mask = jnp.asarray(mask)

    def run_edit(key):
        return mg.edit(
            images, mask, text_embeds=te, text_mask=tm, rng=key,
            timesteps=18, cond_scale=3.0, return_ids=True,
        )

    log("compiling edit program...")
    t0 = time.perf_counter()
    out = run_edit(jax.random.PRNGKey(9))
    out_np = np.asarray(out).reshape(batch, -1)
    log(f"first call {time.perf_counter() - t0:.1f}s")

    _, src, _ = mg.vae.encode(images, train=False)
    src = np.asarray(src).reshape(batch, -1)
    keep = ~np.asarray(mask).reshape(batch, -1)
    assert (out_np[keep] == src[keep]).all(), "known tokens changed on TPU!"
    assert out_np.max() < 65536, "mask_id leak"
    log("known-token preservation verified on TPU")

    n = 5
    t0 = time.perf_counter()
    for i in range(n):
        out = run_edit(jax.random.PRNGKey(i))
        _ = float(out.sum())
    dt = (time.perf_counter() - t0) / n
    log(f"edit (192/256 tokens regenerated): {batch / dt:.2f} img/s ({dt * 1000:.0f} ms/batch)")

    for compact in (True, False):
        ips, _ = time_generate(mg, batch, compact=compact)
        log(f"generate compact={compact}: {ips:.2f} img/s (reference arm)")


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
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    if cmd == "residual":
        exp_residual()
    elif cmd == "knee":
        exp_batch_knee()
    elif cmd == "vae":
        exp_vae_dtype()
    elif cmd == "bisect":
        exp_bisect()
    elif cmd == "ctx":
        exp_ctx_cache()
    elif cmd == "trainmfu":
        exp_train_mfu()
    elif cmd == "trainloss":
        exp_train_loss()
    elif cmd == "ganstep":
        exp_gan_step()
    elif cmd == "edit":
        exp_edit()
    elif cmd == "varres":
        exp_varres()
    elif cmd == "cfgfold":
        exp_cfg_fold()
    elif cmd == "nullfold":
        exp_null_fold()
    elif cmd == "anatomy":
        exp_anatomy()
    elif cmd == "sranatomy":
        exp_superres_anatomy()
    elif cmd == "lndtype":
        exp_ln_dtype()
    else:
        main()
