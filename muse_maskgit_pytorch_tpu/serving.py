"""Serving pipeline: fixed-shape batched text->image generation.

Production wrapper around `MaskGit.generate` / the `Muse` cascade. XLA
compiles one program per distinct shape, so a server must pin its shapes:
the pipeline pads every request batch to a fixed `batch_size` and every
prompt to fixed text-length buckets, pre-compiles them in `warmup()`, and
then serves arbitrary-size prompt lists by chunking. (The reference has no
serving story at all — its generate is a host python loop with per-step
device syncs, SURVEY.md §3.3.)
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from pathlib import Path
from typing import List, Optional, Sequence, Union

import jax
import jax.export
import jax.numpy as jnp
import numpy as np
from flax import nnx

from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit, Muse, vaes_share_weights
from muse_maskgit_pytorch_tpu.models.t5 import t5_encode_text_with_mask
from muse_maskgit_pytorch_tpu.parallel.mesh import shard_batch


def enable_persistent_compile_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Point XLA's persistent compilation cache at a disk directory so a
    server process pays the full generate-scan compile (20 s – minutes for
    the cascade) at most ONCE per shape set across restarts: the next process
    deserializes the cached executable in seconds. Returns the directory, or
    None if the backend declined. Safe to call repeatedly.

    Cold-start recipe: fixed shapes (GeneratePipeline pins batch/text-len) +
    this cache + `warmup()` at boot. Override the location with `cache_dir`
    or MUSE_COMPILE_CACHE; defaults to a shared tmp path.
    """
    cache_dir = (
        cache_dir
        or os.environ.get("MUSE_COMPILE_CACHE")
        or os.path.join(tempfile.gettempdir(), "muse_maskgit_tpu_compile_cache")
    )
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        return str(cache_dir)
    except Exception:
        return None


@jax.jit
def _quantize_u8(imgs):
    """On-device f32 [0,1] -> uint8 before the host fetch (4x fewer bytes on
    the serving bottleneck link). One jitted program — as four eager ops this
    chain was the last first-request compile after warmup (load-test finding:
    ~40 ms stall on CPU, seconds over a tunnel)."""
    return (jnp.clip(imgs, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)


_BACKEND_COMPILES = [0]


def _count_backend_compiles(name: str, duration: float, **kwargs) -> None:
    if name == "/jax/core/compile/backend_compile_duration":
        _BACKEND_COMPILES[0] += 1


jax.monitoring.register_event_duration_secs_listener(_count_backend_compiles)


def backend_compile_count() -> int:
    """Process-wide count of XLA backend compiles (jax.monitoring). A
    correctly warmed server's count is FLAT during traffic — `/stats`
    exposes it so deployments (and the load test) can assert zero
    mid-traffic compiles rather than infer them from latency spikes."""
    return _BACKEND_COMPILES[0]


class GeneratePipeline:
    """Batched, shape-stable sampling service around one MaskGit (or a Muse
    cascade's base+superres pair).

    Usage:
        pipe = GeneratePipeline(maskgit, batch_size=16)
        pipe.warmup()
        images = pipe(["a cat", "a dog", ...])   # any number of prompts

    Returns PIL images (`return_pil=True`, default) or a uint8 (n, H, W, 3)
    array — quantization happens on device so the host fetch moves 4x fewer
    bytes than f32 (the bottleneck when the accelerator is remote).

    Production tip: build the VAE with `dtype=jnp.bfloat16` — the decode
    stage runs 17% faster (+1.6% end-to-end) with a max pixel delta of
    0.0008, i.e. below one uint8 level (BASELINE.md r3 A/B).

    Pass `mesh=` (e.g. `create_mesh()`) to serve data-parallel over a TPU
    pod slice: each request batch shards over the mesh's data axis and the
    whole program runs SPMD — `batch_size` then means the GLOBAL batch and
    must divide by the data-axis device count.
    """

    def __init__(
        self,
        model: Union[MaskGit, Muse],
        batch_size: int = 16,
        timesteps: int = 18,
        cond_scale: float = 3.0,
        temperature: float = 1.0,
        text_len: int = 64,
        seed: int = 0,
        return_pil: bool = True,
        negative_prompt: Optional[str] = None,
        compile_cache: Union[bool, str, None] = True,
        mesh=None,
        rerank_candidates: int = 1,
        rerank_score: str = "auto",
        image_size=None,
        cond_via: str = "auto",
    ):
        # cold-start story: persistent XLA compile cache ON by default — a
        # restarted server deserializes the cascade executables instead of
        # recompiling for minutes (measured in BASELINE.md "serving cold
        # start"). True = default dir, str = custom dir, False/None = off.
        if compile_cache:
            self.compile_cache_dir = enable_persistent_compile_cache(
                None if compile_cache is True else compile_cache
            )
        else:
            self.compile_cache_dir = None
        self.model = model
        self.is_cascade = isinstance(model, Muse)
        # data-parallel serving: with a mesh, every request batch is sharded
        # over the mesh's data axis and the decode scan runs SPMD across the
        # chips (token-identical to single-device — tests/test_serving.py;
        # the underlying equivalence is pinned in test_parallel_generate.py)
        self.mesh = mesh
        if mesh is not None:
            self._data_axis = "data" if "data" in mesh.axis_names else mesh.axis_names[0]
            n = mesh.shape[self._data_axis]
            assert batch_size % n == 0, (
                f"batch_size {batch_size} must divide over the mesh's "
                f"'{self._data_axis}' axis ({n} devices)"
            )
        self.batch_size = batch_size
        self.timesteps = timesteps
        self.cond_scale = cond_scale
        self.temperature = temperature
        self.text_len = text_len
        self.return_pil = return_pil
        self.negative_prompt = negative_prompt
        # best-of-K: each request batch decodes batch_size * K candidates in
        # one fixed-shape program and serves the per-prompt winners
        assert rerank_candidates >= 1
        self.rerank_candidates = rerank_candidates
        self.rerank_score = rerank_score
        # deployment-level resolution override (int or (h, w) for a
        # non-square aspect ratio): the BASE stage generates at this size;
        # a cascade's super-res stage scales it by the trained ratio
        # (variable/rectangular-resolution sampling, MaskGit.generate).
        # One pipeline still compiles ONE shape — this picks WHICH shape a
        # deployment serves; edit() stays at the models' native sizes.
        self._gen_base_size = None
        self._gen_sr_size = None
        if image_size is not None:
            bh, bw = (
                (int(image_size[0]), int(image_size[1]))
                if isinstance(image_size, (tuple, list))
                else (int(image_size), int(image_size))
            )
            self._gen_base_size = (bh, bw)
            if self.is_cascade:
                ratio = (
                    model.superres_maskgit.image_size
                    // model.base_maskgit.image_size
                )
                self._gen_sr_size = (bh * ratio, bw * ratio)
        # cascade inter-stage contract (Muse.__call__ `cond_via`): "ids"
        # hands the base stage's token grid straight to the super-res decode
        # — faster (no decode->clip->re-encode round trip) and strictly more
        # faithful (encode(decode(ids)) is not the identity), but only valid
        # when the stages share one VAE. "auto" (default) picks "ids"
        # exactly when they do — serving is this framework's own subsystem,
        # so it defaults to the better contract; Muse.__call__ itself
        # defaults to "pixels" (the reference's inter-stage semantics).
        # ValueError, not assert: config validation must survive python -O
        # (a wrong-codebook ids handoff silently serves garbage images)
        if cond_via not in ("auto", "pixels", "ids"):
            raise ValueError(f"cond_via must be auto/pixels/ids, got {cond_via!r}")
        if not self.is_cascade and cond_via != "auto":
            raise ValueError(
                "cond_via is a cascade inter-stage knob; this pipeline serves "
                "a single MaskGit"
            )
        self.cond_via = "pixels"
        if self.is_cascade:
            shared = vaes_share_weights(
                model.superres_maskgit.cond_vae, model.base_maskgit.vae
            )
            if cond_via == "ids" and not shared:
                raise ValueError(
                    "cond_via='ids' requires the cascade stages to share "
                    "one VAE; this cascade's differ"
                )
            self.cond_via = (
                ("ids" if shared else "pixels") if cond_via == "auto" else cond_via
            )
        self._rng = jax.random.PRNGKey(seed)
        self.stats = {"requests": 0, "images": 0, "batches": 0, "generate_seconds": 0.0}
        # compiled-surface warmup bookkeeping (see warmup()); a surface is
        # marked warm after its program has executed once in this process
        self.warm_surfaces: set = set()

    # -- internals ------------------------------------------------------------

    def _transformer(self):
        m = self.model.base_maskgit if self.is_cascade else self.model
        return m.transformer

    @property
    def image_size(self) -> int:
        """The models' NATIVE pixel size (the super-res stage's for a
        cascade) — what edit() expects source images and masks to measure.
        When a deployment-level `image_size` override is active, generated
        images come out at `output_size` instead, not this."""
        m = self.model.superres_maskgit if self.is_cascade else self.model
        return m.image_size

    @property
    def output_size(self) -> tuple:
        """Effective (h, w) of images __call__ returns: the deployment
        `image_size` override when set (cascade: scaled by the trained
        ratio), else the native square size."""
        if self.is_cascade and self._gen_sr_size is not None:
            return self._gen_sr_size
        if not self.is_cascade and self._gen_base_size is not None:
            return self._gen_base_size
        return (self.image_size, self.image_size)

    def _encode_prompts(self, prompts: Sequence[str]):
        """Fixed-length text embeddings: pad/truncate to `text_len` so every
        batch hits the same compiled program."""
        embeds, mask = t5_encode_text_with_mask(
            list(prompts),
            name=self._transformer().t5_name,
            max_length=self.text_len,
            pad_to_multiple=self.text_len,
        )
        n = embeds.shape[1]
        if n < self.text_len:
            embeds = jnp.pad(embeds, ((0, 0), (0, self.text_len - n), (0, 0)))
            mask = jnp.pad(mask, ((0, 0), (0, self.text_len - n)))
        return embeds[:, : self.text_len], mask[:, : self.text_len]

    def _next_key(self):
        self._rng, key = jax.random.split(self._rng)
        return key

    def _neg_embeds(self):
        # the negative prompt is fixed per pipeline: encode it once, not per
        # batch chunk (T5 forward on every request would dominate short jobs)
        if self.negative_prompt is None:
            return None
        if not hasattr(self, "_neg_embeds_cache"):
            embeds, _ = self._encode_prompts(
                [self.negative_prompt] * self.batch_size
            )
            if self.mesh is not None:
                embeds = shard_batch(embeds, self.mesh, self._data_axis)
            self._neg_embeds_cache = embeds
        return self._neg_embeds_cache

    def _encode_neg_rows(self, negs: Sequence[Optional[str]]):
        """PER-ROW negative prompts -> one (batch, text_len, dim) array.

        Rows with a string are T5-encoded; `None` rows fall back to the
        pipeline's `negative_prompt`, and rows with no negative at all get
        ALL-ZERO embeddings — the model derives that row's neg mask as
        fully-False, so its "neg" half attends a fully masked context, which
        is EXACTLY the standard CFG null (softmax one-hot on the null KV).
        A mixed batch therefore coalesces into ONE compiled neg program with
        no-neg rows reproducing plain cond-scale guidance token-exactly
        (tests/test_serving_http.py)."""
        assert len(negs) == self.batch_size
        effective = [
            n if n is not None else self.negative_prompt for n in negs
        ]
        has_neg = np.asarray([n is not None for n in effective], bool)
        embeds, _ = self._encode_prompts(
            [n if n is not None else "" for n in effective]
        )
        # zero the no-neg rows: encoding "" still emits an EOS embedding,
        # which would otherwise read as a real (empty) negative prompt
        embeds = embeds * jnp.asarray(has_neg, embeds.dtype)[:, None, None]
        return embeds

    def _generate_batch(self, embeds, mask, cond_scale=None, neg_embeds=None):
        if self.mesh is not None:
            embeds, mask = shard_batch((embeds, mask), self.mesh, self._data_axis)
            if neg_embeds is not None:
                neg_embeds = shard_batch(neg_embeds, self.mesh, self._data_axis)
            with self.mesh:
                return self._generate_batch_inner(
                    embeds, mask, cond_scale, neg_embeds
                )
        return self._generate_batch_inner(embeds, mask, cond_scale, neg_embeds)

    def _base_generate(self, base, embeds, mask, key, cond_scale=None,
                       neg_embeds=None, return_ids=False):
        """Base-stage generate, re-ranked when the pipeline asks for it."""
        common = dict(
            neg_text_embeds=(
                self._neg_embeds() if neg_embeds is None else neg_embeds
            ),
            timesteps=self.timesteps,
            cond_scale=self.cond_scale if cond_scale is None else cond_scale,
            temperature=self.temperature,
            image_size=self._gen_base_size,
            return_ids=return_ids,
        )
        if self.rerank_candidates > 1:
            return base.generate_reranked(
                text_embeds=embeds, text_mask=mask, rng=key,
                num_candidates=self.rerank_candidates,
                score_method=self.rerank_score,
                **common,
            )
        return base.generate(text_embeds=embeds, text_mask=mask, rng=key, **common)

    def _generate_batch_inner(self, embeds, mask, cond_scale=None, neg_embeds=None):
        key = self._next_key()
        if self.is_cascade:
            k1, k2 = jax.random.split(key)
            via_ids = self.cond_via == "ids"
            low = self._base_generate(
                self.model.base_maskgit, embeds, mask, k1, cond_scale,
                neg_embeds, return_ids=via_ids,
            )
            if via_ids:
                sr_cond = dict(cond_token_ids=low)
            else:
                sr_cond = dict(cond_images=jnp.clip(low, 0.0, 1.0))
            return self.model.superres_maskgit.generate(
                text_embeds=embeds, text_mask=mask, rng=k2, **sr_cond,
                neg_text_embeds=(
                    self._neg_embeds() if neg_embeds is None else neg_embeds
                ),
                timesteps=self.timesteps,
                cond_scale=self.cond_scale if cond_scale is None else cond_scale,
                temperature=self.temperature,
                image_size=self._gen_sr_size,
            )
        return self._base_generate(self.model, embeds, mask, key, cond_scale,
                                   neg_embeds)

    def _scale_vector(self, scales: Sequence[float]):
        """Per-row guidance as a (1, batch) traced array — ONE compiled
        dynamic program serves every combination of per-request scales."""
        assert len(scales) == self.batch_size
        return jnp.asarray(np.asarray(scales, np.float32)[None, :])

    # -- public ----------------------------------------------------------------

    WARMUP_SURFACES = (
        "generate", "dynamic_scale", "neg_dynamic", "edit", "edit_dynamic_scale",
    )

    def warmup(self, surfaces: Union[str, Sequence[str]] = ("generate",)) -> float:
        """Compile the configured serving surfaces at boot; returns total
        compile wall-clock (per-surface times land in
        `stats["warmup_seconds"]`, warmed surfaces in `warm_surfaces`).

        `surfaces`: iterable of {"generate", "dynamic_scale", "neg_dynamic",
        "edit", "edit_dynamic_scale"} or "all". "generate" is the pipeline's
        static-guidance program (and covers re-ranking when
        `rerank_candidates > 1` — same program); "dynamic_scale" is the
        per-request-guidance program (`__call__(..., cond_scale=...)`);
        "neg_dynamic" is the per-request NEGATIVE-PROMPT program
        (`__call__(..., negative_prompts=...)` — per-row neg embeddings plus
        a per-row scale vector, one program for every neg/no-neg/scale mix);
        "edit" is the inpainting program; "edit_dynamic_scale" is the
        per-request-guidance EDIT program (`edit(..., cond_scale=...)` —
        a different compiled program from the static edit).
        A surface not warmed here compiles on its FIRST live request —
        minutes of cold compile mid-traffic on a remote accelerator
        (BASELINE.md "serving cold start"), so warm every surface the
        deployment enables."""
        if surfaces == "all":
            surfaces = self.WARMUP_SURFACES
        if isinstance(surfaces, str):
            surfaces = (surfaces,)
        per_surface = self.stats.setdefault("warmup_seconds", {})
        t_start = time.perf_counter()
        for s in surfaces:
            assert s in self.WARMUP_SURFACES, (
                f"unknown warmup surface {s!r} (choose from {self.WARMUP_SURFACES})"
            )
            t0 = time.perf_counter()
            if s == "generate":
                embeds, mask = self._encode_prompts([""] * self.batch_size)
                out = self._generate_batch(embeds, mask)
            elif s == "dynamic_scale":
                embeds, mask = self._encode_prompts([""] * self.batch_size)
                out = self._generate_batch(
                    embeds, mask,
                    self._scale_vector([self.cond_scale] * self.batch_size),
                )
            elif s == "neg_dynamic":
                # the per-request-neg program: per-row neg embeds (zeros =
                # the standard null for no-neg rows) + per-row scale vector.
                # _encode_neg_rows([None]*b) IS those zeros — routing warmup
                # through it also warms the host row-masking chain
                embeds, mask = self._encode_prompts([""] * self.batch_size)
                out = self._generate_batch(
                    embeds, mask,
                    self._scale_vector([self.cond_scale] * self.batch_size),
                    neg_embeds=self._encode_neg_rows([None] * self.batch_size),
                )
            else:  # edit / edit_dynamic_scale
                size = self.image_size
                img_j = jnp.zeros((self.batch_size, size, size, 3), jnp.float32)
                # all-False mask: zero editable positions — the decode passes
                # through, but the compiled program is the real edit program
                # (shapes and structure identical to a live request)
                mask_j = jnp.zeros((self.batch_size, size, size), jnp.bool_)
                embeds, tmask = self._encode_prompts([""] * self.batch_size)
                scale = (
                    self._scale_vector([self.cond_scale] * self.batch_size)
                    if s == "edit_dynamic_scale"
                    else None
                )
                if self.mesh is not None:
                    img_j, mask_j, embeds, tmask = shard_batch(
                        (img_j, mask_j, embeds, tmask), self.mesh, self._data_axis
                    )
                    with self.mesh:
                        out = self._edit_batch(
                            img_j, mask_j, embeds, tmask, self._next_key(), scale
                        )
                else:
                    out = self._edit_batch(
                        img_j, mask_j, embeds, tmask, self._next_key(), scale
                    )
            out = _quantize_u8(out)  # warm the on-device uint8 fetch program
            jax.block_until_ready(out)
            _ = float(out.sum())  # full barrier on lazy runtimes
            per_surface[s] = time.perf_counter() - t0
            self.warm_surfaces.add(s)
        return time.perf_counter() - t_start

    def __call__(self, prompts: Union[str, List[str]], cond_scale=None,
                 negative_prompts=None):
        """`cond_scale`: optional guidance override — a scalar for the whole
        call, or a per-PROMPT sequence (len(prompts)). Either form is passed
        as a traced (1, batch) per-row vector, so every override — including
        a coalesced batch of requests each with its own scale — shares ONE
        compiled program (generate()'s dynamic per-sample path, no recompile
        per setting); None uses the pipeline default via the static program.

        `negative_prompts`: optional per-request negative prompting — one
        string for the whole call, or a per-PROMPT sequence whose `None`
        entries mean "no negative for this row" (they fall back to the
        pipeline-level `negative_prompt`, else the standard CFG null via
        all-zero neg embeddings — `_encode_neg_rows`). Any negative prompt
        routes the batch through ONE compiled program ("neg_dynamic": per-row
        neg embeds + per-row scale vector), so neg / no-neg / scale-varied
        requests all coalesce. Costs one extra T5 forward per chunk."""
        if isinstance(prompts, str):
            prompts = [prompts]
        n = len(prompts)
        scales = None
        if cond_scale is not None:
            arr = np.asarray(cond_scale, np.float32)
            scales = np.full((n,), float(arr), np.float32) if arr.ndim == 0 else arr.reshape(-1)
            assert scales.shape == (n,), (
                f"cond_scale must be a scalar or one value per prompt ({n}), "
                f"got shape {scales.shape}"
            )
        negs = None
        if negative_prompts is not None:
            negs = (
                [negative_prompts] * n
                if isinstance(negative_prompts, str)
                else list(negative_prompts)
            )
            if len(negs) != n:
                raise ValueError(
                    f"negative_prompts must be a string or one entry (str or "
                    f"None) per prompt ({n}), got {len(negs)}"
                )
            if all(e is None for e in negs):
                negs = None  # nothing to do — keep the static program
        self.stats["requests"] += 1

        outputs = []
        for start in range(0, n, self.batch_size):
            chunk = list(prompts[start : start + self.batch_size])
            pad = self.batch_size - len(chunk)
            chunk_padded = chunk + [""] * pad

            chunk_scale = None
            if scales is not None or negs is not None:
                # per-request negs always ride the per-row-scale program so
                # every neg/scale mix shares ONE compiled program
                sc = (
                    list(scales[start : start + self.batch_size])
                    if scales is not None
                    else [self.cond_scale] * len(chunk)
                )
                chunk_scale = self._scale_vector(sc + [self.cond_scale] * pad)
            chunk_negs = None
            if negs is not None:
                chunk_negs = self._encode_neg_rows(
                    list(negs[start : start + self.batch_size]) + [None] * pad
                )
            embeds, mask = self._encode_prompts(chunk_padded)
            t0 = time.perf_counter()
            imgs = self._generate_batch(embeds, mask, chunk_scale, chunk_negs)
            # quantize to uint8 ON DEVICE before the host fetch: the f32
            # images are 4x the bytes for no benefit (PIL needs uint8), and
            # device->host bandwidth is the serving bottleneck on remote
            # (tunneled) hosts — measured 4.15 -> ~8 img/s on the cascade
            imgs_u8 = _quantize_u8(imgs)
            imgs_np = np.asarray(imgs_u8)
            self.stats["generate_seconds"] += time.perf_counter() - t0
            self.stats["batches"] += 1
            self.warm_surfaces.add(
                "neg_dynamic"
                if chunk_negs is not None
                else ("generate" if chunk_scale is None else "dynamic_scale")
            )
            outputs.append(imgs_np[: len(chunk)])

        images = np.concatenate(outputs, axis=0)
        self.stats["images"] += n
        if self.return_pil:
            from PIL import Image

            return [Image.fromarray(np.asarray(im)) for im in images]
        return images

    def edit(self, images, edit_masks, prompts: Union[str, List[str]], cond_scale=None):
        """Batched editing / inpainting: regenerate the masked region of each
        image under its prompt (MaskGit.edit / Muse.edit with the pipeline's
        fixed shapes). `images`: (n, H, W, 3) float [0,1] or uint8 at the
        model's (cascade: super-res) image size; `edit_masks`: (n, H, W)
        pixel-level or (n, f, f) token-level (single MaskGit only), True =
        regenerate. Requests chunk/pad to `batch_size` like __call__ —
        padding rows carry an all-False mask, so they pass through the
        decode untouched (zero editable positions) and are dropped. Returns
        uint8 images (or PIL with return_pil=True).

        `cond_scale`: optional guidance override, scalar or per-prompt —
        same traced per-row contract as __call__ (one compiled dynamic edit
        program for every scale mix)."""
        if isinstance(prompts, str):
            prompts = [prompts]
        images = np.asarray(images)
        if images.dtype == np.uint8:
            images = images.astype(np.float32) / 255.0
        edit_masks = np.asarray(edit_masks)
        if edit_masks.dtype != np.bool_:
            edit_masks = edit_masks > 0.5
        n = len(prompts)
        assert images.shape[0] == edit_masks.shape[0] == n, (
            f"prompts ({n}), images ({images.shape[0]}) and masks "
            f"({edit_masks.shape[0]}) must align"
        )
        scales = None
        if cond_scale is not None:
            arr = np.asarray(cond_scale, np.float32)
            scales = np.full((n,), float(arr), np.float32) if arr.ndim == 0 else arr.reshape(-1)
            assert scales.shape == (n,), (
                f"cond_scale must be a scalar or one value per prompt ({n}), "
                f"got shape {scales.shape}"
            )
        self.stats["requests"] += 1

        outputs = []
        for start in range(0, n, self.batch_size):
            chunk = list(prompts[start : start + self.batch_size])
            pad = self.batch_size - len(chunk)
            img_chunk = images[start : start + self.batch_size]
            mask_chunk = edit_masks[start : start + self.batch_size]
            if pad:
                img_chunk = np.concatenate(
                    [img_chunk, np.zeros((pad,) + img_chunk.shape[1:], img_chunk.dtype)]
                )
                mask_chunk = np.concatenate(
                    [mask_chunk, np.zeros((pad,) + mask_chunk.shape[1:], bool)]
                )
            chunk_scale = None
            if scales is not None:
                chunk_scale = self._scale_vector(
                    list(scales[start : start + self.batch_size])
                    + [self.cond_scale] * pad
                )
            embeds, tmask = self._encode_prompts(chunk + [""] * pad)
            img_j = jnp.asarray(img_chunk)
            mask_j = jnp.asarray(mask_chunk)
            if self.mesh is not None:
                img_j, mask_j, embeds, tmask = shard_batch(
                    (img_j, mask_j, embeds, tmask), self.mesh, self._data_axis
                )
            t0 = time.perf_counter()
            key = self._next_key()
            if self.mesh is not None:
                with self.mesh:
                    imgs = self._edit_batch(
                        img_j, mask_j, embeds, tmask, key, chunk_scale
                    )
            else:
                imgs = self._edit_batch(img_j, mask_j, embeds, tmask, key, chunk_scale)
            imgs_u8 = _quantize_u8(imgs)
            imgs_np = np.asarray(imgs_u8)
            self.stats["generate_seconds"] += time.perf_counter() - t0
            self.stats["batches"] += 1
            self.warm_surfaces.add(
                "edit" if chunk_scale is None else "edit_dynamic_scale"
            )
            outputs.append(imgs_np[: len(chunk)])

        out = np.concatenate(outputs, axis=0)
        self.stats["images"] += n
        if self.return_pil:
            from PIL import Image

            return [Image.fromarray(np.asarray(im)) for im in out]
        return out

    def _edit_batch(self, images, masks, embeds, tmask, key, cond_scale=None):
        # same guidance contract as __call__: the pipeline's negative prompt
        # applies to edit requests too
        common = dict(
            cond_scale=self.cond_scale if cond_scale is None else cond_scale,
            temperature=self.temperature,
            timesteps=self.timesteps,
            neg_text_embeds=self._neg_embeds(),
        )
        if self.is_cascade:
            return self.model.edit(
                images, masks, rng=key, text_embeds=embeds, text_mask=tmask,
                return_pil_images=False, **common,
            )
        return self.model.edit(
            images, masks, rng=key, text_embeds=embeds, text_mask=tmask, **common
        )

    @property
    def images_per_second(self) -> Optional[float]:
        if self.stats["generate_seconds"] == 0:
            return None
        return self.stats["images"] / self.stats["generate_seconds"]


# ---------------------------------------------------------------------------
# AOT export: a deployable generate program (jax.export / StableHLO)
# ---------------------------------------------------------------------------


class ExportedPipeline:
    """A serialized, ahead-of-time-exported generate program.

    `export_pipeline` traces the full fixed-shape sampling program (base
    MaskGit or whole Muse cascade, decode scan + samplers + VAE decode +
    on-device uint8 quantization) once and captures it as a versioned
    StableHLO artifact via `jax.export`. The artifact is independent of this
    package's Python model code: a serving host needs only JAX, the saved
    artifact, and the parameter checkpoint — no tracing, no model classes,
    no shape rediscovery. (The reference has no deployment artifact at all —
    its generate is a live python loop over the torch module, SURVEY.md §3.3.)

    Parameters travel OUTSIDE the artifact as a flat tuple of arrays (the
    `jax.tree.leaves` order of the model's `nnx.split` state): baking 325M
    f32 params into the program as constants would bloat the artifact ~1.3G
    and blow compile-request caps (BASELINE.md r1 HTTP 413 post-mortem).

    Call as `exported(state, text_embeds, text_mask, key)` where `state` is
    the `nnx.split` state of an identically-constructed model (or the flat
    leaves list); returns uint8 (batch, H, W, 3) images.
    """

    def __init__(self, exported: "jax.export.Exported", meta: dict):
        self.exported = exported
        self.meta = dict(meta)

    def __call__(self, state, text_embeds, text_mask, key, cond_images=None,
                 cond_scale=None):
        if isinstance(state, (list, tuple)):
            leaves = tuple(state)
        else:
            leaves = tuple(jax.tree.leaves(state))
        n_expected = self.meta["n_state_leaves"]
        if len(leaves) != n_expected:
            raise ValueError(
                f"state has {len(leaves)} array leaves, exported program "
                f"expects {n_expected} — was the model built with the same "
                "architecture as at export time?"
            )
        args = (leaves, jnp.asarray(text_embeds), jnp.asarray(text_mask), key)
        if self.meta.get("dynamic_cond_scale"):
            # per-row guidance is a live program input: scalar broadcasts,
            # a (batch,) vector gives each row its own scale, None = the
            # default recorded at export time
            b = self.meta["batch_size"]
            scale = self.meta["cond_scale"] if cond_scale is None else cond_scale
            args = args + (jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (b,)),)
        elif cond_scale is not None:
            raise ValueError(
                "this artifact bakes a static cond_scale; re-export with "
                "dynamic_cond_scale=True for per-call guidance"
            )
        if self.meta["needs_cond_images"]:
            if cond_images is None:
                raise ValueError(
                    "this artifact was exported from a conditioned (super-res) "
                    "MaskGit: pass cond_images=(batch, H, W, 3)"
                )
            args = args + (jnp.asarray(cond_images),)
        elif cond_images is not None:
            raise ValueError("cond_images passed but the exported program takes none")
        return self.exported.call(*args)

    def save(self, path) -> str:
        """Write `<path>/program.jexp` + `<path>/meta.json`."""
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        (path / "program.jexp").write_bytes(self.exported.serialize())
        (path / "meta.json").write_text(json.dumps(self.meta, indent=2))
        return str(path)

    @classmethod
    def load(cls, path) -> "ExportedPipeline":
        path = Path(path)
        exported = jax.export.deserialize((path / "program.jexp").read_bytes())
        meta = json.loads((path / "meta.json").read_text())
        return cls(exported, meta)


def export_pipeline(
    model: Union[MaskGit, Muse],
    *,
    batch_size: int = 16,
    text_len: int = 64,
    timesteps: int = 18,
    cond_scale: float = 3.0,
    temperature: float = 1.0,
    sampler: str = "auto",
    platforms: Optional[Sequence[str]] = None,
    dynamic_cond_scale: bool = False,
    cond_via: str = "auto",
) -> ExportedPipeline:
    """AOT-export the fixed-shape generate program (see `ExportedPipeline`).

    `platforms` lowers for specific targets (e.g. `("tpu",)` to produce a TPU
    artifact from a CPU build host); default = the current backend. With the
    default `sampler="auto"` the traced sampler follows the EXPORTING host's
    backend — pass `sampler="fused"` explicitly when cross-lowering to TPU so
    the artifact carries the Pallas sampling kernel.

    `dynamic_cond_scale=True` bakes the guidance scale as a PROGRAM INPUT —
    a (batch,) f32 vector argument (after the PRNG key) gives every row its
    own scale at call time, so one deployed artifact serves any per-request
    guidance mix (generate()'s per-sample traced path); `cond_scale` then
    only names the default recorded in meta.
    """
    is_cascade = isinstance(model, Muse)
    graphdef, state = nnx.split(model)
    treedef = jax.tree.structure(state)
    leaves = jax.tree.leaves(state)
    tr = (model.base_maskgit if is_cascade else model).transformer
    gen_kwargs = dict(timesteps=timesteps, temperature=temperature, sampler=sampler)

    standalone_cond = (not is_cascade) and model.resize_image_for_cond_image
    # inter-stage contract resolved exactly like GeneratePipeline(cond_via=);
    # ValueError, not assert: config validation must survive python -O
    if cond_via not in ("auto", "pixels", "ids"):
        raise ValueError(f"cond_via must be auto/pixels/ids, got {cond_via!r}")
    if not is_cascade and cond_via != "auto":
        raise ValueError(
            "cond_via is a cascade inter-stage knob; this export is a single MaskGit"
        )
    via_ids = False
    if is_cascade:
        shared = vaes_share_weights(
            model.superres_maskgit.cond_vae, model.base_maskgit.vae
        )
        if cond_via == "ids" and not shared:
            raise ValueError("cond_via='ids' requires a shared cascade VAE")
        via_ids = shared if cond_via == "auto" else cond_via == "ids"

    def run(leaves_in, text_embeds, text_mask, key, *rest):
        rest = list(rest)
        scale = rest.pop(0)[None, :] if dynamic_cond_scale else cond_scale
        m = nnx.merge(graphdef, jax.tree.unflatten(treedef, list(leaves_in)))
        if is_cascade:
            k1, k2 = jax.random.split(key)
            low = m.base_maskgit.generate(
                text_embeds=text_embeds, text_mask=text_mask, rng=k1,
                cond_scale=scale, return_ids=via_ids, **gen_kwargs,
            )
            sr_cond = (
                dict(cond_token_ids=low)
                if via_ids
                else dict(cond_images=jnp.clip(low, 0.0, 1.0))
            )
            images = m.superres_maskgit.generate(
                text_embeds=text_embeds, text_mask=text_mask, rng=k2,
                cond_scale=scale, **sr_cond, **gen_kwargs,
            )
        else:
            images = m.generate(
                text_embeds=text_embeds, text_mask=text_mask, rng=key,
                cond_images=rest[0] if standalone_cond else None,
                cond_scale=scale, **gen_kwargs,
            )
        return (jnp.clip(images, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.uint8)

    ctx_dim = tr.text_embed_dim
    arg_avals = [
        tuple(jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves),
        jax.ShapeDtypeStruct((batch_size, text_len, ctx_dim), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, text_len), jnp.bool_),
        jax.ShapeDtypeStruct((2,), jnp.uint32),  # raw PRNGKey
    ]
    if dynamic_cond_scale:
        arg_avals.append(jax.ShapeDtypeStruct((batch_size,), jnp.float32))
    if standalone_cond:
        s = model.cond_image_size
        arg_avals.append(jax.ShapeDtypeStruct((batch_size, s, s, 3), jnp.float32))

    exported = jax.export.export(
        jax.jit(run), platforms=list(platforms) if platforms else None
    )(*arg_avals)
    meta = {
        "kind": "muse" if is_cascade else "maskgit",
        "batch_size": batch_size,
        "text_len": text_len,
        "text_embed_dim": int(ctx_dim),
        "timesteps": timesteps,
        "cond_scale": cond_scale,
        "temperature": temperature,
        "sampler": sampler,
        "n_state_leaves": len(leaves),
        "needs_cond_images": bool(standalone_cond),
        "dynamic_cond_scale": bool(dynamic_cond_scale),
        "cond_via": ("ids" if via_ids else "pixels") if is_cascade else None,
        "platforms": list(exported.platforms),
        "image_size": int(
            (model.superres_maskgit if is_cascade else model).image_size
        ),
    }
    return ExportedPipeline(exported, meta)


def load_exported_pipeline(path) -> ExportedPipeline:
    """Load an artifact written by `ExportedPipeline.save`."""
    return ExportedPipeline.load(path)
