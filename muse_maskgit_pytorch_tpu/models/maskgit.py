"""MaskGit: masked-token training objective + iterative parallel decoding,
and the Muse base→super-res cascade.

TPU-native rebuild of `/root/reference/muse_maskgit_pytorch/
muse_maskgit_pytorch.py:427-791`. The key structural change: the reference's
18-step decode loop is host python with a device sync every step
(`.item()` at :559, tqdm at :556); here the ENTIRE loop — cosine mask
schedule, confidence-based remasking, CFG doubled-batch forward, top-k
filter, annealed-temperature gumbel sampling, critic scoring — lives inside
ONE jitted function (BASELINE.json north star), as a few bucket-sized
`lax.scan` segments: the per-step masked count is a static schedule, so the
vocab-sized logits head and the sampler run only on each step's masked
positions (compact decode — token-exact vs a single full-sequence scan,
which remains available via `compact=False`). Dynamic-k operations become
static-shape rank thresholding (`mask_by_topk_scores` / sorted-rank
gathers), cross-attn K/V of the static context are precomputed once, and
all randomness is explicit PRNG keys.

Reference bugs fixed (SURVEY.md §2.4):
  * B1: negative prompting works (`Transformer.forward_with_neg_prompt`);
  * B3: super-res auto-conditioning actually feeds the downsampled image
    through `cond_vae` during training (the reference computed the resize at
    :649-650 and dropped it on the floor);
  * B4: the cascade clamps the base stage's decoder output to [0, 1] before
    conditioning the super-res stage.
"""

from __future__ import annotations

import functools
import weakref
from typing import Callable, List, Optional, Tuple, Union

import chex
import jax
import jax.numpy as jnp
from flax import nnx

from muse_maskgit_pytorch_tpu.models.transformer import (
    MaskGitTransformer,
    SelfCritic,
    TokenCritic,
)
from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE
from muse_maskgit_pytorch_tpu.utils.helpers import default, exists
from muse_maskgit_pytorch_tpu.utils.sampling import (
    cosine_schedule,
    get_mask_subset_prob,
    gumbel_sample,
    mask_by_topk_scores,
    batch_random_mask,
    top_k,
)

Array = jax.Array


class MaskGit(nnx.Module):
    """Reference muse_maskgit_pytorch.py:427-741."""

    def __init__(
        self,
        image_size: int,
        transformer: MaskGitTransformer,
        noise_schedule: Callable = cosine_schedule,
        token_critic: Optional[TokenCritic] = None,
        self_token_critic: bool = False,
        vae: Optional[VQGanVAE] = None,
        cond_vae: Optional[VQGanVAE] = None,
        cond_image_size: Optional[int] = None,
        cond_drop_prob: float = 0.5,
        self_cond_prob: float = 0.9,
        no_mask_token_prob: float = 0.0,
        critic_loss_weight: float = 1.0,
        *,
        rngs: Optional[nnx.Rngs] = None,
    ):
        # frozen eval copy of the tokenizer (reference :445)
        self.vae = nnx.data(vae.copy_for_eval() if exists(vae) else None)
        if exists(cond_vae):
            self.cond_vae = nnx.data(cond_vae.copy_for_eval())
            self.has_separate_cond_vae = True
        else:
            self.cond_vae = nnx.data(self.vae)
            self.has_separate_cond_vae = False

        assert not (
            exists(cond_vae) and not exists(cond_image_size)
        ), "cond_image_size must be specified if conditioning"

        self.image_size = image_size
        self.cond_image_size = cond_image_size
        self.resize_image_for_cond_image = exists(cond_image_size)

        self.cond_drop_prob = cond_drop_prob

        self.transformer = transformer
        self.self_cond = transformer.self_cond
        if exists(self.vae):
            assert (
                self.vae.codebook_size
                == self.cond_vae.codebook_size
                == transformer.num_tokens
            ), "transformer num_tokens must equal the vae codebook size"

        self.mask_id = transformer.mask_id
        self.noise_schedule = noise_schedule

        assert not (self_token_critic and exists(token_critic))
        self.token_critic = nnx.data(token_critic)
        if self_token_critic:
            self.token_critic = SelfCritic(transformer, rngs=default(rngs, lambda: nnx.Rngs(0)))
        self.critic_loss_weight = critic_loss_weight

        self.self_cond_prob = self_cond_prob
        # fraction of [mask]-able tokens kept unmasked so the transformer
        # learns embeddings for unmasked positions too (BERT-style;
        # reference :478-480)
        self.no_mask_token_prob = no_mask_token_prob

    # -- persistence (reference :482-489; embeds the frozen VAE copy) --------

    def save(self, path):
        from muse_maskgit_pytorch_tpu.utils.checkpoint import save_module

        save_module(self, path)

    def load(self, path):
        from muse_maskgit_pytorch_tpu.utils.checkpoint import load_module

        load_module(self, path)

    # -- generation (reference :491-621) --------------------------------------

    def generate(
        self,
        texts: Optional[Union[str, List[str]]] = None,
        rng: Optional[Array] = None,
        *,
        text_embeds: Optional[Array] = None,
        text_mask: Optional[Array] = None,
        negative_texts: Optional[List[str]] = None,
        neg_text_embeds: Optional[Array] = None,
        cond_images: Optional[Array] = None,
        cond_token_ids: Optional[Array] = None,
        fmap_size: Optional[Union[int, Tuple[int, int]]] = None,
        image_size: Optional[Union[int, Tuple[int, int]]] = None,
        temperature: float = 1.0,
        topk_filter_thres: float = 0.9,
        can_remask_prev_masked: bool = False,
        force_not_use_token_critic: bool = False,
        timesteps: int = 18,  # ideal number of steps is 18 (maskgit paper)
        cond_scale: Union[float, tuple, Array] = 3.0,
        critic_noise_scale: float = 1.0,
        return_ids: bool = False,
        attn_impl: str = "auto",
        sampler: str = "auto",
        injected_gumbel_noise: Optional[Array] = None,
        progress: bool = False,
        compact: Union[bool, str] = "auto",
        known_token_ids: Optional[Array] = None,
        known_mask: Optional[Array] = None,
        cfg_fold: bool = True,
        null_fold: bool = True,
    ) -> Array:
        """Text -> images via iterative parallel decode, fully jitted.

        `progress=True` prints a host-side line per decode step via
        `jax.debug.callback` (role of the reference's tqdm bar,
        muse_maskgit_pytorch.py:22,556 — off by default: each callback is a
        host round-trip).

        `compact` ("auto"/bool): segmented compact decode — the vocab-sized
        logits head and the sampler run only on each step's masked positions
        (a static count under the schedule; see `_compact_segments`).
        Token-exact vs the full path (tests/test_compact_decode.py);
        ~+10% img/s at the reference scale on v5e. Auto-disabled when
        `can_remask_prev_masked` needs real confidences at unmasked
        positions without a critic.

        `known_token_ids` + `known_mask` (token grid (b, f, f) or flat
        (b, seq), mask True = KEEP the source token): editing / inpainting
        mode (Muse paper §3 "Inpainting and Editing"). Known positions seed
        the decode with the source tokens, are never remasked, and the mask
        schedule runs over each row's editable count. Requires
        noise_schedule(0) == 1 (both shipped schedules) so step 0 refills
        the whole edit region; compact decode is auto-disabled (per-row
        editable counts are data-dependent, compact segments are static).
        Most callers want the `edit()` wrapper, which handles image
        encoding and pixel→token mask downsampling.

        `cond_scale`: a float (constant guidance, reference behavior), a
        (start, end) tuple — the guidance scale then ramps linearly across
        the decode steps (Muse paper §2.5: low guidance early preserves
        sample diversity, high guidance late sharpens text alignment) — or
        a jax/numpy value, which makes the scale a TRACED input: one
        compiled program serves any guidance value (no recompile per
        setting). Traced shapes: scalar (one scale for the batch), per-step
        (timesteps,), or 2-D (T_or_1, batch) for PER-SAMPLE guidance — each
        row of a coalesced serving batch gets its own scale (requires
        cfg_fold). All forms agree token-exactly at the same value.

        `cfg_fold` (default True): fold the CFG combine into the embeddings
        before the bias-free vocab head — mathematically identical scaled
        logits, but the vocab-65537 head matmul and the sampler's HBM read
        run on HALF the rows. False reproduces the r3 combine order
        (logits-space / in-kernel) bit-exactly.

        `null_fold` (default True): the CFG null half's cross-attention is
        exactly a per-layer constant when no conditioning image tokens are
        attendable (`Attention.null_out`), so the null rows skip
        cross-attention entirely. The null rows' constant is exact; the cond
        half's attention runs at batch b instead of 2b, so logits differ
        from null_fold=False at float-reassociation level and tokens may
        flip on argmax near-ties (agreement >= 0.99 pinned,
        tests/test_null_fold.py). No-op on super-res stages (conditioning
        tokens stay attendable in the null half) and under negative prompts
        (the neg half attends real context).

        `image_size`: generate at a resolution the model was not trained at
        (variable-resolution sampling). The transformer's learned positional
        grid is bilinearly resized to the new latent grid (ViT-style
        resolution transfer, `Transformer._positions`) and the conv VAE
        decodes any grid; must be divisible by the VAE's downsampling
        factor. Equivalent to passing the corresponding `fmap_size`. An
        `(h, w)` tuple generates at a non-square ASPECT RATIO (portrait /
        landscape) — the square positional grid resizes anisotropically to
        the rectangular latent grid; output is (b, h, w, 3)."""
        rng = default(rng, lambda: jax.random.PRNGKey(0))
        if image_size is not None:
            assert fmap_size is None, "pass image_size or fmap_size, not both"
            ih, iw = (
                (int(image_size[0]), int(image_size[1]))
                if isinstance(image_size, (tuple, list))
                else (int(image_size), int(image_size))
            )
            down = self.vae.dim_divisor
            assert ih % down == 0 and iw % down == 0, (
                f"image_size {image_size} must be divisible by the VAE's "
                f"downsampling factor {down}"
            )
            fmap_size = (ih // down, iw // down)
        fmap_size = default(
            fmap_size,
            lambda: self.vae.get_encoded_fmap_size(self.image_size),
        )
        # normalize to an (fh, fw) grid — the static shape the decode
        # compiles for; a plain int stays the square reference behavior
        fmap_hw = (
            (int(fmap_size[0]), int(fmap_size[1]))
            if isinstance(fmap_size, (tuple, list))
            else (int(fmap_size), int(fmap_size))
        )

        if isinstance(texts, str):
            texts = [texts]
        if text_embeds is None:
            assert texts is not None
            text_embeds = self.transformer.encode_text(texts)
        if text_mask is None:
            text_mask = jnp.any(text_embeds != 0, axis=-1)

        if exists(negative_texts) and neg_text_embeds is None:
            assert len(negative_texts) == text_embeds.shape[0]
            neg_text_embeds = self.transformer.encode_text(negative_texts)

        # conditioning tokens: pre-tokenized ids directly (ids-only super-res
        # pipelines; mirrors __call__'s cond_token_ids training input), or a
        # conditioning image through the cond VAE (reference :549-552)
        cond_ids = cond_token_ids
        if self.resize_image_for_cond_image and cond_ids is None:
            assert exists(
                cond_images
            ), "conditioning image (or cond_token_ids) must be passed in for super res maskgit"
            _, cond_ids, _ = self.cond_vae.encode(cond_images, train=False)

        if can_remask_prev_masked:
            # reference :608-611: remasking non-masked positions is only
            # meaningful when trained with no_mask_token_prob > 0
            assert self.no_mask_token_prob > 0.0, (
                "without training with some non-masked tokens forced to "
                "predict, logits for unmasked positions are not meaningful"
            )

        use_token_critic = exists(self.token_critic) and not force_not_use_token_critic

        if injected_gumbel_noise is not None and sampler == "auto":
            # injected noise defaults to the XLA path; sampler="fused" may be
            # forced explicitly to parity-pin the fused kernel itself
            sampler = "xla"
        elif sampler == "auto":
            # the fused Pallas sampler pays off when the top-k filter would
            # otherwise sort a large vocabulary (see ops/sampling_kernel.py)
            sampler = (
                "fused"
                if jax.default_backend() == "tpu"
                and self.transformer.num_tokens >= 8192
                else "xla"
            )

        if known_mask is not None:
            assert known_token_ids is not None, (
                "editing mode needs both known_token_ids and known_mask"
            )
            # step 0 must be able to refill the whole edit region, otherwise
            # leftover mask_id positions get -1e5 scores, are never resampled,
            # and the out-of-codebook mask_id flows into vae.decode_from_ids
            assert _schedule_starts_full(self.noise_schedule), (
                "editing requires noise_schedule(0) == 1 (full remask at step 0)"
            )
            compact = False

        if compact == "auto":
            # compact decode is exact unless unmasked positions need real
            # confidence scores (can_remask with the default scorer); the
            # full-seq critic path is compatible
            compact = timesteps > 1 and (
                use_token_critic or not can_remask_prev_masked
            )
        elif compact and can_remask_prev_masked and not use_token_critic:
            # an explicit compact=True here would silently pin all unmasked
            # scores to -1e5, so previously-unmasked tokens could never be
            # remasked — not what can_remask_prev_masked asks for
            import warnings

            warnings.warn(
                "compact=True is incompatible with can_remask_prev_masked "
                "without a token critic (compact pins unmasked positions' "
                "confidences); forcing compact=False",
                stacklevel=2,
            )
            compact = False

        segments = None
        if compact and timesteps > 1:
            segments = _compact_segments(
                self.noise_schedule, fmap_hw[0] * fmap_hw[1], timesteps
            )

        # traced guidance: a jax/np value (scalar or per-step (T,) array)
        # instead of a python float/tuple makes the scale a program INPUT —
        # one compiled decode serves every guidance value (per-request
        # cond_scale in serving without recompiles). Token-exact with the
        # static path at the same value.
        scale_schedule = None
        if not isinstance(cond_scale, (int, float, tuple)):
            arr = jnp.asarray(cond_scale, jnp.float32)
            assert arr.ndim <= 2, (
                "cond_scale array must be a scalar, (timesteps,) per-step, "
                "or (timesteps_or_1, batch) per-sample"
            )
            if arr.ndim == 2:
                # per-SAMPLE guidance: each batch row has its own scale (the
                # embed-fold combine broadcasts a (b,) vector for free)
                assert cfg_fold, "per-sample cond_scale requires cfg_fold=True"
                assert arr.shape[-1] == text_embeds.shape[0], (
                    f"per-sample cond_scale has {arr.shape[-1]} columns for a "
                    f"batch of {text_embeds.shape[0]}"
                )
                scale_schedule = jnp.broadcast_to(
                    arr, (timesteps, text_embeds.shape[0])
                )
            else:
                scale_schedule = jnp.broadcast_to(arr, (timesteps,))
            cond_scale = "dynamic"

        graphdef, state = nnx.split(self)
        ids, images = _generate_jit(
            graphdef,
            state,
            text_embeds,
            text_mask,
            neg_text_embeds,
            cond_ids,
            rng,
            injected_gumbel_noise,
            known_token_ids,
            known_mask,
            scale_schedule,
            fmap_size=fmap_hw,
            temperature=temperature,
            topk_filter_thres=topk_filter_thres,
            can_remask_prev_masked=can_remask_prev_masked,
            use_token_critic=use_token_critic,
            timesteps=timesteps,
            cond_scale=cond_scale,
            critic_noise_scale=critic_noise_scale,
            attn_impl=attn_impl,
            sampler=sampler,
            progress=progress,
            segments=segments,
            decode_images=not return_ids and exists(self.vae),
            cfg_fold=cfg_fold,
            null_fold=null_fold,
        )
        if return_ids or not exists(self.vae):
            return ids
        return images

    # -- best-of-K re-ranked generation ---------------------------------------

    def score_samples(
        self,
        ids: Array,
        *,
        text_embeds: Array,
        text_mask: Optional[Array] = None,
        method: str = "auto",
        attn_impl: str = "auto",
    ) -> Array:
        """Per-sample quality score (higher = better) for generated token
        grids, used by `generate_reranked`.

        `method`:
          * "critic" — mean P(real) under the trained token critic (one
            critic forward on the finished grid; requires `token_critic` or
            `self_token_critic`).
          * "logprob" — mean token log-likelihood under the generator (one
            unconditional-CFG forward; the standard model-internal re-rank
            proxy when no critic was trained).
          * "auto" — critic if present, else logprob.
        """
        if method == "auto":
            method = "critic" if exists(self.token_critic) else "logprob"
        b = ids.shape[0]
        # a (b, fh, fw) grid carries its own aspect ratio — thread it into
        # the scoring forward so variable/rectangular-resolution candidates
        # score under the same resized positional grid they decoded with
        pos_grid = tuple(ids.shape[1:3]) if ids.ndim == 3 else None
        x = ids.reshape(b, -1)
        if text_mask is None:
            text_mask = jnp.any(text_embeds != 0, axis=-1)
        if method == "critic":
            assert exists(self.token_critic), "no token critic to score with"
            crit = self.token_critic(
                x, text_embeds=text_embeds, text_mask=text_mask, attn_impl=attn_impl,
                pos_grid=pos_grid,
            )
            crit = crit.reshape(b, -1).astype(jnp.float32)
            # critic logit predicts P(token is FAKE) through a sigmoid, so
            # log P(real) = log_sigmoid(-logit); mean over the grid
            return jnp.mean(jax.nn.log_sigmoid(-crit), axis=-1)
        assert method == "logprob", f"unknown score method {method!r}"
        logits = self.transformer(
            x, text_embeds=text_embeds, text_mask=text_mask,
            return_logits=True, attn_impl=attn_impl, pos_grid=pos_grid,
        )
        # gather the token logit BEFORE subtracting the logsumexp: identical
        # per-position math, but never materializes the (b, n, V) f32
        # log_softmax output (see cross_entropy_ignore_index)
        lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
        picked = jnp.take_along_axis(logits, x[..., None], axis=-1)[..., 0]
        return jnp.mean(picked.astype(jnp.float32) - lse, axis=-1)

    def generate_reranked(
        self,
        texts: Optional[Union[str, List[str]]] = None,
        rng: Optional[Array] = None,
        *,
        num_candidates: int = 4,
        score_method: str = "auto",
        text_embeds: Optional[Array] = None,
        text_mask: Optional[Array] = None,
        return_ids: bool = False,
        return_scores: bool = False,
        **generate_kwargs,
    ):
        """Best-of-K sampling: draw `num_candidates` independent samples per
        prompt, score each with the model's own judgment (`score_samples`),
        and keep the best one per prompt.

        The Muse paper re-ranks 16 samples per prompt with CLIP (§2.8); with
        no CLIP weights reachable in this framework's environment the
        re-ranker is model-internal — the trained token critic (exactly what
        it was trained to judge) or the generator's token log-likelihood.
        All K candidates decode in ONE batched jitted program (batch b*K);
        scoring + winner selection + the winners' VAE decode run as a second
        jitted program, so nothing here dispatches eagerly.
        """
        assert num_candidates >= 1
        rng = default(rng, lambda: jax.random.PRNGKey(0))
        if isinstance(texts, str):
            texts = [texts]
        if text_embeds is None:
            assert texts is not None
            text_embeds = self.transformer.encode_text(texts)
        if text_mask is None:
            text_mask = jnp.any(text_embeds != 0, axis=-1)
        assert not self.resize_image_for_cond_image, (
            "generate_reranked targets the base stage (the cascade re-ranks "
            "at the base, then super-reses the winner — see Muse paper §2.8)"
        )
        # per-sample arrays we do not tile to b*K: reject loudly instead of
        # crashing with an opaque shape error inside the decode
        for bad in ("known_token_ids", "known_mask", "injected_gumbel_noise"):
            assert generate_kwargs.get(bad) is None, (
                f"{bad} is per-sample and not supported by generate_reranked; "
                "call generate() and score_samples() directly"
            )
        b, k = text_embeds.shape[0], num_candidates

        # K candidates ride one batched decode: tile prompts
        te = jnp.repeat(text_embeds, k, axis=0)
        tm = jnp.repeat(text_mask, k, axis=0)
        if generate_kwargs.get("neg_text_embeds") is not None:
            generate_kwargs = dict(generate_kwargs)
            generate_kwargs["neg_text_embeds"] = jnp.repeat(
                generate_kwargs["neg_text_embeds"], k, axis=0
            )
        cs = generate_kwargs.get("cond_scale")
        if cs is not None and not isinstance(cs, (int, float, tuple)):
            cs = jnp.asarray(cs, jnp.float32)
            if cs.ndim == 2:
                # per-sample guidance follows its prompt onto all K candidates
                generate_kwargs = dict(generate_kwargs)
                generate_kwargs["cond_scale"] = jnp.repeat(cs, k, axis=1)
        ids = self.generate(
            text_embeds=te, text_mask=tm, rng=rng, return_ids=True,
            **generate_kwargs,
        )
        method = score_method
        if method == "auto":
            method = "critic" if exists(self.token_critic) else "logprob"
        # score + select + winner-decode run as ONE jitted program: eagerly
        # they would be a per-op dispatch storm (a full transformer forward +
        # VAE decode) on remote/tunneled runtimes
        graphdef, state = nnx.split(self)
        winners, best_scores, images = _rerank_select_jit(
            graphdef,
            state,
            ids,
            te,
            tm,
            b=b,
            k=k,
            method=method,
            attn_impl=generate_kwargs.get("attn_impl", "auto"),
            decode=not return_ids and exists(self.vae),
        )

        out = winners if (return_ids or not exists(self.vae)) else images
        if return_scores:
            return out, best_scores
        return out

    # -- editing / inpainting (Muse paper §3; MaskGit paper §4.2-4.3) ---------

    def edit(
        self,
        images: Array,
        edit_mask: Array,
        texts: Optional[Union[str, List[str]]] = None,
        rng: Optional[Array] = None,
        **generate_kwargs,
    ) -> Array:
        """Regenerate only the masked region of `images`, conditioned on the
        text AND the kept source tokens (inpainting; mask the border for
        outpainting; mask everything that should change for mask-free
        editing at a region level).

        `images`: (b, H, W, 3) in [0, 1]. Any (H, W) divisible by the VAE's
        downsampling factor works — editing composes with variable /
        rectangular resolution exactly like generation (the positional grid
        resizes to the source's latent grid; `image_size` is just the
        trained default).
        `edit_mask`: True = REGENERATE. Either pixel-level (b, H, W) — any
        token whose patch overlaps the region is regenerated — or
        token-level (b, fh, fw) on the VAE's latent grid.

        The reference has no editing path (generate always starts from a
        fully masked canvas, muse_maskgit_pytorch.py:507-520); this is the
        capability the Muse paper demonstrates in §3 "Inpainting and
        Editing", expressed over the same decode loop: known tokens seed
        the canvas and are score-pinned so remasking never touches them.
        Accepts every `generate()` knob (cond_scale, critic, sampler, ...).
        """
        assert exists(self.vae), "editing needs the vae to tokenize the source image"
        chex.assert_rank(images, 4)
        H, W = int(images.shape[1]), int(images.shape[2])
        down = self.vae.dim_divisor
        assert H % down == 0 and W % down == 0, (
            f"source images {H}x{W} must be divisible by the VAE's "
            f"downsampling factor {down}"
        )
        fh, fw = H // down, W // down

        _, ids, _ = self.vae.encode(jax.lax.stop_gradient(images), train=False)
        ids = ids.reshape(ids.shape[0], fh, fw)

        edit_mask = jnp.asarray(edit_mask)
        if edit_mask.dtype != jnp.bool_:
            edit_mask = edit_mask > 0.5
        if edit_mask.shape[1:] == (H, W):
            edit_mask = jnp.any(
                edit_mask.reshape(edit_mask.shape[0], fh, down, fw, down),
                axis=(2, 4),
            )
        assert edit_mask.shape[1:] == (fh, fw), (
            f"edit_mask must be (b, {H}, {W}) pixel-level or "
            f"(b, {fh}, {fw}) token-level, got {edit_mask.shape}"
        )

        # super-res stage: condition on the low-res image as usual (callers
        # without an explicit cond image get the source image downsized,
        # same auto-resize contract as training, reference :649-650); a
        # non-native source keeps its aspect ratio through the cond stage
        if self.resize_image_for_cond_image and "cond_images" not in generate_kwargs:
            # the aspect-preserving auto-resize scales the SOURCE down by the
            # model's native ratio, which must be integral — a non-multiple
            # pair (e.g. 512 cond 384) would floor to ratio 1 and condition
            # at the wrong grid (training's auto-resize targets the exact
            # cond_image_size instead, __call__ below)
            assert self.image_size % self.cond_image_size == 0, (
                f"edit()'s auto-resize derives the cond size from the model's "
                f"image_size/cond_image_size ratio, which must be integral "
                f"(got {self.image_size}/{self.cond_image_size}); pass "
                "cond_images explicitly for non-multiple pairs"
            )
            ratio = self.image_size // self.cond_image_size
            assert H % ratio == 0 and W % ratio == 0, (
                f"source {H}x{W} must be divisible by the cascade's "
                f"conditioning ratio {ratio}"
            )
            generate_kwargs["cond_images"] = jax.image.resize(
                images,
                (images.shape[0], H // ratio, W // ratio, images.shape[-1]),
                method="nearest",
            )

        return self.generate(
            texts=texts,
            rng=rng,
            known_token_ids=ids,
            known_mask=~edit_mask,
            fmap_size=(fh, fw),
            **generate_kwargs,
        )

    # -- training objective (reference :623-741) -------------------------------

    def __call__(
        self,
        images_or_ids: Array,
        rng: Array,
        ignore_index: int = -1,
        cond_images: Optional[Array] = None,
        cond_token_ids: Optional[Array] = None,
        texts: Optional[List[str]] = None,
        text_embeds: Optional[Array] = None,
        text_mask: Optional[Array] = None,
        cond_drop_prob: Optional[float] = None,
        train_only_generator: bool = False,
        sample_temperature: Optional[float] = None,
        attn_impl: str = "auto",
    ) -> Array:
        # shape/type validation (the reference's beartype+assert layer,
        # SURVEY.md §5 — here via chex so it also fires under tracing)
        chex.assert_rank(images_or_ids, {2, 3, 4})
        if text_embeds is not None:
            chex.assert_rank(text_embeds, 3)

        # tokenize if needed
        if jnp.issubdtype(images_or_ids.dtype, jnp.floating):
            assert exists(self.vae), "vqgan vae must be passed in to train from raw images"
            # divisible by the VAE's downsampling factor; not necessarily
            # self.image_size (multi-resolution training) and not necessarily
            # square (aspect-bucketed training) — both ride the same
            # positional-grid resize as variable/rectangular-resolution
            # sampling (the grid threads as pos_grid below)
            down = self.vae.dim_divisor
            assert (
                images_or_ids.shape[1] % down == 0
                and images_or_ids.shape[2] % down == 0
            ), (
                f"training images must be divisible by the VAE's "
                f"downsampling factor {down}, got {images_or_ids.shape[1:3]}"
            )
            _, ids, _ = self.vae.encode(
                jax.lax.stop_gradient(images_or_ids), train=False
            )
            images = images_or_ids
        else:
            assert (
                not self.resize_image_for_cond_image or exists(cond_images) or exists(cond_token_ids)
            ), "with auto-resize conditioning, pass raw images (or explicit cond images/ids)"
            ids = images_or_ids
            images = None

        # super-res auto-conditioning (B3 fix: the reference computed this
        # resize and never used it, :649-650)
        if (
            self.resize_image_for_cond_image
            and not exists(cond_images)
            and not exists(cond_token_ids)
        ):
            assert images is not None
            cond_images = jax.image.resize(
                images,
                (images.shape[0], self.cond_image_size, self.cond_image_size, images.shape[-1]),
                method="nearest",
            )

        # a (b, fh, fw) token grid names its own aspect ratio; thread it into
        # the transformer so a non-square batch trains under the same resized
        # positional grid rectangular sampling uses. FLAT (b, seq) input at a
        # non-native length only makes sense when seq is a perfect square
        # (square resolution-transfer): a flat rectangular sequence cannot
        # name its aspect ratio, and _positions' legacy prefix contract would
        # train it silently miscalibrated — reject loudly instead.
        pos_grid = tuple(ids.shape[1:3]) if ids.ndim == 3 else None
        if ids.ndim == 2 and ids.shape[1] != self.transformer.seq_len:
            import math as _math

            assert _math.isqrt(ids.shape[1]) ** 2 == ids.shape[1], (
                f"flat pre-tokenized ids of length {ids.shape[1]} (non-native, "
                f"non-square) cannot infer their token grid — pass 3-D "
                f"(b, fh, fw) ids so positions resize to the right aspect ratio"
            )
        ids = ids.reshape(ids.shape[0], -1)
        batch, seq_len = ids.shape
        cond_drop_prob = default(cond_drop_prob, self.cond_drop_prob)

        assert not (exists(cond_images) and exists(cond_token_ids))
        if exists(cond_images):
            assert exists(self.cond_vae)
            assert cond_images.shape[1] == cond_images.shape[2] == self.cond_image_size
            _, cond_token_ids, _ = self.cond_vae.encode(
                jax.lax.stop_gradient(cond_images), train=False
            )

        (
            k_time,
            k_mask,
            k_nomask,
            k_drop,
            k_selfcond_coin,
            k_sample_t,
            k_sample,
            k_drop_critic,
        ) = jax.random.split(rng, 8)

        # prepare mask (reference :669-686)
        rand_time = jax.random.uniform(k_time, (batch,))
        rand_mask_probs = self.noise_schedule(rand_time)
        num_token_masked = jnp.clip(
            jnp.round(seq_len * rand_mask_probs), min=1
        ).astype(jnp.int32)

        mask = batch_random_mask(k_mask, batch, seq_len, num_token_masked)

        labels = jnp.where(mask, ids, ignore_index)

        if self.no_mask_token_prob > 0.0:
            no_mask_mask = get_mask_subset_prob(k_nomask, mask, self.no_mask_token_prob)
            mask = mask & ~no_mask_mask

        x = jnp.where(mask, self.mask_id, ids)

        # text embeddings (frozen T5)
        if exists(texts):
            text_embeds = self.transformer.encode_text(texts)
        assert exists(text_embeds)
        if text_mask is None:
            text_mask = jnp.any(text_embeds != 0, axis=-1)
        text_embeds = jax.lax.stop_gradient(text_embeds)

        # self conditioning (reference :694-708; the python `random()` coin
        # becomes a traced bernoulli + lax.cond)
        self_cond_embed = None
        if self.transformer.self_cond:
            def with_self_cond(_):
                _, embed = self.transformer(
                    x,
                    text_embeds=text_embeds,
                    text_mask=text_mask,
                    conditioning_token_ids=cond_token_ids,
                    cond_drop_prob=0.0,
                    return_embed=True,
                    attn_impl=attn_impl,
                    pos_grid=pos_grid,
                )
                return jax.lax.stop_gradient(embed)

            def without_self_cond(_):
                return jnp.zeros(
                    (batch, seq_len, self.transformer.dim), self.transformer.dtype
                )

            coin = jax.random.uniform(k_selfcond_coin, ()) < self.self_cond_prob
            self_cond_embed = jax.lax.cond(coin, with_self_cond, without_self_cond, None)

        # masked-token cross entropy (reference :710-721)
        ce_loss, logits = self.transformer(
            x,
            text_embeds=text_embeds,
            text_mask=text_mask,
            self_cond_embed=self_cond_embed,
            conditioning_token_ids=cond_token_ids,
            labels=labels,
            cond_drop_prob=cond_drop_prob,
            ignore_index=ignore_index,
            return_logits=True,
            rng=k_drop,
            attn_impl=attn_impl,
            pos_grid=pos_grid,
        )

        if not exists(self.token_critic) or train_only_generator:
            return ce_loss

        # token critic BCE (reference :723-741)
        temp = default(sample_temperature, lambda: jax.random.uniform(k_sample_t, ()))
        sampled_ids = gumbel_sample(k_sample, logits, temperature=temp)

        critic_input = jnp.where(mask, sampled_ids, x)
        critic_labels = (ids != critic_input).astype(jnp.float32)

        bce_loss = self.token_critic(
            critic_input,
            text_embeds=text_embeds,
            text_mask=text_mask,
            conditioning_token_ids=cond_token_ids,
            labels=critic_labels,
            cond_drop_prob=cond_drop_prob,
            # independent CFG-dropout mask for the critic: the reference draws
            # a fresh bernoulli per forward (muse_maskgit_pytorch.py:308-310)
            rng=k_drop_critic,
            attn_impl=attn_impl,
            pos_grid=pos_grid,
        )
        return ce_loss + self.critic_loss_weight * bce_loss


@functools.partial(
    jax.jit, static_argnames=("b", "k", "method", "attn_impl", "decode")
)
def _rerank_select_jit(graphdef, state, ids, te, tm, *, b, k, method, attn_impl, decode):
    """Score all b*k candidates, pick the per-prompt winner, decode it —
    one compiled program (see `MaskGit.generate_reranked`)."""
    model = nnx.merge(graphdef, state)
    gh, gw = ids.shape[-2], ids.shape[-1]
    scores = model.score_samples(
        ids, text_embeds=te, text_mask=tm, method=method, attn_impl=attn_impl
    ).reshape(b, k)
    best = jnp.argmax(scores, axis=-1)  # (b,)
    winners = jnp.take_along_axis(
        ids.reshape(b, k, gh, gw), best[:, None, None, None], axis=1
    )[:, 0]
    best_scores = jnp.take_along_axis(scores, best[:, None], axis=-1)[:, 0]
    if decode:
        images = jnp.clip(model.vae.decode_from_ids(winners), 0.0, 1.0)
    else:
        images = jnp.zeros((b, 1, 1, 1))
    return winners, best_scores, images


@functools.lru_cache(maxsize=64)
def _schedule_starts_full(noise_schedule) -> bool:
    """schedule(0) >= 1, evaluated once per schedule (the eager device eval
    costs a ~30 ms tunnel round-trip; editing checks this on every call)."""
    with jax.ensure_compile_time_eval():
        return float(noise_schedule(jnp.zeros(()))) >= 1.0


@functools.lru_cache(maxsize=64)
def _compact_segments(noise_schedule, seq_len: int, timesteps: int):
    """Static segment plan for the compact decode path.

    Every position is refilled each decode step, so step i masks exactly
    max(floor(seq * schedule(t_i)), 1) positions — a compile-time constant.
    Bucket the counts at seq/8 granularity (+1 safety margin: the schedule is
    evaluated eagerly here vs traced in the loop; the compact body clamps
    num_token_masked to the bucket, so the margin makes any 1-ulp floor
    disagreement harmless) and merge equal-bucket runs: ~8 compiled step
    bodies instead of 1, and the vocab-sized logits head + sampler shrink
    with the cosine schedule (~34% of their work at T=18; seq/8 measured
    +1.8% img/s over seq/4 on v5e, BASELINE.md).

    One vectorized eager eval + one host fetch, lru-cached per
    (schedule, seq, T): per-step eager eval cost 18 tunnel round-trips
    (~0.5 s) on EVERY generate() call. `ensure_compile_time_eval` keeps the
    plan a host-side constant even when generate() itself is being traced
    (e.g. under `serving.export_pipeline`'s outer jit), where plain jnp ops
    would stage into tracers.
    """
    import numpy as np

    with jax.ensure_compile_time_eval():
        ts = jnp.linspace(0.0, 1.0, timesteps)
        ks = np.asarray(
            jnp.maximum(jnp.floor(noise_schedule(ts) * seq_len), 1).astype(jnp.int32)
        )
    gran = max(1, seq_len // 8)
    buckets = [min(seq_len, -(-(int(k) + 1) // gran) * gran) for k in ks]
    if int(ks[0]) < seq_len:
        # Compactness relies on the invariant that every position is refilled
        # each step, which requires step 0 to mask the WHOLE sequence. Shipped
        # schedules satisfy schedule(0) = 1; for a custom schedule that
        # doesn't, leftover mask_id positions would never be sampled (scores
        # pinned to -1e5) and the out-of-codebook mask_id would flow silently
        # into vae.decode_from_ids. Force step 0 onto the full-sequence body
        # (kb >= seq_len), which refills ALL masked positions and restores the
        # invariant for the compact steps that follow.
        buckets[0] = seq_len
    segs = []
    s = 0
    for i in range(1, timesteps + 1):
        if i == timesteps or buckets[i] != buckets[s]:
            segs.append((s, i, buckets[s]))
            s = i
    return tuple(segs)


# ---------------------------------------------------------------------------
# the jitted decode loop
# ---------------------------------------------------------------------------


def _double_ctx_kv(ctx_kv):
    """Duplicate a per-layer K/V cache along batch for a CFG-doubled forward
    (both halves share context values; only the mask differs)."""
    return [
        (jnp.concatenate([k, k], 0), jnp.concatenate([v, v], 0))
        for k, v in ctx_kv
    ]


@functools.partial(
    jax.jit,
    static_argnames=(
        "graphdef",
        "fmap_size",
        "temperature",
        "topk_filter_thres",
        "can_remask_prev_masked",
        "use_token_critic",
        "timesteps",
        "cond_scale",
        "critic_noise_scale",
        "attn_impl",
        "sampler",
        "progress",
        "segments",
        "decode_images",
        "cfg_fold",
        "null_fold",
    ),
)
def _generate_jit(
    graphdef,
    state,
    text_embeds,
    text_mask,
    neg_text_embeds,
    cond_ids,
    rng,
    injected_gumbel_noise,
    known_ids=None,
    known_mask=None,
    scale_schedule=None,
    *,
    fmap_size,
    temperature,
    topk_filter_thres,
    can_remask_prev_masked,
    use_token_critic,
    timesteps,
    cond_scale,
    critic_noise_scale,
    attn_impl,
    sampler="xla",
    progress=False,
    segments=None,
    decode_images=True,
    cfg_fold=True,
    null_fold=True,
):
    model: MaskGit = nnx.merge(graphdef, state)
    transformer = model.transformer
    mask_id = model.mask_id

    batch = text_embeds.shape[0]
    # fmap_size is (fh, fw) from generate(); rectangular grids ride the same
    # decode — only the positional embedding (pos_grid below) and the final
    # reshape know the aspect ratio (a bare int kept for direct callers)
    fh, fw = (
        fmap_size if isinstance(fmap_size, tuple) else (fmap_size, fmap_size)
    )
    seq_len = fh * fw
    pos_grid = (fh, fw)

    # guidance-scale schedule (Muse paper §2.5: "linearly increase the
    # guidance scale through the decode" — low guidance early for diversity,
    # high late for text alignment; absent from the reference). A (start,
    # end) tuple produces a per-step traced scale riding the scan's xs (the
    # fused sampler takes it via scalar prefetch — one compiled kernel for
    # all steps); a plain float reproduces the constant-scale behavior
    # bit-exactly. The doubled-batch CFG structure is a STATIC decision:
    # scheduled guidance always runs doubled.
    # cond_scale == "dynamic" (static sentinel): the actual scale arrives as
    # the TRACED `scale_schedule` array, so one compiled program serves any
    # guidance value — serving changes cond_scale per call without paying a
    # recompile. Token-exact with the static path at the same value (the
    # (c, c)-tuple equivalence, tests/test_guidance_schedule.py).
    dynamic = cond_scale == "dynamic"
    scheduled = dynamic or isinstance(cond_scale, tuple)
    cfg_on = scheduled or cond_scale != 1
    if dynamic:
        scale_per_step = scale_schedule.astype(jnp.float32)
    elif isinstance(cond_scale, tuple):
        scale_per_step = jnp.linspace(
            float(cond_scale[0]), float(cond_scale[1]), timesteps
        )
    else:
        scale_per_step = jnp.full((timesteps,), float(cond_scale), jnp.float32)

    if exists(neg_text_embeds):
        # the two CFG halves have DIFFERENT contexts here (pos vs neg text),
        # so the per-layer K/V cache carries both, pos rows then neg rows —
        # still projected once per generate instead of once per step per layer
        ctx_kv, (text_embeds, text_mask), (neg_text_embeds, neg_text_mask) = (
            transformer.precompute_context_kv_neg(
                text_embeds=text_embeds,
                neg_text_embeds=neg_text_embeds,
                text_mask=text_mask,
                conditioning_token_ids=cond_ids,
            )
        )
        demask_fn = functools.partial(
            transformer.forward_with_neg_prompt,
            neg_text_embeds=neg_text_embeds,
            neg_text_mask=neg_text_mask,
        )
    else:
        demask_fn = transformer.forward_with_cond_scale
        # the cross-attn context (text ⧺ conditioning tokens) is constant
        # across decode steps: project K/V once, reuse every step. Both CFG
        # halves share the VALUES (only the mask differs), so the cache is
        # computed single and concatenated to the doubled batch.
        ctx_kv = transformer.precompute_context_kv(
            text_embeds=text_embeds, conditioning_token_ids=cond_ids
        )
        if cfg_on:
            ctx_kv = _double_ctx_kv(ctx_kv)

    if use_token_critic:
        critic = model.token_critic
        if exists(neg_text_embeds):
            critic_fn = functools.partial(
                critic.forward_with_neg_prompt,
                neg_text_embeds=neg_text_embeds,
                neg_text_mask=neg_text_mask,
            )
            if isinstance(critic, SelfCritic):
                # shares the generator backbone -> shares its K/V cache
                critic_ctx_kv = ctx_kv
            else:
                critic_ctx_kv, _, _ = critic.precompute_context_kv_neg(
                    text_embeds=text_embeds,
                    neg_text_embeds=neg_text_embeds,
                    text_mask=text_mask,
                    neg_text_mask=neg_text_mask,
                    conditioning_token_ids=cond_ids,
                )
        else:
            critic_fn = critic.forward_with_cond_scale
            if isinstance(critic, SelfCritic):
                critic_ctx_kv = ctx_kv
            else:
                critic_ctx_kv = critic.precompute_context_kv(
                    text_embeds=text_embeds, conditioning_token_ids=cond_ids
                )
                if cfg_on:
                    critic_ctx_kv = _double_ctx_kv(critic_ctx_kv)

    # editing / inpainting (Muse paper §3 "Inpainting and Editing", MaskGit
    # paper §4.2-4.3): positions marked known start from the source tokens,
    # are never remasked (scores pinned to -1e5 so rank selection skips
    # them), and every step's mask budget scales with each row's EDITABLE
    # count instead of seq_len — the schedule runs over the edit region only
    has_known = known_mask is not None
    assert not (has_known and segments is not None), (
        "compact decode is incompatible with editing (per-row editable "
        "counts are data-dependent; generate() forces compact=False)"
    )
    if has_known:
        # coerce to bool: for an int 0/1 mask, bitwise ~ below would compute
        # -2/-1 instead of logical not, making every n_editable negative
        known_mask = known_mask.reshape(batch, seq_len).astype(bool)
        known_ids = known_ids.reshape(batch, seq_len).astype(jnp.int32)
        ids0 = jnp.where(known_mask, known_ids, mask_id)
        scores0 = jnp.where(known_mask, -1e5, 0.0).astype(jnp.float32)
        n_editable = jnp.sum(~known_mask, axis=-1).astype(jnp.int32)  # (b,)
    else:
        ids0 = jnp.full((batch, seq_len), mask_id, jnp.int32)
        scores0 = jnp.zeros((batch, seq_len), jnp.float32)
    self_cond0 = jnp.zeros((batch, seq_len, transformer.dim), transformer.dtype)

    step_keys = jax.random.split(rng, timesteps)
    # reference :556-559: timestep = linspace(0, 1, T), countdown T-1..0
    ts = jnp.linspace(0.0, 1.0, timesteps)
    steps_until_x0 = jnp.arange(timesteps - 1, -1, -1)

    # parity harness: pre-drawn per-step gumbel noise (T, b, seq, vocab)
    # replaces the in-loop jax.random stream so the same noise can drive a
    # torch restatement of the reference loop (SURVEY.md §7 hard part 2)
    has_injected = injected_gumbel_noise is not None
    if not has_injected:
        injected_gumbel_noise = jnp.zeros((timesteps, 1, 1, 1), jnp.float32)

    def step(carry, xs, kb=None):
        """One decode step. kb=None: full-sequence body. kb=int: COMPACT body —
        exactly num_token_masked (<= kb, static bucket) positions are masked
        each step because every position was refilled the step before, so the
        vocab-65536 logits head and the sampler run only on the kb gathered
        candidate positions; results place back through a (b, kb, seq)
        one-hot (masked reductions — 5x cheaper than the double-argsort rank
        plumbing it replaced, r3 A/B in BASELINE.md). Exact equivalence with
        the full body: `lax.top_k(scores, kb)` breaks ties
        lowest-index-first exactly like `mask_by_topk_scores`' stable double
        argsort, and unmasked positions' scores are pinned to -1e5 (or come
        from the full-seq critic) on both paths."""
        ids, scores, self_cond_embed = carry
        t, steps_left, key, g_inj, scale_t = xs
        k_gumbel, k_critic_noise = jax.random.split(key)
        # constant guidance stays a python float (compile-time constant,
        # bit-identical to the pre-schedule behavior); schedules use the
        # per-step traced scalar
        step_scale = scale_t if scheduled else cond_scale

        if progress:
            # host-side progress line (tqdm role); each callback syncs once
            jax.debug.callback(
                lambda left, T=timesteps: print(
                    f"maskgit decode step {T - int(left)}/{T}", flush=True
                ),
                steps_left,
                ordered=False,
            )

        rand_mask_prob = model.noise_schedule(t)
        # reference :559: max(int(p * seq_len), 1) — int() truncates
        num_token_masked = jnp.maximum(
            jnp.floor(rand_mask_prob * seq_len), 1
        ).astype(jnp.int32)

        if kb is None:
            if has_known:
                # edit mode: per-row budget over the editable region only
                # (0 for rows with nothing to edit — those pass through)
                budgets = jnp.minimum(
                    jnp.maximum(
                        jnp.floor(rand_mask_prob * n_editable), 1
                    ).astype(jnp.int32),
                    n_editable,
                )
            else:
                budgets = jnp.full((batch,), num_token_masked)
            # remask the least-confident (highest-score) positions (:561-563),
            # via static-shape rank thresholding instead of dynamic-k topk
            remask = mask_by_topk_scores(scores, budgets)
            x_in = jnp.where(remask, mask_id, ids)
            npos = seq_len
            gather_pos = None
            g_inj_use = g_inj
        else:
            # top-k + one-hot placement — 2D-index scatters serialize on TPU
            # and a full double argsort costs 5x this block (r3 A/B,
            # BASELINE.md): `lax.top_k` finds the kb candidates (ties break
            # lowest-index-first, exactly like `mask_by_topk_scores`' stable
            # double argsort), and a (b, kb, seq) one-hot turns the
            # compact->sequence placements into VPU reductions/MXU dots
            # instead of rank-indexed gathers
            num_token_masked = jnp.minimum(num_token_masked, kb)
            _, cand = jax.lax.top_k(scores, kb)  # (b, kb) descending
            onehot = cand[:, :, None] == jnp.arange(seq_len)[None, None, :]
            selected = jnp.arange(kb)[None, :, None] < num_token_masked  # scalar
            remask = jnp.any(onehot & selected, axis=1)  # (b, seq)
            x_in = jnp.where(remask, mask_id, ids)
            npos = kb
            gather_pos = cand
            g_inj_use = (
                jnp.take_along_axis(g_inj, cand[..., None], axis=1)
                if has_injected
                else g_inj
            )

        # cfg_fold (default): the CFG combine happens on the EMBEDDINGS
        # before the bias-free vocab head — the head matmul and everything
        # downstream (sampler HBM read included) see SINGLE-batch rows.
        # cfg_fold=False keeps the r3 structure: raw doubled logits with the
        # combine fused into the sampling kernel (cfg_pair) or done in XLA.
        fuse_cfg = sampler == "fused" and cfg_on and not cfg_fold
        logits, embed = demask_fn(
            x_in,
            text_embeds=text_embeds,
            text_mask=text_mask,
            self_cond_embed=self_cond_embed if transformer.self_cond else None,
            conditioning_token_ids=cond_ids,
            cond_scale=step_scale,
            return_embed=True,
            return_raw_double=fuse_cfg,
            cfg_fold=cfg_fold,
            null_fold=null_fold,
            attn_impl=attn_impl,
            gather_positions=gather_pos,
            context_kv=ctx_kv,
            pos_grid=pos_grid,
        )
        new_self_cond = (
            embed.astype(self_cond_embed.dtype)
            if transformer.self_cond
            else self_cond_embed
        )

        # temperature annealed to zero (:578)
        temp = temperature * (steps_left.astype(jnp.float32) / timesteps)

        if sampler == "fused":
            # one-pass Pallas kernel: (CFG combine +) top-k threshold +
            # gumbel + argmax + chosen-softmax-prob, logits read from HBM
            # exactly once
            import math as _math

            from muse_maskgit_pytorch_tpu.ops.sampling_kernel import (
                fused_topk_gumbel_sample,
            )

            vocab = logits.shape[-1]
            k = max(_math.ceil((1 - topk_filter_thres) * vocab), 1)
            seed = jax.random.randint(k_gumbel, (), 0, jnp.iinfo(jnp.int32).max)
            rows = (2 * batch if fuse_cfg else batch) * npos
            pred_flat, chosen_flat = fused_topk_gumbel_sample(
                logits.reshape(rows, vocab),
                k,
                temp,
                seed,
                # parity harness: pre-drawn noise overrides the on-core PRNG
                noise=(
                    g_inj_use.reshape(batch * npos, vocab) if has_injected else None
                ),
                # the kernel is TPU Mosaic; CPU runs use the TPU interpreter
                interpret=jax.default_backend() != "tpu",
                cfg_pair=fuse_cfg,
                # with cfg_fold the logits arrive pre-combined (and step_scale
                # may be a per-row vector the kernel's scalar slot can't hold)
                cond_scale=(
                    1.0
                    if not fuse_cfg
                    else (step_scale if scheduled else float(cond_scale))
                ),
            )
            pred_ids = pred_flat.reshape(batch, npos)
            chosen_prob = chosen_flat.reshape(batch, npos)
        elif has_injected:
            filtered_logits = top_k(logits, topk_filter_thres)
            safe_temp = jnp.maximum(temp, 1e-10)
            pred_ids = jnp.argmax(filtered_logits / safe_temp + g_inj_use, axis=-1).astype(
                jnp.int32
            )
            chosen_prob = None
        else:
            filtered_logits = top_k(logits, topk_filter_thres)
            pred_ids = gumbel_sample(k_gumbel, filtered_logits, temperature=temp)
            chosen_prob = None

        if kb is None:
            is_mask = x_in == mask_id
            ids_out = jnp.where(is_mask, pred_ids, x_in)
        else:
            # place back via the one-hot: position j's sample is the compact
            # row whose candidate index is j. Masked integer/f32 REDUCTIONS
            # (not matmuls: TPU f32 dots default to bf16 MXU passes, which
            # would corrupt token ids > 256)
            pred_at_pos = jnp.sum(
                jnp.where(onehot, pred_ids[:, :, None], 0), axis=1
            )
            ids_out = jnp.where(remask, pred_at_pos, ids)

        if use_token_critic:
            critic_logits = critic_fn(
                ids_out,
                text_embeds=text_embeds,
                text_mask=text_mask,
                conditioning_token_ids=cond_ids,
                cond_scale=step_scale,
                cfg_fold=cfg_fold,
                null_fold=null_fold,
                context_kv=critic_ctx_kv,
                pos_grid=pos_grid,
            )
            new_scores = critic_logits[..., 0]
            noise = (
                (jax.random.uniform(k_critic_noise, new_scores.shape) - 0.5)
                * critic_noise_scale
                * (steps_left.astype(jnp.float32) / timesteps)
            )
            new_scores = new_scores + noise
        else:
            if chosen_prob is None:
                probs = jax.nn.softmax(logits, axis=-1)
                chosen_prob = jnp.take_along_axis(
                    probs, pred_ids[..., None], axis=-1
                )[..., 0]
            if kb is None:
                new_scores = 1.0 - chosen_prob
                if not can_remask_prev_masked:
                    new_scores = jnp.where(is_mask, new_scores, -1e5)
            else:
                prob_at_pos = jnp.sum(
                    jnp.where(onehot, chosen_prob[:, :, None], 0.0), axis=1
                )
                new_scores = jnp.where(remask, 1.0 - prob_at_pos, -1e5)

        if has_known:
            # known (source) positions stay un-remaskable through every
            # scoring path (the critic scores the full sequence, and
            # can_remask_prev_masked deliberately skips the -1e5 pinning)
            new_scores = jnp.where(known_mask, -1e5, new_scores)

        return (ids_out, new_scores, new_self_cond), None

    carry = (ids0, scores0, self_cond0)
    xs_all = (ts, steps_until_x0, step_keys, injected_gumbel_noise, scale_per_step)

    if segments is not None:
        # compact decode: one lax.scan per run of equal-bucket steps (plan
        # computed statically in generate() — see there for the derivation)
        for s, e, kb in segments:
            body = functools.partial(step, kb=None if kb >= seq_len else kb)
            xs_seg = jax.tree.map(lambda a: a[s:e], xs_all)
            if e - s == 1:
                carry, _ = body(carry, jax.tree.map(lambda a: a[0], xs_seg))
            else:
                carry, _ = jax.lax.scan(body, carry, xs_seg)
        ids = carry[0]
    else:
        (ids, _, _), _ = jax.lax.scan(step, carry, xs_all)

    ids = ids.reshape(batch, fh, fw)
    if decode_images and exists(model.vae):
        images = model.vae.decode_from_ids(ids)
    else:
        # ids-only callers (return_ids=True: token pipelines, edit scoring,
        # parity tests) skip the VAE decode entirely — it is a returned
        # output, so XLA would otherwise have to compute it (~2 ms/img at
        # the reference dim-256 scale) just to be discarded on the host
        images = jnp.zeros((batch, 1, 1, 1))
    return ids, images


# ---------------------------------------------------------------------------
# Muse cascade (reference :745-791)
# ---------------------------------------------------------------------------


@jax.jit
def _leaves_all_equal(xs, ys):
    return jnp.all(jnp.stack([jnp.array_equal(x, y) for x, y in zip(xs, ys)]))


# verdicts of the (rare) fused value comparison, keyed by the two VAEs'
# object ids — Muse.__call__(cond_via='ids') checks per generate call, and
# without this a separately-restored cascade would pay a full-parameter
# device comparison (plus a host fetch over the tunnel) per image batch.
# Each entry carries weakrefs to the pair so a hit is honored only while
# BOTH originals are alive (id() values can be reused after gc).
_SHARE_VERDICTS: dict = {}


def vaes_share_weights(a, b) -> bool:
    """True iff two VAEs carry the SAME weights — the precondition for
    handing one stage's token ids to the other (`Muse(cond_via='ids')`).

    `MaskGit.__init__` stores `copy_for_eval()` clones, so object identity
    never holds across stages; but `nnx.clone` shares the immutable
    jax.Array leaves, so two clones of one source VAE are recognized by
    leaf identity with zero device work. VAEs restored separately from the
    same checkpoint fall through to a single fused value comparison (one
    jitted program, one host fetch — not one RPC per leaf, which over the
    axon tunnel would cost ~30 ms each); its verdict is memoized so
    repeated calls on the same pair stay free."""
    if a is None or b is None:
        return a is b
    if a is b:
        return True
    la = jax.tree.leaves(nnx.state(a))
    lb = jax.tree.leaves(nnx.state(b))
    if len(la) != len(lb):
        return False
    if all(x is y for x, y in zip(la, lb)):
        return True
    if any(
        getattr(x, "shape", None) != getattr(y, "shape", None)
        or getattr(x, "dtype", None) != getattr(y, "dtype", None)
        for x, y in zip(la, lb)
    ):
        return False
    key = (id(a), id(b))
    hit = _SHARE_VERDICTS.get(key)
    if hit is not None:
        ref_a, ref_b, verdict = hit
        if ref_a() is a and ref_b() is b:
            return verdict
    verdict = bool(_leaves_all_equal(tuple(la), tuple(lb)))
    # evict entries whose VAEs were collected (a long-lived process that
    # churns pipelines would otherwise grow the cache without bound)
    dead = [k for k, (ra, rb, _) in _SHARE_VERDICTS.items() if ra() is None or rb() is None]
    for k in dead:
        del _SHARE_VERDICTS[k]
    _SHARE_VERDICTS[key] = (weakref.ref(a), weakref.ref(b), verdict)
    return verdict


class Muse(nnx.Module):
    """base 256px MaskGit -> super-res 512px MaskGit -> (optionally) PIL."""

    def __init__(self, base: MaskGit, superres: MaskGit):
        self.base_maskgit = base
        assert superres.resize_image_for_cond_image
        # the cascade's upscaling ratio must be integral: variable-resolution
        # generation and editing derive the super-res output size as
        # base_size * ratio, and a non-multiple pair (e.g. 256 -> 384) would
        # silently floor to ratio 1 instead of erroring
        assert superres.image_size % base.image_size == 0, (
            f"super-res image_size {superres.image_size} must be an exact "
            f"multiple of the base stage's {base.image_size}"
        )
        self.superres_maskgit = superres

    def __call__(
        self,
        texts: List[str],
        rng: Optional[Array] = None,
        cond_scale: float = 3.0,
        temperature: float = 1.0,
        timesteps: int = 18,
        superres_timesteps: Optional[int] = None,
        return_lowres: bool = False,
        return_pil_images: bool = True,
        attn_impl: str = "auto",
        rerank_candidates: int = 1,
        rerank_score: str = "auto",
        image_size: Optional[Union[int, Tuple[int, int]]] = None,
        cond_via: str = "pixels",
    ):
        """`rerank_candidates > 1` re-ranks at the BASE stage (Muse paper
        §2.8 does the same with CLIP over 16 base samples): K candidates per
        prompt decode in one batched program, the best by `rerank_score`
        (critic / token log-likelihood, see `MaskGit.score_samples`) goes on
        to super-resolution — the expensive seq-1024 stage runs once per
        prompt, not per candidate.

        `image_size`: BASE-stage output resolution (int or (h, w) for a
        non-square aspect ratio); the super-res stage scales it by the
        cascade's trained upscaling ratio. Both stages ride the
        variable-resolution positional-grid resize (`MaskGit.generate`).

        `cond_via`: how the base stage's output conditions the super-res
        stage. "pixels" (default — the reference's inter-stage contract,
        muse_maskgit_pytorch.py:769-779): decode the base tokens to a
        low-res image, clamp, and let the super-res stage re-encode it
        through its cond VAE. "ids": hand the base stage's token grid to
        the super-res decode DIRECTLY — valid only when the super-res
        stage's cond VAE IS the base stage's VAE (shared codebook), where
        it is both faster (skips a full VAE decode + encode per batch) and
        strictly more faithful: `encode(decode(ids))` is not the identity,
        so the pixel round trip hands the super-res stage a corrupted copy
        of the tokens the base stage actually chose. Token-exactness of the
        ids entry point vs the encoded-pixels one is pinned by
        tests/test_maskgit.py::test_superres_generate_cond_token_ids_matches_cond_images.
        `return_lowres` still works under "ids" (the low-res decode then
        runs only because you asked for the images)."""
        # ValueError, not assert: user-input validation must survive python -O
        # (a wrong-codebook ids handoff would silently produce garbage images)
        if cond_via not in ("pixels", "ids"):
            raise ValueError(f"cond_via must be 'pixels' or 'ids', got {cond_via!r}")
        if cond_via == "ids" and not vaes_share_weights(
            self.superres_maskgit.cond_vae, self.base_maskgit.vae
        ):
            raise ValueError(
                "cond_via='ids' requires the cascade stages to share one VAE "
                "(the super-res cond codebook must be the base stage's); "
                "this cascade's differ — use cond_via='pixels'"
            )
        rng = default(rng, lambda: jax.random.PRNGKey(0))
        k_base, k_sr = jax.random.split(rng)

        sr_size = None
        if image_size is not None:
            bh, bw = (
                (int(image_size[0]), int(image_size[1]))
                if isinstance(image_size, (tuple, list))
                else (int(image_size), int(image_size))
            )
            ratio = self.superres_maskgit.image_size // self.base_maskgit.image_size
            sr_size = (bh * ratio, bw * ratio)
            image_size = (bh, bw)

        via_ids = cond_via == "ids"
        if rerank_candidates > 1:
            base_out = self.base_maskgit.generate_reranked(
                texts=texts,
                rng=k_base,
                num_candidates=rerank_candidates,
                score_method=rerank_score,
                cond_scale=cond_scale,
                temperature=temperature,
                timesteps=timesteps,
                attn_impl=attn_impl,
                image_size=image_size,
                return_ids=via_ids,
            )
        else:
            base_out = self.base_maskgit.generate(
                texts=texts,
                rng=k_base,
                cond_scale=cond_scale,
                temperature=temperature,
                timesteps=timesteps,
                attn_impl=attn_impl,
                image_size=image_size,
                return_ids=via_ids,
            )
        if via_ids:
            lowres_image = None
            sr_cond = dict(cond_token_ids=base_out)
        else:
            # B4 fix: clamp decoder output before it conditions the next stage
            lowres_image = jnp.clip(base_out, 0.0, 1.0)
            sr_cond = dict(cond_images=lowres_image)

        superres_image = self.superres_maskgit.generate(
            texts=texts,
            rng=k_sr,
            cond_scale=cond_scale,
            temperature=temperature,
            timesteps=default(superres_timesteps, timesteps),
            attn_impl=attn_impl,
            image_size=sr_size,
            **sr_cond,
        )
        superres_image = jnp.clip(superres_image, 0.0, 1.0)

        if via_ids and return_lowres:
            lowres_image = jnp.clip(
                self.base_maskgit.vae.decode_from_ids(base_out), 0.0, 1.0
            )

        if return_pil_images:
            from muse_maskgit_pytorch_tpu.training.data import to_pil_images

            superres_image = to_pil_images(superres_image)
            if return_lowres:
                lowres_image = to_pil_images(lowres_image)

        if not return_lowres:
            return superres_image
        return superres_image, lowres_image

    def edit(
        self,
        images: Array,
        edit_mask: Array,
        texts: Optional[List[str]] = None,
        rng: Optional[Array] = None,
        cond_scale: float = 3.0,
        temperature: float = 1.0,
        timesteps: int = 18,
        superres_timesteps: Optional[int] = None,
        return_pil_images: bool = True,
        attn_impl: str = "auto",
        text_embeds: Optional[Array] = None,
        text_mask: Optional[Array] = None,
        neg_text_embeds: Optional[Array] = None,
    ):
        """Cascade editing (Muse paper §3): edit the region at the base
        resolution, then edit the SAME region of the original high-res image
        with the edited low-res result as super-res conditioning — tokens
        outside the region keep the source image's detail at both stages.

        `images`: (b, H, W, 3) at the super-res stage's resolution — any
        (H, W) divisible by the cascade ratio and both stages' VAE
        downsampling factors works (rectangular editing rides the same
        positional-grid resize as rectangular generation).
        `edit_mask`: True = regenerate; pixel-level (b, H, W) at super-res
        resolution (downsampled per stage) or token-level per-stage masks
        are NOT accepted here — use the per-stage `MaskGit.edit` for that.
        """
        rng = default(rng, lambda: jax.random.PRNGKey(0))
        k_base, k_sr = jax.random.split(rng)
        sr = self.superres_maskgit
        base = self.base_maskgit
        H, W = int(images.shape[1]), int(images.shape[2])
        ratio = sr.image_size // base.image_size
        assert H % ratio == 0 and W % ratio == 0, (
            f"source {H}x{W} must be divisible by the cascade ratio {ratio}"
        )
        bh, bw = H // ratio, W // ratio

        edit_mask = jnp.asarray(edit_mask)
        if edit_mask.dtype != jnp.bool_:
            edit_mask = edit_mask > 0.5
        chex.assert_rank(edit_mask, 3)
        assert edit_mask.shape[1:] == (H, W), (
            f"edit_mask must match the source images' resolution "
            f"({H}, {W}), got {edit_mask.shape[1:]}"
        )

        lowres_src = jax.image.resize(
            images, (images.shape[0], bh, bw, images.shape[-1]), method="nearest"
        )
        # a base-resolution pixel is edited if any high-res pixel it covers is
        lowres_mask = jnp.any(
            edit_mask.reshape(edit_mask.shape[0], bh, ratio, bw, ratio),
            axis=(2, 4),
        )

        # serving paths pass precomputed fixed-length embeddings; encode once
        # here instead of once per stage — but only when both stages read the
        # same encoder's embeddings (a cascade may pair different T5 sizes,
        # in which case each stage must encode with its own)
        shared_encoder = (
            base.transformer.t5_name == sr.transformer.t5_name
            and base.transformer.text_embed_dim == sr.transformer.text_embed_dim
        )
        sr_text_embeds, sr_text_mask = text_embeds, text_mask
        if text_embeds is None:
            assert texts is not None
            text_embeds = base.transformer.encode_text(texts)
            sr_text_embeds = (
                text_embeds if shared_encoder else sr.transformer.encode_text(texts)
            )
        if text_mask is None:
            text_mask = jnp.any(text_embeds != 0, axis=-1)
        if sr_text_mask is None:
            sr_text_mask = jnp.any(sr_text_embeds != 0, axis=-1)
        if neg_text_embeds is not None:
            # a single negative-embedding batch feeds both stages' CFG, so
            # the stages must share a text encoder (serving always does)
            assert shared_encoder, (
                "neg_text_embeds requires both cascade stages to use the "
                "same text encoder; encode per stage and call MaskGit.edit "
                "directly otherwise"
            )

        lowres_edited = base.edit(
            lowres_src,
            lowres_mask,
            rng=k_base,
            text_embeds=text_embeds,
            text_mask=text_mask,
            neg_text_embeds=neg_text_embeds,
            cond_scale=cond_scale,
            temperature=temperature,
            timesteps=timesteps,
            attn_impl=attn_impl,
        )
        lowres_edited = jnp.clip(lowres_edited, 0.0, 1.0)

        superres_image = sr.edit(
            images,
            edit_mask,
            rng=k_sr,
            text_embeds=sr_text_embeds,
            text_mask=sr_text_mask,
            neg_text_embeds=neg_text_embeds,
            cond_scale=cond_scale,
            cond_images=lowres_edited,
            temperature=temperature,
            timesteps=default(superres_timesteps, timesteps),
            attn_impl=attn_impl,
        )
        superres_image = jnp.clip(superres_image, 0.0, 1.0)

        if return_pil_images:
            from muse_maskgit_pytorch_tpu.training.data import to_pil_images

            return to_pil_images(superres_image)
        return superres_image
