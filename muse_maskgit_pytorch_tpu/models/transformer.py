"""MaskGit transformer backbone + task heads + classifier-free guidance.

TPU-native rebuild of `/root/reference/muse_maskgit_pytorch/
muse_maskgit_pytorch.py:63-386`:

  * bias-free LayerNorm (:63-70), GEGLU FeedForward with inner dim
    `dim * mult * 2/3` (:79-89);
  * Attention with one learned null-KV pair per head (so CFG-dropped context
    still has something to attend to, :116,145-149), qk l2-norm with learned
    per-dim scales and fixed softmax scale 8 (:121-122,151-153), running on
    this framework's Pallas flash kernel (`ops/attention.py`);
  * `Transformer` task head: token + learned positional embeddings, text
    projection, optional self-conditioning, CE/BCE losses (:199-348);
  * classifier-free guidance: unlike the reference's two sequential forwards
    (:240-259), `forward_with_cond_scale` folds the cond and null passes into
    ONE doubled-batch forward — on TPU this keeps the MXU fed and halves the
    number of kernel launches in the decode loop. Because `to_logits` is
    bias-free (reference :225) and the CFG combine is linear, the combine
    happens on the EMBEDDINGS (dim d) before the vocab head by default
    (`cfg_fold`): one head matmul on b rows instead of 2b, and single-batch
    logits downstream — mathematically identical scaled logits, and the
    guidance scale can be a per-ROW vector for free;
  * `forward_with_neg_prompt` is the reference's broken negative prompting
    (:261-277 references undefined variables — SURVEY.md §2.4 B1) built
    working: the "null" pass is replaced by a negative-text pass;
  * `MaskGitTransformer` / `TokenCritic` / `SelfCritic` specializations
    (:352-386).

All randomness (CFG context dropout) uses explicit PRNG keys.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from muse_maskgit_pytorch_tpu.ops.attention import attend, qknorm_attend
from muse_maskgit_pytorch_tpu.utils.helpers import default, exists

Array = jax.Array


def l2norm(t: Array, eps: float = 1e-12) -> Array:
    return t * jax.lax.rsqrt(jnp.sum(jnp.square(t), axis=-1, keepdims=True) + eps)


def _pad_text_to(t: Array, mask: Array, L: int):
    """Right-pad (b, n, d) embeds + (b, n) mask to text length L (padding
    positions masked out)."""
    pad = L - t.shape[1]
    if pad == 0:
        return t, mask
    return (
        jnp.pad(t, ((0, 0), (0, pad), (0, 0))),
        jnp.pad(mask, ((0, 0), (0, pad)), constant_values=False),
    )


class LayerNorm(nnx.Module):
    """Gamma-only LayerNorm (reference muse_maskgit_pytorch.py:63-70)."""

    def __init__(self, dim: int, *, rngs: nnx.Rngs):
        self.gamma = nnx.Param(jnp.ones((dim,)))

    def __call__(self, x: Array) -> Array:
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        normed = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        return (normed * self.gamma[...]).astype(x.dtype)


class FeedForward(nnx.Module):
    """LN -> Linear -> GEGLU -> LN -> Linear (reference :72-89)."""

    def __init__(self, dim: int, mult: float = 4, dtype=jnp.float32, *, rngs: nnx.Rngs):
        inner_dim = int(dim * mult * 2 / 3)
        self.norm = LayerNorm(dim, rngs=rngs)
        self.proj_in = nnx.Linear(dim, inner_dim * 2, use_bias=False, dtype=dtype, rngs=rngs)
        self.norm_inner = LayerNorm(inner_dim, rngs=rngs)
        self.proj_out = nnx.Linear(inner_dim, dim, use_bias=False, dtype=dtype, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        x = self.norm(x)
        x, gate = jnp.split(self.proj_in(x), 2, axis=-1)
        x = gate * jax.nn.gelu(x, approximate=False)  # GEGLU (erf gelu, as torch F.gelu)
        x = self.norm_inner(x)
        return self.proj_out(x)


class Attention(nnx.Module):
    """qk-l2norm attention with null KV (reference :91-162)."""

    def __init__(
        self,
        dim: int,
        dim_head: int = 64,
        heads: int = 8,
        cross_attend: bool = False,
        scale: float = 8.0,
        flash: bool = True,
        dtype=jnp.float32,
        *,
        rngs: nnx.Rngs,
    ):
        self.scale = scale
        self.heads = heads
        self.dim_head = dim_head
        self.cross_attend = cross_attend
        self.flash = flash
        self.dtype = dtype
        inner_dim = dim_head * heads

        self.norm = LayerNorm(dim, rngs=rngs)
        self.null_kv = nnx.Param(
            jax.random.normal(rngs.params(), (2, heads, 1, dim_head))
        )
        self.to_q = nnx.Linear(dim, inner_dim, use_bias=False, dtype=dtype, rngs=rngs)
        self.to_kv = nnx.Linear(dim, inner_dim * 2, use_bias=False, dtype=dtype, rngs=rngs)
        self.q_scale = nnx.Param(jnp.ones((dim_head,)))
        self.k_scale = nnx.Param(jnp.ones((dim_head,)))
        self.to_out = nnx.Linear(inner_dim, dim, use_bias=False, dtype=dtype, rngs=rngs)

    def null_out(self) -> Array:
        """(1, 1, dim) cross-attention output of a query whose context is
        FULLY masked.

        With every context position masked out, the softmax over
        {null KV ⧺ masked context} is exactly one-hot on the null position
        (the -1e30 mask bias underflows to 0 under exp in f32 and bf16), so
        the attention output is `to_out(null_v)` — a CONSTANT independent of
        the query and of the hidden states. The CFG null half of a
        doubled-batch forward therefore needs no cross-attention at all
        (`TransformerBlocks(null_rows=...)`): per decode step this removes
        the q/out projections and the attention itself for half the trunk's
        rows. Exact for the null rows themselves (same constant either way);
        the cond half agrees to float tolerance since its attention runs at
        batch b instead of 2b (tests/test_null_fold.py)."""
        nv = self.null_kv[...][1]  # (heads, 1, dim_head)
        v = nv.reshape(1, 1, self.heads * self.dim_head)
        return self.to_out(v.astype(self.dtype))

    def compute_kv(self, kv_input: Array):
        """Raw K/V projections of a (static) context, for caching across a
        decode scan: the cross-attention context never changes between steps,
        so `to_kv` runs once per generate instead of once per step."""
        k, v = jnp.split(self.to_kv(kv_input), 2, axis=-1)
        return k, v

    def __call__(
        self,
        x: Array,
        context: Optional[Array] = None,
        context_mask: Optional[Array] = None,
        impl: str = "auto",
        cached_kv=None,
    ) -> Array:
        assert not ((exists(context) or exists(cached_kv)) ^ self.cross_attend)
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head

        x = self.norm(x)
        if exists(cached_kv):
            k_raw, v_raw = cached_kv
            m = k_raw.shape[1]
        else:
            kv_input = context if self.cross_attend else x
            m = kv_input.shape[1]

        if impl == "auto":
            # the fused qk-norm kernel (norm + scales + null-KV + softmax in
            # ONE pallas_call over the raw projections, all heads + several
            # batch rows per program) cut the r1 integration overhead ~6x and
            # now WINS end-to-end at the super-res shapes (kv 1025/1281:
            # 10.48 vs 10.18 img/s) — both attention shapes of the cascade's
            # second stage run it. At the base stage's short kv (257/321)
            # XLA's attention emitter is still ~5% faster end-to-end
            # (BASELINE.md r2 A/B); dispatch on measured crossover kv ~768.
            impl = (
                "flash"
                if (self.flash and jax.default_backend() == "tpu" and m >= 768)
                else "xla"
            )

        if not exists(cached_kv):
            k_raw, v_raw = self.compute_kv(kv_input)

        if impl == "flash":
            # fused path: raw (b, n|m, h, d) projections straight into the
            # kernel; everything else happens in VMEM (ops/attention.py)
            q = self.to_q(x).reshape(b, n, h, d)
            k = k_raw.reshape(b, m, h, d)
            v = v_raw.reshape(b, m, h, d)
            null_kv = self.null_kv[...]
            out = qknorm_attend(
                q,
                k,
                v,
                null_k=null_kv[0, :, 0, :].astype(k.dtype),
                null_v=null_kv[1, :, 0, :].astype(v.dtype),
                q_scale=self.q_scale[...],
                k_scale=self.k_scale[...],
                mask=context_mask,
                scale=self.scale,
                impl="flash",
            )
            return self.to_out(out.reshape(b, n, h * d))

        q = self.to_q(x).reshape(b, n, h, d).transpose(0, 2, 1, 3)
        k = k_raw.reshape(b, m, h, d).transpose(0, 2, 1, 3)
        v = v_raw.reshape(b, m, h, d).transpose(0, 2, 1, 3)

        nk, nv = self.null_kv[...].astype(k.dtype)
        nk = jnp.broadcast_to(nk, (b, h, 1, d))
        nv = jnp.broadcast_to(nv, (b, h, 1, d))
        k = jnp.concatenate([nk, k], axis=2)
        v = jnp.concatenate([nv, v], axis=2)

        q = l2norm(q) * self.q_scale[...].astype(q.dtype)
        k = l2norm(k) * self.k_scale[...].astype(k.dtype)

        mask = None
        if exists(context_mask):
            # null-KV position is always attendable (reference :155-157)
            mask = jnp.pad(context_mask, ((0, 0), (1, 0)), constant_values=True)

        out = attend(q, k, v, mask=mask, scale=self.scale, impl=impl)

        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return self.to_out(out)


class TransformerBlocks(nnx.Module):
    """depth x (self-attn -> cross-attn -> FF), final LN (reference :164-195)."""

    def __init__(
        self,
        *,
        dim: int,
        depth: int,
        dim_head: int = 64,
        heads: int = 8,
        ff_mult: float = 4,
        flash: bool = True,
        dtype=jnp.float32,
        remat: bool = False,
        rngs: nnx.Rngs,
    ):
        # remat: rematerialize each block's activations on the backward pass
        # (jax.checkpoint) — trades ~30% extra forward FLOPs for O(depth) less
        # activation memory when training large configs
        self.remat = remat
        layers = []
        for _ in range(depth):
            layers.append(
                nnx.List(
                    [
                        Attention(dim, dim_head=dim_head, heads=heads, flash=flash, dtype=dtype, rngs=rngs),
                        Attention(
                            dim,
                            dim_head=dim_head,
                            heads=heads,
                            cross_attend=True,
                            flash=flash,
                            dtype=dtype,
                            rngs=rngs,
                        ),
                        FeedForward(dim, mult=ff_mult, dtype=dtype, rngs=rngs),
                    ]
                )
            )
        self.layers = nnx.List(layers)
        self.norm = LayerNorm(dim, rngs=rngs)

    def __call__(
        self,
        x: Array,
        context: Optional[Array] = None,
        context_mask: Optional[Array] = None,
        impl: str = "auto",
        context_kv=None,
        null_rows: int = 0,
    ) -> Array:
        """`null_rows` (static): the LAST `null_rows` batch rows have a fully
        masked context (the CFG null half of a doubled batch). Their
        cross-attention output is the per-layer constant `Attention.null_out`
        — see there — so attention (and its q/out projections) runs only on
        the leading rows; the null rows just add the constant. Exact for the
        null rows; the leading rows agree to float-reassociation tolerance
        (batch-b vs batch-2b tiling; tests/test_null_fold.py)."""
        nr = int(null_rows)
        for i, (attn, cross_attn, ff) in enumerate(self.layers):
            kv_i = context_kv[i] if context_kv is not None else None

            def layer(x, context, context_mask, kv_i, attn=attn, cross_attn=cross_attn, ff=ff):
                x = attn(x, impl=impl) + x
                if nr:
                    b = x.shape[0] - nr
                    xc = cross_attn(
                        x[:b],
                        context=context[:b] if context is not None else None,
                        context_mask=(
                            context_mask[:b] if context_mask is not None else None
                        ),
                        impl=impl,
                        cached_kv=(
                            (kv_i[0][:b], kv_i[1][:b]) if kv_i is not None else None
                        ),
                    ) + x[:b]
                    xn = x[b:] + cross_attn.null_out().astype(x.dtype)
                    x = jnp.concatenate([xc, xn], axis=0)
                else:
                    x = cross_attn(
                        x, context=context, context_mask=context_mask, impl=impl,
                        cached_kv=kv_i,
                    ) + x
                return ff(x) + x

            if self.remat:
                layer = jax.checkpoint(layer)
            x = layer(x, context, context_mask, kv_i)
        return self.norm(x)

    def compute_context_kv(self, context: Array):
        """Per-layer cross-attention K/V of a static context (decode-scan
        cache; see Attention.compute_kv)."""
        return [layer[1].compute_kv(context) for layer in self.layers]


class Transformer(nnx.Module):
    """Token transformer with T5 text conditioning (reference :199-348)."""

    def __init__(
        self,
        *,
        num_tokens: int,
        dim: int,
        seq_len: int,
        seq_hw: Optional[tuple] = None,
        dim_out: Optional[int] = None,
        t5_name: Optional[str] = None,
        text_embed_dim: Optional[int] = None,
        self_cond: bool = False,
        add_mask_id: bool = False,
        dtype=jnp.float32,
        rngs: nnx.Rngs,
        **kwargs,
    ):
        from muse_maskgit_pytorch_tpu.models.t5 import DEFAULT_T5_NAME, get_encoded_dim

        t5_name = default(t5_name, DEFAULT_T5_NAME)

        self.dim = dim
        self.mask_id = num_tokens if add_mask_id else None
        self.num_tokens = num_tokens
        self.seq_len = seq_len
        # the trained token grid: defaults to square when seq_len is a
        # perfect square; a natively NON-square model must name its (h, w)
        # here or explicit pos_grid calls cannot validate orientation
        if seq_hw is not None:
            assert seq_hw[0] * seq_hw[1] == seq_len, (
                f"seq_hw {seq_hw} does not tile seq_len {seq_len}"
            )
            self.seq_hw = (int(seq_hw[0]), int(seq_hw[1]))
        else:
            f = math.isqrt(seq_len)
            self.seq_hw = (f, f) if f * f == seq_len else None
        self.dtype = dtype
        self.t5_name = t5_name

        self.token_emb = nnx.Embed(num_tokens + int(add_mask_id), dim, rngs=rngs)
        self.pos_emb = nnx.Embed(seq_len, dim, rngs=rngs)

        self.transformer_blocks = TransformerBlocks(dim=dim, dtype=dtype, rngs=rngs, **kwargs)
        self.norm = LayerNorm(dim, rngs=rngs)

        self.dim_out = default(dim_out, num_tokens)
        self.to_logits = nnx.Linear(dim, self.dim_out, use_bias=False, dtype=dtype, rngs=rngs)

        text_embed_dim = default(text_embed_dim, lambda: get_encoded_dim(t5_name))
        self.text_embed_dim = text_embed_dim
        self.text_embed_proj = (
            nnx.Linear(text_embed_dim, dim, use_bias=False, dtype=dtype, rngs=rngs)
            if text_embed_dim != dim
            else None
        )

        self.self_cond = self_cond
        self.self_cond_to_init_embed = FeedForward(dim, dtype=dtype, rngs=rngs)

    # -- positions -----------------------------------------------------------

    def _positions(self, n: int, grid: Optional[tuple] = None) -> Array:
        """(n, dim) absolute positional embeddings.

        At the trained length this is the learned table (reference :218,
        :321). For a DIFFERENT square token grid — variable-resolution
        sampling: a model trained at f x f generating a g x g latent —
        the trained f x f grid is bilinearly resized to g x g, the standard
        learned-abs-pos-emb resolution transfer (as in ViT fine-tuning).

        `grid=(gh, gw)` names the target grid EXPLICITLY, which also unlocks
        non-square (portrait/landscape) grids: a flat length n cannot
        identify its aspect ratio (192 tokens is 12x16 or 16x12), so
        rectangular callers must say which. Requires the trained table to be
        square. Without `grid`, non-square lengths keep the legacy prefix
        contract (n <= seq_len).
        """
        if grid is not None:
            gh, gw = int(grid[0]), int(grid[1])
            assert gh * gw == n, f"pos grid {grid} does not tile length {n}"
            f = math.isqrt(self.seq_len)
            if n == self.seq_len and f * f != self.seq_len:
                # natively NON-square table: the trained row-major layout is
                # the ONLY valid grid — a transposed-orientation caller (e.g.
                # (4,3) on a (3,4)-trained model) would silently get a wrong
                # positional layout, so the named grid must match `seq_hw`.
                assert self.seq_hw is not None and (gh, gw) == self.seq_hw, (
                    f"pos grid {grid} does not match the trained grid "
                    f"{self.seq_hw} of this non-square model (set seq_hw at "
                    "construction to name the trained orientation)"
                )
                return self.pos_emb(jnp.arange(n))
            if n == self.seq_len and (gh, gw) == (f, f):
                # native length at the native grid — the learned table as-is
                return self.pos_emb(jnp.arange(n))
            assert f * f == self.seq_len, (
                "explicit pos_grid transfer needs a square trained table, "
                f"got seq_len {self.seq_len}"
            )
            table = self.pos_emb(jnp.arange(self.seq_len))
            sq = table.reshape(f, f, self.dim).astype(jnp.float32)
            out = jax.image.resize(sq, (gh, gw, self.dim), method="bilinear")
            return out.reshape(n, self.dim).astype(table.dtype)
        if n == self.seq_len:
            return self.pos_emb(jnp.arange(n))
        f, g = math.isqrt(self.seq_len), math.isqrt(n)
        if f * f == self.seq_len and g * g == n:
            table = self.pos_emb(jnp.arange(self.seq_len))
            grid_sq = table.reshape(f, f, self.dim).astype(jnp.float32)
            out = jax.image.resize(grid_sq, (g, g, self.dim), method="bilinear")
            return out.reshape(n, self.dim).astype(table.dtype)
        assert n <= self.seq_len, (
            f"sequence length {n} exceeds the trained {self.seq_len} and is "
            "not a square grid (only square grids support resolution transfer)"
        )
        return self.pos_emb(jnp.arange(n))

    # -- text encoding (frozen T5, reference :229-233) -----------------------

    def encode_text(self, texts) -> Array:
        from muse_maskgit_pytorch_tpu.models.t5 import t5_encode_text

        return t5_encode_text(texts, name=self.t5_name)

    def precompute_context_kv(
        self,
        *,
        text_embeds: Array,
        conditioning_token_ids: Optional[Array] = None,
    ):
        """Per-layer cross-attention K/V of the static generate context
        (projected text ⧺ conditioning-token embeddings). The decode scan's
        context never changes between steps, so these projections run once
        per generate instead of once per step per layer."""
        b = text_embeds.shape[0]
        context = (
            self.text_embed_proj(text_embeds)
            if exists(self.text_embed_proj)
            else text_embeds
        )
        context = context.astype(self.dtype)
        if exists(conditioning_token_ids):
            cond_ids = conditioning_token_ids.reshape(b, -1)
            cond_token_emb = self.token_emb(cond_ids).astype(self.dtype)
            context = jnp.concatenate([context, cond_token_emb], axis=-2)
        return self.transformer_blocks.compute_context_kv(context)

    def precompute_context_kv_neg(
        self,
        *,
        text_embeds: Array,
        neg_text_embeds: Array,
        text_mask: Optional[Array] = None,
        neg_text_mask: Optional[Array] = None,
        conditioning_token_ids: Optional[Array] = None,
    ):
        """Per-layer cross-attn K/V for `forward_with_neg_prompt`'s doubled
        batch (pos rows then neg rows, padded to one shared text length) — so
        negative-prompt decoding gets the same once-per-generate context
        projection as the cond-scale path instead of re-projecting per step
        per layer. Returns `(context_kv, (text_embeds, text_mask),
        (neg_text_embeds, neg_text_mask))` with the PADDED tensors; pass
        those back to the forward so masks stay consistent."""
        if text_mask is None:
            text_mask = jnp.any(text_embeds != 0, axis=-1)
        if neg_text_mask is None:
            neg_text_mask = jnp.any(neg_text_embeds != 0, axis=-1)
        L = max(text_embeds.shape[1], neg_text_embeds.shape[1])
        text_embeds, text_mask = _pad_text_to(text_embeds, text_mask, L)
        neg_text_embeds, neg_text_mask = _pad_text_to(neg_text_embeds, neg_text_mask, L)

        double_embeds = jnp.concatenate([text_embeds, neg_text_embeds], axis=0)
        cond2 = (
            jnp.concatenate([conditioning_token_ids, conditioning_token_ids], axis=0)
            if exists(conditioning_token_ids)
            else None
        )
        ctx_kv = self.precompute_context_kv(
            text_embeds=double_embeds, conditioning_token_ids=cond2
        )
        return ctx_kv, (text_embeds, text_mask), (neg_text_embeds, neg_text_mask)

    # -- CFG wrappers ---------------------------------------------------------

    def _cfg_combine(self, out2: Array, b: int, cond_scale, fold: bool) -> Array:
        """`null + (cond - null) * s` over a doubled-batch tensor.

        `fold=True`: `out2` is the pre-head EMBEDDINGS (2b, k, dim) — combine
        at dim, then ONE bias-free head matmul on b rows (`to_logits` has no
        bias, reference :225,:332, so head(combine(e)) == combine(head(e))
        exactly in linear arithmetic; in floating point the reassociation
        delta is at matmul-rounding level, documented in BASELINE.md r4).
        `fold=False`: `out2` is the doubled LOGITS — the reference's combine
        order, bit-exact with prior rounds.

        `cond_scale`: python scalar, traced scalar, or per-ROW (b,) vector
        (each row gets its own guidance — serving batches mixed-guidance
        requests in one program)."""
        s = cond_scale
        if not isinstance(s, (int, float)):
            s = jnp.asarray(s, jnp.float32)
            if s.ndim == 1:
                s = s[:, None, None]
        cond, null = out2[:b], out2[b:]
        if fold:
            e = null.astype(jnp.float32)
            e = e + (cond.astype(jnp.float32) - e) * s
            return self.to_logits(e.astype(self.dtype))
        return null + (cond - null) * s

    def forward_with_cond_scale(
        self,
        x: Array,
        *,
        text_embeds: Array,
        cond_scale: float = 3.0,
        return_embed: bool = False,
        text_mask: Optional[Array] = None,
        conditioning_token_ids: Optional[Array] = None,
        self_cond_embed: Optional[Array] = None,
        attn_impl: str = "auto",
        return_raw_double: bool = False,
        gather_positions: Optional[Array] = None,
        context_kv=None,
        pos_grid: Optional[tuple] = None,
        cfg_fold: bool = True,
        return_embed_only: bool = False,
        null_fold: bool = True,
    ):
        """CFG: null + (cond - null) * cond_scale, via ONE doubled-batch
        forward instead of the reference's two sequential passes (:240-259).
        The null half zeroes only the TEXT mask; conditioning image tokens
        stay attendable, matching the reference's order of operations
        (:308-318).

        `cfg_fold` (default True): combine the EMBEDDINGS before the
        bias-free vocab head instead of the logits after it — mathematically
        identical scaled logits, but the head matmul (the decode loop's
        biggest single matmul at vocab 65537) runs on b rows instead of 2b,
        and every downstream consumer reads SINGLE-batch logits.
        `cfg_fold=False` reproduces the reference's combine order bit-exactly
        (parity oracles pin that path).

        `return_raw_double=True` skips the combine and returns the raw
        doubled-batch logits (cond rows then null rows) plus the cond-half
        embed — for consumers that fuse the CFG combine downstream (the
        Pallas sampling kernel's cfg_pair mode combines in VMEM).

        `return_embed_only=True` skips the vocab head entirely and returns
        just the cond-half embeddings (SelfCritic reads embeddings only — no
        reason to pay the 65537-wide matmul per decode step).

        `gather_positions` (b, k) restricts the LOGITS HEAD to those sequence
        positions (the transformer itself still attends over the full
        sequence); the returned embed stays full-length. The MaskGit compact
        decode path uses this to skip the vocab-65536 matmul for positions
        whose samples would be discarded.

        `context_kv`: precomputed per-layer cross-attn K/V, already sized for
        the batch this wrapper will run (i.e. DOUBLED when cond_scale != 1 —
        both CFG halves share the same context values; only the mask
        differs).

        `cond_scale` may be a traced scalar (per-step guidance schedules,
        Muse paper §2.5) or a per-row (b,) vector (per-request guidance in a
        coalesced serving batch; requires cfg_fold) — a tracer always takes
        the doubled-batch path; the single-pass shortcut applies only to a
        literal 1.

        `null_fold` (default True): the null half's context is FULLY masked
        when there are no conditioning image tokens, so each cross-attention
        there is exactly the per-layer constant `to_out(null_v)`
        (`Attention.null_out`) — the null rows skip cross-attention entirely
        (q/out projections included). The null rows' constant is exact; the
        cond half's attention runs at batch b instead of 2b, so outputs vs
        null_fold=False agree to float-reassociation tolerance
        (tests/test_null_fold.py); no-op when conditioning tokens are present
        (those stay attendable in the null half)."""
        if isinstance(cond_scale, (int, float)) and cond_scale == 1:
            if return_embed_only:
                _, embed = self(
                    x,
                    text_embeds=text_embeds,
                    text_mask=text_mask,
                    conditioning_token_ids=conditioning_token_ids,
                    self_cond_embed=self_cond_embed,
                    attn_impl=attn_impl,
                    context_kv=context_kv,
                    pos_grid=pos_grid,
                    skip_head=True,
                )
                return embed
            return self(
                x,
                text_embeds=text_embeds,
                text_mask=text_mask,
                conditioning_token_ids=conditioning_token_ids,
                self_cond_embed=self_cond_embed,
                return_embed=return_embed,
                attn_impl=attn_impl,
                gather_positions=gather_positions,
                context_kv=context_kv,
                pos_grid=pos_grid,
            )

        b = x.shape[0]
        if text_mask is None:
            text_mask = jnp.any(text_embeds != 0, axis=-1)

        def dup(t):
            return None if t is None else jnp.concatenate([t, t], axis=0)

        fold = (cfg_fold or return_embed_only) and not return_raw_double
        out2, embed2 = self(
            dup(x),
            text_embeds=dup(text_embeds),
            text_mask=jnp.concatenate([text_mask, jnp.zeros_like(text_mask)], axis=0),
            conditioning_token_ids=dup(conditioning_token_ids),
            self_cond_embed=dup(self_cond_embed),
            return_embed=True,
            attn_impl=attn_impl,
            gather_positions=dup(gather_positions),
            context_kv=context_kv,
            pos_grid=pos_grid,
            skip_head=fold,
            null_rows=b if (null_fold and not exists(conditioning_token_ids)) else 0,
        )
        if return_embed_only:
            return embed2[:b]
        if return_raw_double:
            return out2, embed2[:b]
        scaled_logits = self._cfg_combine(out2, b, cond_scale, fold)
        if return_embed:
            return scaled_logits, embed2[:b]
        return scaled_logits

    def forward_with_neg_prompt(
        self,
        x: Array,
        *,
        text_embeds: Array,
        neg_text_embeds: Array,
        cond_scale: float = 3.0,
        return_embed: bool = False,
        text_mask: Optional[Array] = None,
        neg_text_mask: Optional[Array] = None,
        conditioning_token_ids: Optional[Array] = None,
        self_cond_embed: Optional[Array] = None,
        attn_impl: str = "auto",
        return_raw_double: bool = False,
        gather_positions: Optional[Array] = None,
        context_kv=None,
        pos_grid: Optional[tuple] = None,
        cfg_fold: bool = True,
        return_embed_only: bool = False,
        null_fold: bool = True,
    ):
        """Negative prompting: neg + (pos - neg) * cond_scale. (The reference
        version raises at runtime — B1; built working here.)
        `return_raw_double` / `gather_positions` / `cfg_fold` /
        `return_embed_only` as in `forward_with_cond_scale` (pos rows then
        neg rows; the neg rows play the null role in the embed-fold combine).

        `context_kv`: precomputed per-layer cross-attn K/V for the DOUBLED
        batch — pos rows' context then neg rows' context, both padded to the
        same text length (`precompute_context_kv_neg` builds exactly this).
        Unlike the cond-scale wrapper the two halves have different context
        VALUES here, so the cache carries both.

        `null_fold` is accepted for call-site symmetry with
        `forward_with_cond_scale` but has no effect: the "null" half attends
        a REAL negative-text context, so its cross-attention is not a
        constant."""
        del null_fold
        b = x.shape[0]
        if text_mask is None:
            text_mask = jnp.any(text_embeds != 0, axis=-1)
        if neg_text_mask is None:
            neg_text_mask = jnp.any(neg_text_embeds != 0, axis=-1)

        # pad text lengths to match so the two halves can batch together
        L = max(text_embeds.shape[1], neg_text_embeds.shape[1])
        text_embeds, text_mask = _pad_text_to(text_embeds, text_mask, L)
        neg_text_embeds, neg_text_mask = _pad_text_to(neg_text_embeds, neg_text_mask, L)

        def dup(t):
            return None if t is None else jnp.concatenate([t, t], axis=0)

        fold = (cfg_fold or return_embed_only) and not return_raw_double
        out2, embed2 = self(
            dup(x),
            text_embeds=jnp.concatenate([text_embeds, neg_text_embeds], axis=0),
            text_mask=jnp.concatenate([text_mask, neg_text_mask], axis=0),
            conditioning_token_ids=dup(conditioning_token_ids),
            self_cond_embed=dup(self_cond_embed),
            return_embed=True,
            attn_impl=attn_impl,
            gather_positions=dup(gather_positions),
            context_kv=context_kv,
            pos_grid=pos_grid,
            skip_head=fold,
        )
        if return_embed_only:
            return embed2[:b]
        if return_raw_double:
            return out2, embed2[:b]
        scaled_logits = self._cfg_combine(out2, b, cond_scale, fold)
        if return_embed:
            return scaled_logits, embed2[:b]
        return scaled_logits

    # -- main forward (reference :279-348) ------------------------------------

    def __call__(
        self,
        x: Array,
        return_embed: bool = False,
        return_logits: bool = False,
        labels: Optional[Array] = None,
        ignore_index: int = 0,
        self_cond_embed: Optional[Array] = None,
        cond_drop_prob: float = 0.0,
        conditioning_token_ids: Optional[Array] = None,
        texts=None,
        text_embeds: Optional[Array] = None,
        text_mask: Optional[Array] = None,
        rng: Optional[Array] = None,
        attn_impl: str = "auto",
        gather_positions: Optional[Array] = None,
        context_kv=None,
        pos_grid: Optional[tuple] = None,
        skip_head: bool = False,
        null_rows: int = 0,
    ):
        b, n = x.shape
        # null_rows: trailing rows whose context is fully masked (the CFG
        # null half) — only valid when no conditioning tokens join the
        # context (those stay attendable in the null half, reference
        # :308-318, so the cross-attention there is NOT a constant)
        assert null_rows == 0 or not exists(conditioning_token_ids)

        assert exists(texts) ^ exists(text_embeds)
        if exists(texts):
            text_embeds = self.encode_text(texts)

        # context_kv: per-layer cross-attention K/V of the (static) context,
        # precomputed once per decode scan (`precompute_context_kv`) — the
        # context VALUES are then not rebuilt per step; only the mask is
        if context_kv is None:
            context = (
                self.text_embed_proj(text_embeds)
                if exists(self.text_embed_proj)
                else text_embeds
            )
            context = context.astype(self.dtype)
        else:
            context = None

        # padding positions carry zeroed embeddings (t5.py:92-93 contract);
        # an explicit mask can also be passed (TPU-first: static shapes)
        if text_mask is None:
            context_mask = jnp.any(text_embeds != 0, axis=-1)
        else:
            context_mask = text_mask

        # classifier-free guidance dropout (reference :306-310)
        if cond_drop_prob > 0:
            assert rng is not None, "cond_drop_prob > 0 requires an rng key"
            keep = jax.random.uniform(rng, (b, 1)) >= cond_drop_prob
            context_mask = context_mask & keep

        # conditioning image token ids join the cross-attn context (:312-318)
        if exists(conditioning_token_ids):
            cond_ids = conditioning_token_ids.reshape(b, -1)
            if context_kv is None:
                cond_token_emb = self.token_emb(cond_ids).astype(self.dtype)
                context = jnp.concatenate([context, cond_token_emb], axis=-2)
            context_mask = jnp.pad(
                context_mask, ((0, 0), (0, cond_ids.shape[-1])), constant_values=True
            )

        # embed tokens
        h = self.token_emb(x) + self._positions(n, grid=pos_grid)
        h = h.astype(self.dtype)

        if self.self_cond:
            if not exists(self_cond_embed):
                self_cond_embed = jnp.zeros_like(h)
            h = h + self.self_cond_to_init_embed(self_cond_embed.astype(self.dtype))

        embed = self.transformer_blocks(
            h, context=context, context_mask=context_mask, impl=attn_impl,
            context_kv=context_kv, null_rows=null_rows,
        )

        # logits stay in the compute dtype: at vocab 65536 the CFG-doubled
        # f32 logits are ~2 GB of HBM traffic per decode step; the loss fns
        # and the sampling kernel upcast to f32 where it matters.
        # gather_positions restricts the head (and only the head: attention
        # above saw the full sequence) to the positions whose samples the
        # caller will keep — the decode loop's biggest single matmul shrinks
        # with the cosine mask schedule (MaskGit compact decode).
        if gather_positions is not None:
            assert labels is None, "gather_positions is a sampling-path feature"
            head_in = jnp.take_along_axis(embed, gather_positions[..., None], axis=1)
        else:
            head_in = embed
        if skip_head:
            # pre-head embeddings (gathered), for consumers that fold the CFG
            # combine before the vocab matmul or read embeddings only —
            # returned alongside the FULL embed (self-conditioning needs it)
            assert labels is None, "skip_head is a sampling-path feature"
            return head_in, embed
        logits = self.to_logits(head_in)

        if return_embed:
            return logits, embed

        if not exists(labels):
            return logits

        if self.dim_out == 1:
            # per-token binary "is this token fake" head (critic)
            loss = sigmoid_bce(logits[..., 0], labels)
        else:
            loss = cross_entropy_ignore_index(logits, labels, ignore_index)

        if not return_logits:
            return loss
        return loss, logits


def cross_entropy_ignore_index(logits: Array, labels: Array, ignore_index: int) -> Array:
    """Mean CE over positions where labels != ignore_index
    (torch F.cross_entropy(ignore_index=...) semantics, reference :343).

    Computed as `picked_logit - logsumexp(logits)` rather than gathering
    from a materialized log_softmax: per-position math is identical, but at
    train scale (b64, seq 256, vocab 65536) the full (b, n, V) f32
    log_softmax output is ~4.3 GB of HBM traffic written and re-read only
    to gather ONE element per position — the fused form keeps the (b, n, V)
    traffic to reading the bf16 logits into the reductions. Measured on the
    v5e: train step 89.2 -> 78.7 ms (718 -> 814 img/s, train MFU 37.3% ->
    42.3%), step-0 loss identical (BASELINE.md r5)."""
    lse = jax.scipy.special.logsumexp(logits.astype(jnp.float32), axis=-1)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    picked = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    ll = picked.astype(jnp.float32) - lse
    denom = jnp.maximum(valid.sum(), 1)
    return -(ll * valid).sum() / denom


def sigmoid_bce(logits: Array, labels: Array) -> Array:
    """Mean binary cross-entropy with logits (reference :341)."""
    logits = logits.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -jnp.mean(labels * log_p + (1.0 - labels) * log_not_p)


# -- specializations (reference :352-386) ------------------------------------


class SelfCritic(nnx.Module):
    """Linear critic head over the generator's own embeddings (SCRIPT
    paper; reference :352-374)."""

    def __init__(self, net: Transformer, *, rngs: nnx.Rngs):
        self.net = net
        self.to_pred = nnx.Linear(net.dim, 1, rngs=rngs)

    # the critic reads the COND half's EMBEDDINGS only (matching the
    # reference, which returns the cond pass's embed from
    # forward_with_cond_scale, :240-259): cond_scale never reaches the
    # score, and the cond rows mix with no other batch row — so the CFG
    # wrappers here run ONE single-batch forward with skip_head instead of
    # the doubled-batch CFG forward. vs the naive path this skips the
    # generator's vocab-65537 head matmul AND the entire null-half trunk
    # (self-attn + FF on b rows per decode step), mathematically identical
    # (pinned in tests/test_cfg_fold.py).

    @staticmethod
    def _cond_half_ctx_kv(ctx_kv, b: int):
        """Slice a (possibly CFG-doubled) per-layer K/V cache down to the
        cond rows. No-op for a single-batch cache (k.shape[0] == b)."""
        if ctx_kv is None:
            return None
        return [(k[:b], v[:b]) for (k, v) in ctx_kv]

    def forward_with_cond_scale(self, x, **kwargs):
        for drop in (
            "return_embed", "return_embed_only", "return_raw_double",
            "cond_scale", "cfg_fold", "null_fold",
        ):
            kwargs.pop(drop, None)
        kwargs["context_kv"] = self._cond_half_ctx_kv(
            kwargs.get("context_kv"), x.shape[0]
        )
        _, embeds = self.net(x, skip_head=True, **kwargs)
        return self.to_pred(embeds)

    def forward_with_neg_prompt(
        self, x, *, text_embeds, neg_text_embeds, text_mask=None,
        neg_text_mask=None, **kwargs
    ):
        # pos half only — but pad the pos text to the shared length the
        # doubled pos+neg ctx cache was built over (precompute_context_kv_neg).
        # neg_text_mask is accepted only to swallow the partial's kwarg; the
        # critic never attends the negative context.
        del neg_text_mask
        if text_mask is None:
            text_mask = jnp.any(text_embeds != 0, axis=-1)
        L = max(text_embeds.shape[1], neg_text_embeds.shape[1])
        text_embeds, text_mask = _pad_text_to(text_embeds, text_mask, L)
        return self.forward_with_cond_scale(
            x, text_embeds=text_embeds, text_mask=text_mask, **kwargs
        )

    def __call__(self, x, labels: Optional[Array] = None, **kwargs):
        kwargs.pop("return_embed", None)
        _, embeds = self.net(x, skip_head=True, **kwargs)
        logits = self.to_pred(embeds)
        if not exists(labels):
            return logits
        return sigmoid_bce(logits[..., 0], labels)


class MaskGitTransformer(Transformer):
    """Transformer with a [mask] token id (reference :378-381)."""

    def __init__(self, **kwargs):
        assert "add_mask_id" not in kwargs
        super().__init__(add_mask_id=True, **kwargs)


class TokenCritic(Transformer):
    """Transformer scoring per-token realness (reference :383-386)."""

    def __init__(self, **kwargs):
        assert "dim_out" not in kwargs
        super().__init__(dim_out=1, **kwargs)
