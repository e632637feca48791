"""Frozen T5 text conditioning, in-framework.

Rebuild of `/root/reference/muse_maskgit_pytorch/t5.py`. The reference wraps
HuggingFace `T5EncoderModel`; here the encoder (RMSNorm, relative-position-
bias attention, gated-GELU FF for v1.1 configs) is implemented natively in
JAX/NNX so the whole conditioning path jits and shards like the rest of the
framework. Pretrained HF weights are loaded with
`muse_maskgit_pytorch_tpu.utils.convert.load_hf_t5_weights` when available.

API parity with the reference:
  * `t5_encode_text(texts, name) -> (b, n, d)` embeddings with padding
    positions ZEROED (t5.py:92-93) — downstream recovers the mask as
    `(embeds != 0).any(-1)` (muse_maskgit_pytorch.py:304);
  * `get_encoded_dim(name)` without loading weights (t5.py:44-55), via a
    static config table (zero-egress environments cannot fetch configs);
  * module-level singleton cache keyed by model name (t5.py:20-42);
  * `MAX_LENGTH = 256`, `DEFAULT_T5_NAME = 'google/t5-v1_1-base'`
    (t5.py:16-18).

Tokenization: the HF SentencePiece tokenizer is used when its vocab is
available locally; otherwise a deterministic byte-level fallback tokenizer
(same special ids: pad=0, eos=1) keeps the pipeline runnable offline —
embeddings are then only meaningful with a matching trained encoder, which is
exactly the situation of any random-init text encoder and fine for tests.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

Array = jax.Array

MAX_LENGTH = 256
DEFAULT_T5_NAME = "google/t5-v1_1-base"
T5_VOCAB_SIZE = 32128


@dataclasses.dataclass(frozen=True)
class T5Config:
    d_model: int
    d_ff: int
    num_heads: int
    d_kv: int
    num_layers: int
    gated: bool  # v1.1 = gated-gelu, legacy = relu
    vocab_size: int = T5_VOCAB_SIZE
    rel_pos_buckets: int = 32
    rel_pos_max_distance: int = 128
    layer_norm_eps: float = 1e-6


T5_CONFIGS = {
    "google/t5-v1_1-small": T5Config(512, 1024, 6, 64, 8, True),
    "google/t5-v1_1-base": T5Config(768, 2048, 12, 64, 12, True),
    "google/t5-v1_1-large": T5Config(1024, 2816, 16, 64, 24, True),
    "google/t5-v1_1-xl": T5Config(2048, 5120, 32, 64, 24, True),
    "google/t5-v1_1-xxl": T5Config(4096, 10240, 64, 64, 24, True),
    "t5-small": T5Config(512, 2048, 8, 64, 6, False),
    "t5-base": T5Config(768, 3072, 12, 64, 12, False),
    "t5-large": T5Config(1024, 4096, 16, 64, 24, False),
}


# snapshot of the shipped HF-style names: a name registered into T5_CONFIGS
# at runtime (tiny offline configs in tests/demos) is by definition not a
# hub repo, so weight/tokenizer lookups skip HF entirely — without this,
# each such name costs a full urllib retry backoff per process when
# HF_HUB_OFFLINE is unset (~45 s measured)
_BUILTIN_CONFIGS = frozenset(T5_CONFIGS)


def get_config(name: str) -> T5Config:
    if name in T5_CONFIGS:
        return T5_CONFIGS[name]
    try:  # unknown name: ask transformers (works if config is cached locally)
        from transformers import T5Config as HFT5Config

        from muse_maskgit_pytorch_tpu.utils.convert import _hf_local_first

        cfg = _hf_local_first(HFT5Config.from_pretrained, name)
        return T5Config(
            d_model=cfg.d_model,
            d_ff=cfg.d_ff,
            num_heads=cfg.num_heads,
            d_kv=cfg.d_kv,
            num_layers=cfg.num_layers,
            gated=("gated" in cfg.feed_forward_proj),
            vocab_size=cfg.vocab_size,
        )
    except Exception as e:  # pragma: no cover
        raise ValueError(f"unknown t5 config {name!r}") from e


def get_encoded_dim(name: str) -> int:
    """Embedding dim without loading weights (reference t5.py:44-55)."""
    return get_config(name).d_model


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------


class RMSNorm(nnx.Module):
    def __init__(self, dim: int, eps: float = 1e-6, *, rngs: nnx.Rngs):
        self.weight = nnx.Param(jnp.ones((dim,)))
        self.eps = eps

    def __call__(self, x: Array) -> Array:
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return x * self.weight[...].astype(x.dtype)


def _relative_position_bucket(
    relative_position: Array, num_buckets: int = 32, max_distance: int = 128
) -> Array:
    """Bidirectional T5 bucketing (HF modeling_t5._relative_position_bucket)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)

    max_exact = num_buckets // 2
    is_small = n < max_exact

    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5SelfAttention(nnx.Module):
    def __init__(self, cfg: T5Config, has_rel_bias: bool, *, rngs: nnx.Rngs):
        inner = cfg.num_heads * cfg.d_kv
        self.cfg = cfg
        self.q = nnx.Linear(cfg.d_model, inner, use_bias=False, rngs=rngs)
        self.k = nnx.Linear(cfg.d_model, inner, use_bias=False, rngs=rngs)
        self.v = nnx.Linear(cfg.d_model, inner, use_bias=False, rngs=rngs)
        self.o = nnx.Linear(inner, cfg.d_model, use_bias=False, rngs=rngs)
        self.rel_bias = (
            nnx.Embed(cfg.rel_pos_buckets, cfg.num_heads, rngs=rngs)
            if has_rel_bias
            else None
        )

    def compute_bias(self, n: int) -> Array:
        ctx = jnp.arange(n)[:, None]
        mem = jnp.arange(n)[None, :]
        buckets = _relative_position_bucket(
            mem - ctx, self.cfg.rel_pos_buckets, self.cfg.rel_pos_max_distance
        )
        bias = self.rel_bias(buckets)  # (n, n, heads)
        return bias.transpose(2, 0, 1)[None]  # (1, h, n, n)

    def __call__(self, x: Array, mask: Array, position_bias: Optional[Array]) -> Tuple[Array, Array]:
        b, n, _ = x.shape
        h, d = self.cfg.num_heads, self.cfg.d_kv
        q = self.q(x).reshape(b, n, h, d).transpose(0, 2, 1, 3)
        k = self.k(x).reshape(b, n, h, d).transpose(0, 2, 1, 3)
        v = self.v(x).reshape(b, n, h, d).transpose(0, 2, 1, 3)

        if position_bias is None:
            position_bias = self.compute_bias(n)

        # T5 does NOT scale by 1/sqrt(d)
        scores = jnp.einsum("bhid,bhjd->bhij", q, k) + position_bias
        scores = jnp.where(mask[:, None, None, :], scores, -1e9)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return self.o(out), position_bias


class T5FF(nnx.Module):
    def __init__(self, cfg: T5Config, *, rngs: nnx.Rngs):
        self.gated = cfg.gated
        if cfg.gated:
            self.wi_0 = nnx.Linear(cfg.d_model, cfg.d_ff, use_bias=False, rngs=rngs)
            self.wi_1 = nnx.Linear(cfg.d_model, cfg.d_ff, use_bias=False, rngs=rngs)
        else:
            self.wi = nnx.Linear(cfg.d_model, cfg.d_ff, use_bias=False, rngs=rngs)
        self.wo = nnx.Linear(cfg.d_ff, cfg.d_model, use_bias=False, rngs=rngs)

    def __call__(self, x: Array) -> Array:
        if self.gated:
            h = jax.nn.gelu(self.wi_0(x), approximate=True) * self.wi_1(x)
        else:
            h = jax.nn.relu(self.wi(x))
        return self.wo(h)


class T5Block(nnx.Module):
    def __init__(self, cfg: T5Config, has_rel_bias: bool, *, rngs: nnx.Rngs):
        self.ln1 = RMSNorm(cfg.d_model, cfg.layer_norm_eps, rngs=rngs)
        self.attn = T5SelfAttention(cfg, has_rel_bias, rngs=rngs)
        self.ln2 = RMSNorm(cfg.d_model, cfg.layer_norm_eps, rngs=rngs)
        self.ff = T5FF(cfg, rngs=rngs)

    def __call__(self, x, mask, position_bias):
        h, position_bias = self.attn(self.ln1(x), mask, position_bias)
        x = x + h
        x = x + self.ff(self.ln2(x))
        return x, position_bias


class T5Encoder(nnx.Module):
    """Encoder-only T5 (the reference's frozen `T5EncoderModel`)."""

    def __init__(self, cfg: T5Config, *, rngs: nnx.Rngs):
        self.cfg = cfg
        self.token_emb = nnx.Embed(cfg.vocab_size, cfg.d_model, rngs=rngs)
        self.blocks = nnx.List(
            [T5Block(cfg, has_rel_bias=(i == 0), rngs=rngs) for i in range(cfg.num_layers)]
        )
        self.final_norm = RMSNorm(cfg.d_model, cfg.layer_norm_eps, rngs=rngs)

    def __call__(self, input_ids: Array, attention_mask: Array) -> Array:
        x = self.token_emb(input_ids)
        position_bias = None
        for block in self.blocks:
            x, position_bias = block(x, attention_mask, position_bias)
        return self.final_norm(x)


# ---------------------------------------------------------------------------
# tokenizers
# ---------------------------------------------------------------------------


class ByteFallbackTokenizer:
    """Deterministic byte-level tokenizer with T5 special ids (pad=0, eos=1).

    Used when the SentencePiece vocab is not locally available (zero-egress).
    """

    def __call__(self, texts: List[str], max_length: int) -> Tuple[np.ndarray, np.ndarray]:
        seqs = []
        for t in texts:
            ids = [min(b + 3, T5_VOCAB_SIZE - 1) for b in t.encode("utf-8")][: max_length - 1]
            ids.append(1)  # eos
            seqs.append(ids)
        n = max(len(s) for s in seqs)
        input_ids = np.zeros((len(seqs), n), np.int32)
        mask = np.zeros((len(seqs), n), bool)
        for i, s in enumerate(seqs):
            input_ids[i, : len(s)] = s
            mask[i, : len(s)] = True
        return input_ids, mask


class HFTokenizer:
    def __init__(self, name: str):
        from transformers import AutoTokenizer

        from muse_maskgit_pytorch_tpu.utils.convert import _hf_local_first

        # local cache first: avoids a minutes-long hub retry stall per
        # process in egress-less deployments (set TRANSFORMERS_OFFLINE=1 to
        # skip the networked second attempt entirely)
        self.tok = _hf_local_first(AutoTokenizer.from_pretrained, name)

    def __call__(self, texts: List[str], max_length: int) -> Tuple[np.ndarray, np.ndarray]:
        enc = self.tok(
            texts,
            return_tensors="np",
            padding="longest",
            max_length=max_length,
            truncation=True,
        )
        return enc["input_ids"].astype(np.int32), enc["attention_mask"].astype(bool)


# ---------------------------------------------------------------------------
# singleton cache + public encode API (reference t5.py:20-42, 59-99)
# ---------------------------------------------------------------------------

_T5_CACHE: dict = {}


def get_model_and_tokenizer(name: str):
    if name not in _T5_CACHE:
        cfg = get_config(name)
        model = T5Encoder(cfg, rngs=nnx.Rngs(0))
        # runtime-registered custom configs are offline by definition: go
        # straight to random-init + byte tokenizer (inject real weights via
        # set_model / the fetch_and_convert bring-up instead)
        custom = name in T5_CONFIGS and name not in _BUILTIN_CONFIGS
        pretrained = False
        if not custom:
            try:
                from muse_maskgit_pytorch_tpu.utils.convert import load_hf_t5_weights

                load_hf_t5_weights(model, name)
                pretrained = True
            except Exception:
                pretrained = False  # random-init fallback (documented above)
        tokenizer = None
        if not custom:
            try:
                tokenizer = HFTokenizer(name)
            except Exception:
                tokenizer = None
        if tokenizer is None:
            tokenizer = ByteFallbackTokenizer()
        _T5_CACHE[name] = dict(model=model, tokenizer=tokenizer, pretrained=pretrained)
    entry = _T5_CACHE[name]
    return entry["model"], entry["tokenizer"]


def set_model(name: str, model: T5Encoder, tokenizer=None):
    """Inject a (converted/pretrained) encoder into the singleton cache."""
    entry = _T5_CACHE.setdefault(name, {})
    entry["model"] = model
    entry["pretrained"] = True
    if tokenizer is not None:
        entry["tokenizer"] = tokenizer
    elif "tokenizer" not in entry:
        entry["tokenizer"] = ByteFallbackTokenizer()


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def t5_encode_text_with_mask(
    texts: Union[str, List[str]],
    name: str = DEFAULT_T5_NAME,
    max_length: int = MAX_LENGTH,
    pad_to_multiple: int = 8,
) -> Tuple[Array, Array]:
    """Returns (embeds (b, n, d) with padding zeroed, mask (b, n) bool).

    Lengths are rounded up to `pad_to_multiple` so jit recompiles are bounded
    to a few length buckets (the reference pads to 'longest', t5.py:78, which
    on TPU would trigger a recompile per distinct length).
    """
    if isinstance(texts, str):
        texts = [texts]

    model, tokenizer = get_model_and_tokenizer(name)
    input_ids, mask = tokenizer(texts, max_length)

    n = min(_round_up(input_ids.shape[1], pad_to_multiple), max_length)
    if input_ids.shape[1] < n:
        pad = n - input_ids.shape[1]
        input_ids = np.pad(input_ids, ((0, 0), (0, pad)))
        mask = np.pad(mask, ((0, 0), (0, pad)))
    else:
        input_ids, mask = input_ids[:, :n], mask[:, :n]

    embeds = _encode_jit(model, jnp.asarray(input_ids), jnp.asarray(mask))
    return embeds, jnp.asarray(mask)


@nnx.jit(static_argnums=())
def _encode_jit(model: T5Encoder, input_ids: Array, mask: Array) -> Array:
    embeds = model(input_ids, mask)
    return jnp.where(mask[..., None], embeds, 0.0)  # zero padding (t5.py:92-93)


def t5_encode_text(
    texts: Union[str, List[str]],
    name: str = DEFAULT_T5_NAME,
    max_length: int = MAX_LENGTH,
) -> Array:
    """Reference-parity API: embeddings only, padding zeroed (t5.py:59-99)."""
    return t5_encode_text_with_mask(texts, name=name, max_length=max_length)[0]
