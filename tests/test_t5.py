"""T5 conditioning tests: config table, encode contract (zeroed padding),
singleton cache, byte-fallback tokenizer."""

import jax.numpy as jnp
import numpy as np

from muse_maskgit_pytorch_tpu.models import t5 as t5mod
from muse_maskgit_pytorch_tpu.models.t5 import (
    ByteFallbackTokenizer,
    T5Config,
    T5Encoder,
    get_encoded_dim,
    t5_encode_text,
    t5_encode_text_with_mask,
)
from flax import nnx


def test_get_encoded_dim_table():
    assert get_encoded_dim("google/t5-v1_1-base") == 768
    assert get_encoded_dim("google/t5-v1_1-small") == 512
    assert get_encoded_dim("t5-small") == 512


def test_byte_tokenizer_deterministic():
    tok = ByteFallbackTokenizer()
    ids1, mask1 = tok(["hello world", "hi"], max_length=32)
    ids2, _ = tok(["hello world", "hi"], max_length=32)
    np.testing.assert_array_equal(ids1, ids2)
    assert ids1.shape == mask1.shape
    # eos=1 terminates each sequence; padding is 0
    assert ids1[1, 2] == 1 and ids1[1, 3] == 0
    assert mask1[0].all() and not mask1[1, 3]


def test_byte_tokenizer_truncation():
    tok = ByteFallbackTokenizer()
    ids, _ = tok(["x" * 100], max_length=16)
    assert ids.shape[1] == 16
    assert ids[0, -1] == 1  # eos still present


def _tiny_name():
    # register a tiny config + model so tests never build a full-size T5
    name = "test/tiny-t5"
    if name not in t5mod.T5_CONFIGS:
        t5mod.T5_CONFIGS[name] = T5Config(
            d_model=32, d_ff=64, num_heads=2, d_kv=16, num_layers=2, gated=True
        )
    return name


def test_encode_text_zeroed_padding():
    name = _tiny_name()
    embeds, mask = t5_encode_text_with_mask(["a longer piece of text", "hi"], name=name)
    assert embeds.shape[0] == 2 and embeds.shape[-1] == 32
    # padding positions are exactly zero (t5.py:92-93 contract)
    pad = ~np.asarray(mask)
    assert np.all(np.asarray(embeds)[pad] == 0)
    # the derived mask round-trips
    derived = np.any(np.asarray(embeds) != 0, axis=-1)
    np.testing.assert_array_equal(derived, np.asarray(mask))


def test_encode_text_singleton_cache():
    name = _tiny_name()
    t5_encode_text(["x"], name=name)
    m1 = t5mod._T5_CACHE[name]["model"]
    t5_encode_text(["y"], name=name)
    assert t5mod._T5_CACHE[name]["model"] is m1


def test_encoder_deterministic_and_mask_invariant():
    name = _tiny_name()
    e1 = t5_encode_text(["same text"], name=name)
    e2 = t5_encode_text(["same text"], name=name)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_relative_position_bucket_symmetry():
    from muse_maskgit_pytorch_tpu.models.t5 import _relative_position_bucket

    rel = jnp.arange(-10, 11)
    buckets = np.asarray(_relative_position_bucket(rel))
    assert buckets.min() >= 0 and buckets.max() < 32
    # positive and negative relative positions use disjoint bucket ranges
    assert set(buckets[rel > 0].tolist()).isdisjoint(set(buckets[rel < 0].tolist()))


def test_t5_encoder_forward_shape(rng):
    cfg = T5Config(d_model=32, d_ff=64, num_heads=2, d_kv=16, num_layers=2, gated=False)
    enc = T5Encoder(cfg, rngs=nnx.Rngs(0))
    ids = jnp.array([[5, 6, 7, 1, 0, 0]])
    mask = jnp.array([[True] * 4 + [False] * 2])
    out = enc(ids, mask)
    assert out.shape == (1, 6, 32)
    assert np.isfinite(np.asarray(out)).all()
