"""Null-half constant cross-attention (`null_fold`).

The CFG null half of a doubled-batch forward attends a FULLY masked text
context (forward_with_cond_scale zeroes its mask), so softmax over
{null KV ⧺ masked context} is exactly one-hot on the null position and each
cross-attention's output there is the per-layer constant `to_out(null_v)` —
independent of the query (`Attention.null_out`). With `null_fold=True` (the
default) the null rows skip cross-attention entirely: no q/out projections,
no attention, just a constant add.

Contracts pinned here:
  * a fully-masked cross-attention equals `null_out()` broadcast (the math
    the fold rests on);
  * fold vs no-fold logits agree to float-reassociation tolerance (the cond
    half's attention runs at batch b instead of 2b — tiling only);
  * fold vs no-fold decodes agree token-for-token at the test scale, on both
    samplers and with a critic;
  * conditioning tokens disable the fold (they stay attendable in the null
    half, reference muse_maskgit_pytorch.py:308-318) — super-res decodes are
    IDENTICAL across the knob;
  * negative prompting ignores the knob (the neg half attends real context).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from muse_maskgit_pytorch_tpu.models.transformer import Attention
from tests.test_maskgit import (
    CODEBOOK,
    base_maskgit,
    superres_maskgit,
    text_embeds_for,
    tiny_transformer,
)


def _gen_ids(mg, rng, te, **kw):
    out = mg.generate(text_embeds=te, rng=rng, timesteps=4, return_ids=True, **kw)
    return np.asarray(out.reshape(out.shape[0], -1))


def test_fully_masked_cross_attention_is_null_out(rng):
    attn = Attention(32, dim_head=16, heads=2, cross_attend=True, rngs=nnx.Rngs(0))
    x = jax.random.normal(rng, (3, 8, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 32))
    mask = jnp.zeros((3, 5), bool)
    full = np.asarray(attn(x, context=ctx, context_mask=mask, impl="xla"))
    const = np.asarray(jnp.broadcast_to(attn.null_out(), full.shape))
    np.testing.assert_allclose(full, const, atol=1e-7)


def test_null_fold_logits_match(rng):
    t = tiny_transformer(16)
    ids = jax.random.randint(rng, (2, 16), 0, CODEBOOK)
    te = text_embeds_for(2, rng)
    on = np.asarray(
        t.forward_with_cond_scale(ids, text_embeds=te, cond_scale=3.0, null_fold=True)
    )
    off = np.asarray(
        t.forward_with_cond_scale(ids, text_embeds=te, cond_scale=3.0, null_fold=False)
    )
    np.testing.assert_allclose(on, off, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("sampler", ["xla", "fused"])
def test_null_fold_decode_token_agreement(rng, sampler):
    # ">= 0.99 agreement", not exact: the cond half's attention runs at
    # batch b instead of 2b, so float reassociation can flip rare ties
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    a = _gen_ids(mg, rng, te, cond_scale=3.0, sampler=sampler, null_fold=True)
    b = _gen_ids(mg, rng, te, cond_scale=3.0, sampler=sampler, null_fold=False)
    assert (a >= 0).all() and (a < CODEBOOK).all()
    agreement = float(np.mean(a == b))
    assert agreement >= 0.99, f"null-fold token agreement {agreement:.3f}"


def test_null_fold_with_self_critic(rng):
    mg = base_maskgit(self_token_critic=True, rngs=nnx.Rngs(0))
    te = text_embeds_for(2, rng)
    a = _gen_ids(mg, rng, te, null_fold=True)
    b = _gen_ids(mg, rng, te, null_fold=False)
    agreement = float(np.mean(a == b))
    assert agreement >= 0.99, f"critic null-fold token agreement {agreement:.3f}"


def test_null_fold_noop_with_conditioning_tokens(rng):
    # super-res: conditioning image tokens stay attendable in the null half,
    # so the fold must not engage — both knob settings run the SAME program
    mg = superres_maskgit()
    te = text_embeds_for(2, rng)
    cond = jax.random.uniform(rng, (2, 16, 16, 3))
    a = _gen_ids(mg, rng, te, cond_images=cond, null_fold=True)
    b = _gen_ids(mg, rng, te, cond_images=cond, null_fold=False)
    np.testing.assert_array_equal(a, b)


def test_null_fold_noop_with_neg_prompt(rng):
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    neg = text_embeds_for(2, jax.random.PRNGKey(7))
    a = _gen_ids(mg, rng, te, neg_text_embeds=neg, null_fold=True)
    b = _gen_ids(mg, rng, te, neg_text_embeds=neg, null_fold=False)
    np.testing.assert_array_equal(a, b)


def test_null_fold_per_row_scale(rng):
    # the per-request-guidance serving program rides the fold too
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    mixed = _gen_ids(mg, rng, te, cond_scale=jnp.asarray([[2.0, 5.0]]), null_fold=True)
    lo = _gen_ids(mg, rng, te, cond_scale=jnp.float32(2.0), null_fold=True)
    hi = _gen_ids(mg, rng, te, cond_scale=jnp.float32(5.0), null_fold=True)
    np.testing.assert_array_equal(mixed[0], lo[0])
    np.testing.assert_array_equal(mixed[1], hi[1])
