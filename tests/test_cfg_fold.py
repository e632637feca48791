"""CFG embed-fold: the classifier-free-guidance combine folded into the
embeddings BEFORE the bias-free vocab head.

`to_logits` has no bias (reference muse_maskgit_pytorch.py:225,:332), so
`head(null_e + (cond_e - null_e)*s) == null_logits + (cond_logits -
null_logits)*s` in exact arithmetic — the fold halves the decode loop's
biggest matmul (the vocab head) and the sampler's HBM read, and makes the
guidance scale a free per-ROW vector (per-request guidance in a coalesced
serving batch).

Contracts pinned here:
  * fold vs no-fold logits agree to float tolerance (reassociation only);
  * fold vs no-fold decodes agree on (almost) every token;
  * per-row (1, b) scales are row-exact with the same scalar scale runs,
    on both sampler paths;
  * per-row scales require cfg_fold; negative prompting composes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from tests.test_maskgit import (
    CODEBOOK,
    base_maskgit,
    text_embeds_for,
    tiny_transformer,
)


def _gen_ids(mg, rng, te, **kw):
    out = mg.generate(text_embeds=te, rng=rng, timesteps=4, return_ids=True, **kw)
    return np.asarray(out.reshape(out.shape[0], -1))


def test_fold_matches_unfold_logits(rng):
    t = tiny_transformer(16)
    ids = jax.random.randint(rng, (2, 16), 0, CODEBOOK)
    te = text_embeds_for(2, rng)
    folded = np.asarray(
        t.forward_with_cond_scale(ids, text_embeds=te, cond_scale=3.0, cfg_fold=True)
    )
    unfolded = np.asarray(
        t.forward_with_cond_scale(ids, text_embeds=te, cond_scale=3.0, cfg_fold=False)
    )
    np.testing.assert_allclose(folded, unfolded, atol=1e-4, rtol=1e-4)


def test_fold_matches_unfold_with_gather_positions(rng):
    # the compact decode path folds on GATHERED head rows
    t = tiny_transformer(16)
    ids = jax.random.randint(rng, (2, 16), 0, CODEBOOK)
    te = text_embeds_for(2, rng)
    gather = jnp.broadcast_to(jnp.arange(0, 16, 2)[None], (2, 8))
    folded = np.asarray(
        t.forward_with_cond_scale(
            ids, text_embeds=te, cond_scale=3.0, cfg_fold=True, gather_positions=gather
        )
    )
    unfolded = np.asarray(
        t.forward_with_cond_scale(
            ids, text_embeds=te, cond_scale=3.0, cfg_fold=False, gather_positions=gather
        )
    )
    assert folded.shape == (2, 8, CODEBOOK)
    np.testing.assert_allclose(folded, unfolded, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("sampler", ["xla", "fused"])
def test_fold_decode_token_agreement(rng, sampler):
    # same weights + same noise stream: fold vs no-fold may differ only on
    # float-reassociation near-ties at the argmax boundary
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    a = _gen_ids(mg, rng, te, cond_scale=3.0, sampler=sampler, cfg_fold=True)
    b = _gen_ids(mg, rng, te, cond_scale=3.0, sampler=sampler, cfg_fold=False)
    assert (a >= 0).all() and (a < CODEBOOK).all()
    agreement = float(np.mean(a == b))
    assert agreement >= 0.9, f"fold/no-fold token agreement {agreement:.3f}"


@pytest.mark.parametrize("sampler", ["xla", "fused"])
def test_per_row_scale_matches_scalar_runs(rng, sampler):
    """A (1, b) per-row scale vector must reproduce, row for row, the run
    where ALL rows share that row's scale (rows are independent; the noise
    stream depends only on batch shape, not on scale values)."""
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    mixed = _gen_ids(
        mg, rng, te, cond_scale=jnp.asarray([[2.0, 5.0]]), sampler=sampler
    )
    lo = _gen_ids(mg, rng, te, cond_scale=jnp.float32(2.0), sampler=sampler)
    hi = _gen_ids(mg, rng, te, cond_scale=jnp.float32(5.0), sampler=sampler)
    np.testing.assert_array_equal(mixed[0], lo[0])
    np.testing.assert_array_equal(mixed[1], hi[1])


def test_per_row_scale_per_step_schedule(rng):
    # full (T, b) form: per-row AND per-step — a flat per-row ramp equals the
    # (1, b) broadcast form
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    flat2d = _gen_ids(
        mg, rng, te, cond_scale=jnp.broadcast_to(jnp.asarray([2.0, 5.0]), (4, 2))
    )
    short = _gen_ids(mg, rng, te, cond_scale=jnp.asarray([[2.0, 5.0]]))
    np.testing.assert_array_equal(flat2d, short)


def test_per_row_requires_fold(rng):
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    with pytest.raises(AssertionError, match="cfg_fold"):
        mg.generate(
            text_embeds=te,
            rng=rng,
            timesteps=2,
            return_ids=True,
            cond_scale=jnp.asarray([[2.0, 5.0]]),
            cfg_fold=False,
        )


def test_per_row_scale_with_neg_prompt(rng):
    # the neg-prompt wrapper shares the _cfg_combine fold; per-row scales
    # must be row-exact there too
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    neg = text_embeds_for(2, jax.random.PRNGKey(7))
    mixed = _gen_ids(
        mg, rng, te, neg_text_embeds=neg, cond_scale=jnp.asarray([[2.0, 5.0]])
    )
    lo = _gen_ids(mg, rng, te, neg_text_embeds=neg, cond_scale=jnp.float32(2.0))
    hi = _gen_ids(mg, rng, te, neg_text_embeds=neg, cond_scale=jnp.float32(5.0))
    np.testing.assert_array_equal(mixed[0], lo[0])
    np.testing.assert_array_equal(mixed[1], hi[1])
    assert (mixed >= 0).all() and (mixed < CODEBOOK).all()


def test_per_row_scale_with_self_critic(rng):
    # SelfCritic reads embeddings only (skip_head); per-row scales must
    # compose with critic-guided decoding
    mg = base_maskgit(self_token_critic=True, rngs=nnx.Rngs(0))
    te = text_embeds_for(2, rng)
    mixed = _gen_ids(mg, rng, te, cond_scale=jnp.asarray([[2.0, 5.0]]))
    lo = _gen_ids(mg, rng, te, cond_scale=jnp.float32(2.0))
    hi = _gen_ids(mg, rng, te, cond_scale=jnp.float32(5.0))
    np.testing.assert_array_equal(mixed[0], lo[0])
    np.testing.assert_array_equal(mixed[1], hi[1])


def test_self_critic_skip_head_matches_old_path(rng):
    """SelfCritic's scores read only the COND half's embeddings — cond_scale
    never reaches them — so the critic runs ONE single-batch skip-head
    forward instead of the doubled CFG forward (no vocab head, no null-half
    trunk). Must match the naive path to reassociation tolerance (the cond
    rows now run at batch b instead of 2b)."""
    from muse_maskgit_pytorch_tpu.models.transformer import SelfCritic

    t = tiny_transformer(16)
    critic = SelfCritic(t, rngs=nnx.Rngs(1))
    ids = jax.random.randint(rng, (2, 16), 0, CODEBOOK)
    te = text_embeds_for(2, rng)
    fast = np.asarray(
        critic.forward_with_cond_scale(ids, text_embeds=te, cond_scale=3.0)
    )
    # old path restated: full doubled CFG forward, read the cond-half embed,
    # apply to_pred
    _, embeds = t.forward_with_cond_scale(
        ids, text_embeds=te, cond_scale=3.0, return_embed=True
    )
    slow = np.asarray(critic.to_pred(embeds))
    np.testing.assert_allclose(fast, slow, atol=1e-5, rtol=1e-5)
