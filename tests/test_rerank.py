"""Best-of-K re-ranked generation (Muse paper §2.8 re-ranks with CLIP; here
the re-ranker is model-internal: trained token critic or generator token
log-likelihood — no external scorer needed, decisive in an offline env)."""

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
    tiny_vae,
)
from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit


def test_score_samples_logprob(rng):
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    ids = jax.random.randint(rng, (2, 4, 4), 0, CODEBOOK)
    s = mg.score_samples(ids, text_embeds=te, method="logprob")
    assert s.shape == (2,)
    assert np.isfinite(np.asarray(s)).all()
    assert (np.asarray(s) <= 0).all()  # mean log-probs


def test_score_samples_critic(rng):
    mg = MaskGit(
        image_size=16,
        transformer=tiny_transformer(16),
        vae=tiny_vae(),
        self_token_critic=True,
        rngs=nnx.Rngs(0),
    )
    te = text_embeds_for(2, rng)
    ids = jax.random.randint(rng, (2, 4, 4), 0, CODEBOOK)
    s = mg.score_samples(ids, text_embeds=te)  # auto -> critic
    assert s.shape == (2,)
    assert np.isfinite(np.asarray(s)).all()
    assert (np.asarray(s) <= 0).all()  # mean log P(real)


def test_generate_reranked_picks_best_candidate(rng):
    """The returned grid must BE the candidate with the best score: recompute
    all K candidate scores by hand and compare."""
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    k = 3
    out, best_scores = mg.generate_reranked(
        text_embeds=te, rng=rng, num_candidates=k, timesteps=3,
        return_ids=True, return_scores=True, score_method="logprob",
    )
    assert out.shape == (2, 4, 4)

    # reproduce the candidate pool (same rng -> same decode) and re-score
    te_k = jnp.repeat(te, k, axis=0)
    tm_k = jnp.any(te_k != 0, axis=-1)
    cand = mg.generate(
        text_embeds=te_k, text_mask=tm_k, rng=rng, timesteps=3, return_ids=True
    )
    scores = np.asarray(
        mg.score_samples(cand, text_embeds=te_k, method="logprob")
    ).reshape(2, k)
    cand = np.asarray(cand).reshape(2, k, 4, 4)
    for b in range(2):
        j = int(scores[b].argmax())
        np.testing.assert_array_equal(np.asarray(out)[b], cand[b, j])
        assert abs(float(best_scores[b]) - scores[b, j]) < 1e-5


def test_generate_reranked_images_and_k1(rng):
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    imgs = mg.generate_reranked(
        text_embeds=te, rng=rng, num_candidates=2, timesteps=3
    )
    assert imgs.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(imgs)).all()
    # K=1 degenerates to plain generate (same rng stream over a b*1 batch)
    a = mg.generate_reranked(
        text_embeds=te, rng=rng, num_candidates=1, timesteps=3, return_ids=True
    )
    b = mg.generate(text_embeds=te, rng=rng, timesteps=3, return_ids=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_generate_reranked_rejects_superres(rng):
    from tests.test_maskgit import superres_maskgit

    sr = superres_maskgit()
    with pytest.raises(AssertionError, match="base stage"):
        sr.generate_reranked(text_embeds=text_embeds_for(1, rng), rng=rng)


def test_muse_cascade_reranks_base_stage(rng):
    from muse_maskgit_pytorch_tpu.models.maskgit import Muse
    from tests.test_maskgit import superres_maskgit

    muse = Muse(base_maskgit(), superres_maskgit())
    # texts must go through encode_text; use a stubbed encoder
    base = muse.base_maskgit
    te = text_embeds_for(2, rng)
    base.transformer.encode_text = lambda texts: te
    muse.superres_maskgit.transformer.encode_text = lambda texts: te
    imgs = muse(
        ["a", "b"], rng=rng, timesteps=2, return_pil_images=False,
        rerank_candidates=2, rerank_score="logprob",
    )
    assert imgs.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(imgs)).all()
