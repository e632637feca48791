"""North-star parity: token sequences matching the reference loop under
identical weights and identical (injected) noise (BASELINE.json).

The reference's own code cannot run here (its pip deps are absent), so the
oracle is `tests/torch_reference_impl.py` — a torch restatement of the
reference equations whose every piece is separately pinned in
`tests/test_parity_torch.py`. Same weights, same gumbel noise stream, fp32:
the full 8-step decode must produce identical token grids.
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import nnx

from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit
from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer

from tests.torch_reference_impl import (
    forward_with_cond_scale,
    reference_generate_loop,
    transformer_forward,
    weights_from_jax,
)

VOCAB, DIM, SEQ, TEXT_DIM, HEADS = 64, 48, 16, 24, 2


def _transformer():
    return MaskGitTransformer(
        num_tokens=VOCAB,
        dim=DIM,
        seq_len=SEQ,
        depth=2,
        dim_head=16,
        heads=HEADS,
        text_embed_dim=TEXT_DIM,
        rngs=nnx.Rngs(0),
    )


def test_transformer_forward_matches_torch_restatement(rng):
    t = _transformer()
    w = weights_from_jax(t)
    ids = np.asarray(jax.random.randint(rng, (2, SEQ), 0, VOCAB))
    te = np.asarray(jax.random.normal(rng, (2, 6, TEXT_DIM)), np.float32)

    ours = np.asarray(t(jnp.asarray(ids), text_embeds=jnp.asarray(te)))
    with torch.no_grad():
        ref = transformer_forward(
            torch.tensor(ids), torch.tensor(te), w, HEADS
        ).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_cfg_matches_torch_restatement(rng):
    """Our ONE doubled-batch CFG forward == the reference's two sequential
    forwards (:240-259), same weights."""
    t = _transformer()
    w = weights_from_jax(t)
    ids = np.asarray(jax.random.randint(rng, (2, SEQ), 0, VOCAB))
    te = np.asarray(jax.random.normal(rng, (2, 6, TEXT_DIM)), np.float32)

    ours = np.asarray(
        t.forward_with_cond_scale(
            jnp.asarray(ids), text_embeds=jnp.asarray(te), cond_scale=3.0
        )
    )
    with torch.no_grad():
        ref = forward_with_cond_scale(
            torch.tensor(ids), torch.tensor(te), w, HEADS, cond_scale=3.0
        ).numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_full_decode_token_parity(rng):
    """8 decode steps, identical weights + injected gumbel noise: token grids
    must match the reference loop exactly."""
    timesteps, cond_scale = 8, 3.0
    transformer = _transformer()
    w = weights_from_jax(transformer)
    maskgit = MaskGit(image_size=16, transformer=transformer, vae=None)

    batch = 2
    te = np.asarray(jax.random.normal(rng, (batch, 6, TEXT_DIM)), np.float32)
    gumbel = np.asarray(
        -np.log(-np.log(np.random.default_rng(0).uniform(1e-9, 1 - 1e-9,
                                                         (timesteps, batch, SEQ, VOCAB)))),
        np.float32,
    )

    ours = np.asarray(
        maskgit.generate(
            text_embeds=jnp.asarray(te),
            rng=jax.random.PRNGKey(0),  # unused: noise injected
            fmap_size=4,
            timesteps=timesteps,
            cond_scale=cond_scale,
            injected_gumbel_noise=jnp.asarray(gumbel),
            return_ids=True,
        )
    ).reshape(batch, SEQ)

    with torch.no_grad():
        ref = reference_generate_loop(
            w,
            HEADS,
            torch.tensor(te),
            torch.tensor(gumbel),
            mask_id=transformer.mask_id,
            seq_len=SEQ,
            timesteps=timesteps,
            cond_scale=cond_scale,
        ).numpy()

    matches = np.mean(ours == ref)
    # identical in exact arithmetic; fp32 reassociation can flip an argmax on
    # a near-tie in rare cases — require (essentially) perfect agreement
    assert matches >= 0.995, f"token agreement {matches:.4f}\n{ours}\n{ref}"
    assert ours.min() >= 0 and ours.max() < VOCAB


def test_cfg_with_conditioning_tokens_matches_torch(rng):
    """Super-res forward: conditioning image tokens in the cross-attn context
    (reference :312-318), CFG null pass keeps them attendable."""
    t = _transformer()
    w = weights_from_jax(t)
    ids = np.asarray(jax.random.randint(rng, (2, SEQ), 0, VOCAB))
    te = np.asarray(jax.random.normal(rng, (2, 6, TEXT_DIM)), np.float32)
    cond = np.asarray(jax.random.randint(jax.random.PRNGKey(3), (2, 4, 4), 0, VOCAB))

    ours = np.asarray(
        t.forward_with_cond_scale(
            jnp.asarray(ids),
            text_embeds=jnp.asarray(te),
            conditioning_token_ids=jnp.asarray(cond),
            cond_scale=3.0,
        )
    )
    with torch.no_grad():
        ref = forward_with_cond_scale(
            torch.tensor(ids), torch.tensor(te), w, HEADS, cond_scale=3.0,
            conditioning_token_ids=torch.tensor(cond),
        ).numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)
