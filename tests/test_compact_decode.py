"""Compact decode (segmented, masked-positions-only logits head + sampler)
must be token-exact vs the full-sequence decode path.

Why exactness holds: every position is refilled every decode step, so step i
masks exactly max(floor(seq * schedule(t_i)), 1) positions — a static count.
The compact path gathers those positions (`lax.top_k(scores, kb)`, whose ties
break lowest-index-first exactly like `mask_by_topk_scores`' stable double
argsort), runs the vocab logits head + sampler only there, and scatters back;
unmasked scores are pinned to -1e5 on both paths. Pinned here under injected
gumbel noise (the cross-path parity harness of
tests/test_parity_end_to_end.py) for the XLA and fused samplers, with and
without a token critic. Reference behavior being preserved:
/root/reference/muse_maskgit_pytorch/muse_maskgit_pytorch.py:556-609.
"""

import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit
from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer, TokenCritic
from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE

VOCAB, SEQ, T, B = 512, 64, 8, 2


def _build(self_cond=True, critic=False):
    kw = dict(
        num_tokens=VOCAB, dim=64, seq_len=SEQ, depth=2, dim_head=16, heads=4,
        text_embed_dim=32,
    )
    tr = MaskGitTransformer(self_cond=self_cond, rngs=nnx.Rngs(0), **kw)
    vae = VQGanVAE(
        dim=16, layers=2, codebook_size=VOCAB, use_vgg_and_gan=False,
        rngs=nnx.Rngs(0),
    )
    tc = TokenCritic(rngs=nnx.Rngs(1), **kw) if critic else None
    return MaskGit(image_size=32, transformer=tr, vae=vae, token_critic=tc)


def _gen_kwargs():
    te = jax.random.normal(jax.random.PRNGKey(1), (B, 6, 32))
    noise = jax.random.gumbel(jax.random.PRNGKey(2), (T, B, SEQ, VOCAB))
    return dict(
        text_embeds=te,
        text_mask=jnp.ones((B, 6), bool),
        rng=jax.random.PRNGKey(3),
        timesteps=T,
        cond_scale=3.0,
        return_ids=True,
        injected_gumbel_noise=noise,
    )


@pytest.mark.parametrize("sampler", ["xla", "fused"])
def test_compact_matches_full_tokens(sampler):
    mg = _build()
    kwargs = _gen_kwargs()
    full = mg.generate(sampler=sampler, compact=False, **kwargs)
    comp = mg.generate(sampler=sampler, compact=True, **kwargs)
    assert full.shape == (B, 8, 8)
    assert jnp.array_equal(full, comp)


def test_compact_matches_full_with_token_critic():
    mg = _build(critic=True)
    kwargs = _gen_kwargs()
    full = mg.generate(sampler="xla", compact=False, **kwargs)
    comp = mg.generate(sampler="xla", compact=True, **kwargs)
    assert jnp.array_equal(full, comp)


def test_compact_auto_off_when_can_remask():
    # can_remask with the default scorer needs real confidence at unmasked
    # positions — compact would pin them; auto must fall back to full
    tr = MaskGitTransformer(
        num_tokens=VOCAB, dim=64, seq_len=SEQ, depth=2, dim_head=16, heads=4,
        text_embed_dim=32, rngs=nnx.Rngs(0),
    )
    vae = VQGanVAE(
        dim=16, layers=2, codebook_size=VOCAB, use_vgg_and_gan=False,
        rngs=nnx.Rngs(0),
    )
    mg = MaskGit(image_size=32, transformer=tr, vae=vae, no_mask_token_prob=0.1)
    kwargs = _gen_kwargs()
    out = mg.generate(
        sampler="xla", can_remask_prev_masked=True, **kwargs
    )
    assert out.shape == (B, 8, 8)


def test_compact_custom_schedule_step0_not_full():
    # ADVICE r2: a custom schedule with schedule(0) < 1 breaks the
    # refill-everything-at-step-0 invariant — _compact_segments must force
    # step 0 onto the full-sequence body so no mask_id survives to the VAE
    from muse_maskgit_pytorch_tpu.models.maskgit import _compact_segments

    def half_schedule(t):
        return 0.5 * jnp.cos(t * jnp.pi * 0.5)

    segs = _compact_segments(half_schedule, SEQ, T)
    assert segs[0][2] == SEQ  # step 0 bucket covers the whole sequence

    mg = _build(self_cond=False)
    mg.noise_schedule = half_schedule
    kwargs = _gen_kwargs()
    full = mg.generate(sampler="xla", compact=False, **kwargs)
    comp = mg.generate(sampler="xla", compact=True, **kwargs)
    # every position sampled (no out-of-codebook mask_id leaks), paths agree
    assert int(comp.max()) < VOCAB
    assert jnp.array_equal(full, comp)


def test_compact_explicit_true_with_can_remask_warns_and_falls_back():
    # ADVICE r2: explicit compact=True + can_remask_prev_masked without a
    # critic must warn and fall back rather than silently change semantics
    tr = MaskGitTransformer(
        num_tokens=VOCAB, dim=64, seq_len=SEQ, depth=2, dim_head=16, heads=4,
        text_embed_dim=32, rngs=nnx.Rngs(0),
    )
    vae = VQGanVAE(
        dim=16, layers=2, codebook_size=VOCAB, use_vgg_and_gan=False,
        rngs=nnx.Rngs(0),
    )
    mg = MaskGit(image_size=32, transformer=tr, vae=vae, no_mask_token_prob=0.1)
    kwargs = _gen_kwargs()
    ref = mg.generate(sampler="xla", can_remask_prev_masked=True, compact=False, **kwargs)
    with pytest.warns(UserWarning, match="can_remask_prev_masked"):
        out = mg.generate(
            sampler="xla", can_remask_prev_masked=True, compact=True, **kwargs
        )
    assert jnp.array_equal(ref, out)


def test_compact_no_injected_noise_runs():
    mg = _build(self_cond=False)
    te = jax.random.normal(jax.random.PRNGKey(1), (B, 6, 32))
    img = mg.generate(
        text_embeds=te,
        text_mask=jnp.ones((B, 6), bool),
        rng=jax.random.PRNGKey(3),
        timesteps=T,
        cond_scale=3.0,
        compact=True,
    )
    assert img.shape == (B, 32, 32, 3)
    assert bool(jnp.all(jnp.isfinite(img)))
