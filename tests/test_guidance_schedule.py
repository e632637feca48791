"""Guidance-scale schedules (Muse paper §2.5: linearly increasing CFG scale
across decode steps — absent from the reference, which hardcodes a constant
scale per generate call, muse_maskgit_pytorch.py:250-259).

Contract: cond_scale=(c, c) is TOKEN-EXACT with cond_scale=c on both sampler
paths (the schedule machinery adds nothing when the ramp is flat), a real
ramp produces valid in-codebook tokens that differ from the constant run,
and the fused kernel accepts a traced scale via its scalar-prefetch path."""

import jax
import jax.numpy as jnp
import numpy as np

from muse_maskgit_pytorch_tpu.ops.sampling_kernel import fused_topk_gumbel_sample

from tests.test_maskgit import CODEBOOK, base_maskgit, text_embeds_for


def _ids(mg, rng, te, **kw):
    out = mg.generate(
        text_embeds=te, rng=rng, timesteps=4, return_ids=True, **kw
    )
    return np.asarray(out.reshape(out.shape[0], -1))


def test_flat_schedule_matches_constant_xla(rng):
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    const = _ids(mg, rng, te, cond_scale=3.0, sampler="xla")
    flat = _ids(mg, rng, te, cond_scale=(3.0, 3.0), sampler="xla")
    np.testing.assert_array_equal(const, flat)


def test_flat_schedule_matches_constant_fused_interpret(rng):
    # fused sampler path (TPU interpreter on CPU): the traced scalar-prefetch
    # scale must reproduce the compile-time-constant combine bit-exactly
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    const = _ids(mg, rng, te, cond_scale=3.0, sampler="fused")
    flat = _ids(mg, rng, te, cond_scale=(3.0, 3.0), sampler="fused")
    np.testing.assert_array_equal(const, flat)


def test_ramp_generates_valid_and_distinct(rng):
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    ramp = _ids(mg, rng, te, cond_scale=(1.0, 6.0), sampler="xla")
    const = _ids(mg, rng, te, cond_scale=3.0, sampler="xla")
    assert (ramp >= 0).all() and (ramp < CODEBOOK).all()
    assert not np.array_equal(ramp, const)


def test_ramp_composes_with_critic_and_edit(rng):
    from flax import nnx

    mg = base_maskgit(self_token_critic=True, rngs=nnx.Rngs(0))
    te = text_embeds_for(2, rng)
    out = _ids(mg, rng, te, cond_scale=(1.0, 5.0))
    assert (out >= 0).all() and (out < CODEBOOK).all()

    mg2 = base_maskgit()
    images = jax.random.uniform(rng, (2, 16, 16, 3))
    mask = np.zeros((2, 4, 4), bool)
    mask[:, :2, :] = True
    _, src, _ = mg2.vae.encode(images, train=False)
    src = np.asarray(src).reshape(2, -1)
    edited = mg2.edit(
        images, jnp.asarray(mask), text_embeds=te, rng=rng, timesteps=3,
        return_ids=True, cond_scale=(1.0, 5.0),
    )
    edited = np.asarray(edited.reshape(2, -1))
    keep = ~mask.reshape(2, -1)
    assert (edited[keep] == src[keep]).all()


def test_kernel_traced_scale_matches_static():
    # isolated kernel: cond_scale as traced scalar == python float
    rng = np.random.default_rng(0)
    rows, V = 8, 512
    logits = jnp.asarray(rng.normal(size=(2 * rows, V)).astype(np.float32))
    noise = jnp.asarray(rng.gumbel(size=(rows, V)).astype(np.float32))
    kw = dict(noise=noise, interpret=jax.default_backend() != "tpu", cfg_pair=True)
    idx_f, prob_f = fused_topk_gumbel_sample(
        logits, 51, jnp.float32(0.7), jnp.int32(3), cond_scale=2.5, **kw
    )
    idx_t, prob_t = fused_topk_gumbel_sample(
        logits, 51, jnp.float32(0.7), jnp.int32(3),
        cond_scale=jnp.float32(2.5), **kw
    )
    np.testing.assert_array_equal(np.asarray(idx_f), np.asarray(idx_t))
    np.testing.assert_allclose(np.asarray(prob_f), np.asarray(prob_t), rtol=1e-6)


def test_dynamic_scale_matches_static(rng):
    """A jax-scalar cond_scale (traced input) is token-exact with the same
    static float, and new values do NOT recompile the decode program."""
    from muse_maskgit_pytorch_tpu.models.maskgit import _generate_jit

    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    for v in (3.0, 7.5):
        a = mg.generate(
            text_embeds=te, rng=rng, timesteps=3, cond_scale=v, return_ids=True
        )
        b = mg.generate(
            text_embeds=te, rng=rng, timesteps=3, cond_scale=jnp.float32(v),
            return_ids=True,
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    n0 = _generate_jit._cache_size()
    mg.generate(
        text_embeds=te, rng=rng, timesteps=3, cond_scale=jnp.float32(1.25),
        return_ids=True,
    )
    assert _generate_jit._cache_size() == n0, "dynamic scale must not recompile"


def test_dynamic_per_step_scale_array_matches_tuple(rng):
    # a traced (timesteps,) schedule == the static (start, end) ramp
    mg = base_maskgit()
    te = text_embeds_for(2, rng)
    T = 4
    a = mg.generate(
        text_embeds=te, rng=rng, timesteps=T, cond_scale=(1.0, 4.0),
        return_ids=True,
    )
    b = mg.generate(
        text_embeds=te, rng=rng, timesteps=T,
        cond_scale=jnp.linspace(1.0, 4.0, T), return_ids=True,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
