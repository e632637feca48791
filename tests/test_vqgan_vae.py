"""Component tests for the VQ-GAN VAE tokenizer (SURVEY.md §4 config 1:
dim=64, codebook 256, 64x64 encode->VQ->decode roundtrip on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE, Discriminator, gradient_penalty


def tiny_vae(use_vgg_and_gan=False, lfq=True, **kw):
    return VQGanVAE(
        dim=16,
        layers=2,
        codebook_size=256,
        lookup_free_quantization=lfq,
        use_vgg_and_gan=use_vgg_and_gan,
        rngs=nnx.Rngs(0),
        **kw,
    )


def test_shape_law_and_roundtrip(rng):
    vae = tiny_vae()
    img = jax.random.uniform(rng, (2, 32, 32, 3))
    fmap, ids, aux = vae.encode(img, train=False)
    # fmap_size = image_size / 2**layers (reference vqgan_vae.py:234-235)
    assert fmap.shape == (2, 8, 8, vae.encoded_dim)
    assert ids.shape == (2, 8, 8)
    recon = vae.decode(fmap)
    assert recon.shape == img.shape

    # decode_from_ids consistency: decoding the encoded ids must equal
    # decoding the quantized fmap (LFQ: codes are a pure function of ids)
    recon2 = vae.decode_from_ids(ids)
    np.testing.assert_allclose(np.asarray(recon), np.asarray(recon2), atol=1e-5)


def test_encode_deterministic(rng):
    vae = tiny_vae()
    img = jax.random.uniform(rng, (1, 32, 32, 3))
    ids1 = vae.encode(img, train=False)[1]
    ids2 = vae.encode(img, train=False)[1]
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))


def test_ema_vq_vae_roundtrip(rng):
    # the non-LFQ path is dead code in the reference (SURVEY §2.4 B2); here it works
    vae = tiny_vae(lfq=False, vq_kwargs=dict(codebook_dim=16, kmeans_init=False))
    img = jax.random.uniform(rng, (2, 32, 32, 3))
    fmap, ids, aux = vae.encode(img, train=False)
    assert ids.shape == (2, 8, 8)
    recon = vae.decode_from_ids(ids)
    assert recon.shape == img.shape


def test_recon_loss_only(rng):
    vae = tiny_vae(use_vgg_and_gan=False)
    img = jax.random.uniform(rng, (2, 32, 32, 3))
    loss = vae(img, return_loss=True)
    assert np.isfinite(float(loss))
    loss, recons = vae(img, return_loss=True, return_recons=True)
    assert recons.shape == img.shape


def test_gan_losses_finite(rng):
    vae = tiny_vae(use_vgg_and_gan=True)
    img = jax.random.uniform(rng, (2, 32, 32, 3))
    gen_loss = vae(img, return_loss=True)
    assert np.isfinite(float(gen_loss))
    discr_loss = vae(img, return_discr_loss=True, add_gradient_penalty=True)
    assert np.isfinite(float(discr_loss))


def test_gen_loss_differentiable(rng):
    vae = tiny_vae(use_vgg_and_gan=True)
    img = jax.random.uniform(rng, (1, 32, 32, 3))
    graphdef, state = nnx.split(vae)

    def loss_fn(state):
        model = nnx.merge(graphdef, state)
        return model(img, return_loss=True)

    grads = jax.grad(loss_fn)(state)
    flat = jax.tree.leaves(grads)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert np.isfinite(total) and total > 0


def test_discr_loss_differentiable_with_gp(rng):
    # grad-of-grad: the gradient penalty requires double backward through convs
    vae = tiny_vae(use_vgg_and_gan=True)
    img = jax.random.uniform(rng, (1, 32, 32, 3))
    graphdef, state = nnx.split(vae)

    def loss_fn(state):
        model = nnx.merge(graphdef, state)
        return model(img, return_discr_loss=True, add_gradient_penalty=True)

    grads = jax.grad(loss_fn)(state)
    assert np.isfinite(sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads)))


def test_gradient_penalty_value(rng):
    # for a linear "discriminator" sum(2*x), grad is 2 everywhere:
    # penalty = 10 * (||2 * ones(n)|| - 1)^2
    img = jax.random.uniform(rng, (3, 4, 4, 1))
    gp = gradient_penalty(img, lambda im: 2.0 * im)
    n = 4 * 4
    expected = 10 * (np.sqrt(n * 4.0) - 1) ** 2
    assert np.isclose(float(gp), expected, rtol=1e-5)


def test_copy_for_eval(rng):
    vae = tiny_vae(use_vgg_and_gan=True)
    eval_vae = vae.copy_for_eval()
    assert eval_vae.discr is None
    img = jax.random.uniform(rng, (1, 32, 32, 3))
    ids = eval_vae.encode(img, train=False)[1]
    np.testing.assert_array_equal(
        np.asarray(ids), np.asarray(vae.encode(img, train=False)[1])
    )


def test_save_load_roundtrip(tmp_path, rng):
    vae = tiny_vae()
    img = jax.random.uniform(rng, (1, 32, 32, 3))
    ids_before = np.asarray(vae.encode(img, train=False)[1])
    path = tmp_path / "vae.msgpack"
    vae.save(path)

    vae2 = VQGanVAE(
        dim=16,
        layers=2,
        codebook_size=256,
        use_vgg_and_gan=False,
        rngs=nnx.Rngs(42),  # different init
    )
    assert not np.array_equal(np.asarray(vae2.encode(img, train=False)[1]), ids_before)
    vae2.load(path)
    np.testing.assert_array_equal(
        np.asarray(vae2.encode(img, train=False)[1]), ids_before
    )


def test_discriminator_patch_output(rng):
    d = Discriminator(dims=(16, 16, 32), channels=3, rngs=nnx.Rngs(0))
    img = jax.random.uniform(rng, (2, 32, 32, 3))
    logits = d(img)
    # 32 -> 16 -> 8 spatial, then valid 4x4 conv -> 5x5 patch map
    assert logits.shape == (2, 5, 5, 1)


def test_image_size_divisibility_assert(rng):
    vae = tiny_vae()
    img = jax.random.uniform(rng, (1, 30, 30, 3))
    with pytest.raises(AssertionError):
        vae(img, return_loss=True)


def test_encdec_remat_matches_grads(rng):
    """encdec_remat=True must not change the GAN loss or its gradients —
    jax.checkpoint only changes WHEN activations are computed. (The remat
    option exists because the reference-scale GAN step exceeds one v5e's
    HBM at micro-batch 8 without it, BASELINE.md.)"""
    img = jax.random.uniform(rng, (1, 32, 32, 3))

    def gan_grads(remat):
        vae = tiny_vae(use_vgg_and_gan=True, encdec_remat=remat)
        graphdef, state = nnx.split(vae)

        def loss_fn(state):
            model = nnx.merge(graphdef, state)
            return model(img, return_loss=True)

        loss, grads = jax.value_and_grad(loss_fn)(state)
        return loss, grads

    l0, g0 = gan_grads(False)
    l1, g1 = gan_grads(True)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def test_bf16_loss_towers_losses_stay_f32(rng):
    """vgg_dtype / discr_dtype = bf16: both GAN phases train with finite f32
    losses (losses upcast regardless of tower compute dtype), and the
    gradient-penalty cond branches agree in dtype."""
    import jax.numpy as jnp

    vae = VQGanVAE(
        dim=16, layers=2, codebook_size=64, vgg_dtype=jnp.bfloat16,
        discr_dtype=jnp.bfloat16, rngs=nnx.Rngs(0),
    )
    img = jax.random.uniform(rng, (2, 16, 16, 3))
    gen = vae(img, return_loss=True, train=True)
    assert gen.dtype == jnp.float32 and np.isfinite(float(gen))
    for gp in (True, False):
        d = vae(img, return_discr_loss=True, add_gradient_penalty=gp, train=False)
        assert d.dtype == jnp.float32 and np.isfinite(float(d))
