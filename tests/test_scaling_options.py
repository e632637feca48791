"""Scaling knobs: activation rematerialization, bf16 compute dtype."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer
from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE


def test_remat_forward_matches_plain(rng):
    kwargs = dict(
        num_tokens=32, dim=64, seq_len=16, depth=2, dim_head=16, heads=4,
        text_embed_dim=32,
    )
    plain = MaskGitTransformer(rngs=nnx.Rngs(0), **kwargs)
    remat = MaskGitTransformer(rngs=nnx.Rngs(0), remat=True, **kwargs)

    x = jax.random.randint(rng, (2, 16), 0, 32)
    te = jax.random.normal(rng, (2, 5, 32))
    np.testing.assert_allclose(
        np.asarray(plain(x, text_embeds=te)),
        np.asarray(remat(x, text_embeds=te)),
        atol=1e-5,
    )


def test_remat_gradients_match_plain(rng):
    kwargs = dict(
        num_tokens=32, dim=64, seq_len=16, depth=2, dim_head=16, heads=4,
        text_embed_dim=32,
    )
    x = jax.random.randint(rng, (2, 16), 0, 32)
    te = jax.random.normal(rng, (2, 5, 32))
    labels = jax.random.randint(rng, (2, 16), 0, 32)

    def grads_for(remat):
        model = MaskGitTransformer(rngs=nnx.Rngs(0), remat=remat, **kwargs)
        graphdef, state = nnx.split(model)

        def loss(state):
            return nnx.merge(graphdef, state)(x, text_embeds=te, labels=labels)

        return jax.grad(loss)(state)

    g_plain, g_remat = grads_for(False), grads_for(True)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_vae_bf16_compute(rng):
    vae = VQGanVAE(
        dim=16, layers=2, codebook_size=256, use_vgg_and_gan=False,
        dtype=jnp.bfloat16, rngs=nnx.Rngs(0),
    )
    img = jax.random.uniform(rng, (1, 32, 32, 3))
    fmap, ids, _ = vae.encode(img, train=False)
    recon = vae.decode_from_ids(ids)
    assert recon.shape == img.shape
    assert np.isfinite(np.asarray(recon, np.float32)).all()
    loss = vae(img, return_loss=True)
    assert np.isfinite(float(loss))
