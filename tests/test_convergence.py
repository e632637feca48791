"""Convergence smoke tests (SURVEY.md §7 hard part 3: "validated by training
the tiny config-1 VAE"): a few dozen optimization steps on a fixed synthetic
batch must materially reduce reconstruction error, for both quantizers."""

import numpy as np
import pytest
from flax import nnx

import jax
import jax.numpy as jnp

from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE
from muse_maskgit_pytorch_tpu.training.trainers import VQGanVAETrainer


class FixedDataset:
    """Small synthetic dataset: smooth color gradients + shapes."""

    def __init__(self, n=8, size=16):
        rng = np.random.default_rng(0)
        xs = np.linspace(0, 1, size)
        imgs = []
        for i in range(n):
            gx, gy = rng.uniform(0.2, 1, 2)
            mx, my = np.meshgrid(xs * gx, xs * gy, indexing="ij")
            img = np.stack([mx, my, np.full((size, size), rng.uniform())], axis=-1)
            imgs.append(img)
        self.data = np.stack(imgs).astype(np.float32)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return self.data[i]


@pytest.mark.parametrize("lfq", [True, False], ids=["lfq", "ema-vq"])
def test_vae_recon_improves(tmp_path, lfq):
    vae = VQGanVAE(
        dim=16,
        layers=2,
        codebook_size=64,
        lookup_free_quantization=lfq,
        vq_kwargs=dict(codebook_dim=16, kmeans_init=True),
        use_vgg_and_gan=False,  # pure reconstruction objective
        rngs=nnx.Rngs(0),
    )
    trainer = VQGanVAETrainer(
        vae,
        folder=None,
        dataset=FixedDataset(),
        num_train_steps=40,
        batch_size=4,
        image_size=16,
        lr=2e-3,
        valid_frac=0.0,
        use_ema=False,
        save_results_every=10**9,
        save_model_every=10**9,
        results_folder=str(tmp_path / "r"),
    )
    losses = []
    trainer.train(lambda logs: losses.append(logs["loss"]))
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < 0.7 * first, (first, last)


def test_lfq_entropy_gradient_diversifies():
    """Optimizing ONLY the LFQ entropy/diversity objective on collapsed
    latents must spread codebook usage (the gradient direction the reference
    gets from vector_quantize_pytorch's LFQ, vqgan_vae.py:330-335)."""
    import optax

    from muse_maskgit_pytorch_tpu.models.quantizers import LFQ

    q = LFQ(dim=6, codebook_size=64, diversity_gamma=4.0, rngs=nnx.Rngs(0))

    # collapsed latents: every sample near the SAME code. Magnitudes are kept
    # small: at |z| ~ 1 the inv_temperature=100 softmax saturates and the
    # entropy gradient vanishes (true of the reference's LFQ too) — the loss
    # shapes codes while they are still undecided, early in training.
    z = 0.02 * jnp.tile(jnp.array([[1.0, 1.0, 1.0, -1.0, -1.0, -1.0]]), (128, 1))
    z = z + 0.002 * jax.random.normal(jax.random.PRNGKey(0), z.shape)

    def usage(z):
        return len(np.unique(np.asarray(q(z, train=False)[1])))

    tx = optax.sgd(1e-3)
    opt = tx.init(z)

    @jax.jit
    def step(z, opt):
        loss, grads = jax.value_and_grad(lambda z: q._entropy_aux_loss(z))(z)
        updates, opt = tx.update(grads, opt, z)
        return optax.apply_updates(z, updates), opt, loss

    before = usage(z)
    for _ in range(100):
        z, opt, _ = step(z, opt)
    after = usage(z)
    assert before <= 2, before
    assert after > before, (before, after)
    assert after >= 16, after  # strong diversification
