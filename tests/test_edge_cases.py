"""Edge-case coverage: the reference's less-traveled configuration paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from muse_maskgit_pytorch_tpu.models import t5 as t5mod
from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit
from muse_maskgit_pytorch_tpu.models.t5 import T5Config
from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer, Transformer
from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE

TINY_T5 = "test/tiny-t5"
if TINY_T5 not in t5mod.T5_CONFIGS:
    t5mod.T5_CONFIGS[TINY_T5] = T5Config(32, 64, 2, 16, 2, True)


def test_grayscale_vae_with_gan(rng):
    """channels=1: VGG input gets repeated to 3 channels (reference
    vqgan_vae.py:505-507)."""
    vae = VQGanVAE(
        dim=16, layers=2, channels=1, codebook_size=64, use_vgg_and_gan=True,
        rngs=nnx.Rngs(0),
    )
    img = jax.random.uniform(rng, (1, 32, 32, 1))
    loss = vae(img, return_loss=True)
    assert np.isfinite(float(loss))
    d_loss = vae(img, return_discr_loss=True)
    assert np.isfinite(float(d_loss))


def test_l2_recon_and_bce_gan_losses(rng):
    """l2_recon_loss=True + use_hinge_loss=False (BCE GAN, reference
    vqgan_vae.py:346,370-371)."""
    vae = VQGanVAE(
        dim=16, layers=2, codebook_size=64, l2_recon_loss=True,
        use_hinge_loss=False, use_vgg_and_gan=True, rngs=nnx.Rngs(0),
    )
    img = jax.random.uniform(rng, (1, 32, 32, 3))
    assert np.isfinite(float(vae(img, return_loss=True)))
    assert np.isfinite(float(vae(img, return_discr_loss=True)))


def test_custom_layer_mults_and_resnet_blocks(rng):
    """encdec kwargs routed via the prefix router (reference
    vqgan_vae.py:312-313)."""
    vae = VQGanVAE(
        dim=16, layers=3, codebook_size=64, use_vgg_and_gan=False,
        encdec_layer_mults=[1, 2, 4],
        encdec_num_resnet_blocks=(0, 1, 1),
        rngs=nnx.Rngs(0),
    )
    img = jax.random.uniform(rng, (1, 32, 32, 3))
    fmap, ids, _ = vae.encode(img)
    assert ids.shape == (1, 4, 4)  # 32 / 2**3
    assert vae.decode(fmap).shape == img.shape


def _maskgit(no_mask_token_prob=0.0):
    vae = VQGanVAE(dim=16, layers=2, codebook_size=32, use_vgg_and_gan=False, rngs=nnx.Rngs(0))
    tr = MaskGitTransformer(
        num_tokens=32, dim=32, seq_len=16, depth=1, dim_head=16, heads=2,
        t5_name=TINY_T5, rngs=nnx.Rngs(0),
    )
    return MaskGit(
        image_size=16, transformer=tr, vae=vae,
        no_mask_token_prob=no_mask_token_prob,
    )


def test_no_mask_token_prob_training(rng):
    """BERT-style kept-unmasked tokens (reference :682-686)."""
    mg = _maskgit(no_mask_token_prob=0.3)
    imgs = jax.random.uniform(rng, (2, 16, 16, 3))
    te = jax.random.normal(rng, (2, 5, 32))
    loss = mg(imgs, rng=rng, text_embeds=te)
    assert np.isfinite(float(loss))


def test_can_remask_prev_masked_generate(rng):
    """can_remask path requires no_mask_token_prob > 0 (reference :608-611)."""
    mg = _maskgit(no_mask_token_prob=0.2)
    te = jax.random.normal(rng, (1, 5, 32))
    imgs = mg.generate(
        text_embeds=te, rng=rng, timesteps=3, can_remask_prev_masked=True
    )
    assert np.isfinite(np.asarray(imgs)).all()

    mg0 = _maskgit(no_mask_token_prob=0.0)
    with pytest.raises(AssertionError):
        mg0.generate(text_embeds=te, rng=rng, timesteps=2, can_remask_prev_masked=True)


def test_sample_temperature_fixed(rng):
    """explicit critic sample_temperature (reference :728)."""
    mg = MaskGit(
        image_size=16,
        transformer=MaskGitTransformer(
            num_tokens=32, dim=32, seq_len=16, depth=1, dim_head=16, heads=2,
            t5_name=TINY_T5, rngs=nnx.Rngs(0),
        ),
        vae=VQGanVAE(dim=16, layers=2, codebook_size=32, use_vgg_and_gan=False, rngs=nnx.Rngs(0)),
        self_token_critic=True,
        rngs=nnx.Rngs(1),
    )
    imgs = jax.random.uniform(rng, (2, 16, 16, 3))
    te = jax.random.normal(rng, (2, 5, 32))
    loss = mg(imgs, rng=rng, text_embeds=te, sample_temperature=0.7)
    assert np.isfinite(float(loss))


def test_transformer_custom_dim_out(rng):
    t = Transformer(
        num_tokens=32, dim=32, seq_len=16, dim_out=5, depth=1, dim_head=16,
        heads=2, text_embed_dim=32, rngs=nnx.Rngs(0),
    )
    logits = t(
        jax.random.randint(rng, (1, 16), 0, 32),
        text_embeds=jax.random.normal(rng, (1, 4, 32)),
    )
    assert logits.shape == (1, 16, 5)


def test_trainer_grad_clipping(tmp_path):
    from muse_maskgit_pytorch_tpu.training.trainers import MaskGitTrainer

    trainer = MaskGitTrainer(
        _maskgit(),
        num_train_steps=1,
        batch_size=2,
        max_grad_norm=0.5,
        results_folder=str(tmp_path),
        save_model_every=10**9,
        use_ema=False,
    )
    rng = np.random.default_rng(0)
    logs = trainer.train_step_arrays(
        rng.uniform(size=(1, 2, 16, 16, 3)).astype(np.float32),
        rng.normal(size=(1, 2, 5, 32)).astype(np.float32),
        np.ones((1, 2, 5), bool),
    )
    assert np.isfinite(logs["loss"])


def test_ignore_index_zero_default(rng):
    """Transformer.forward's default ignore_index is 0 (reference :286)."""
    t = MaskGitTransformer(
        num_tokens=32, dim=32, seq_len=8, depth=1, dim_head=16, heads=2,
        text_embed_dim=32, rngs=nnx.Rngs(0),
    )
    x = jax.random.randint(rng, (1, 8), 0, 32)
    te = jax.random.normal(rng, (1, 4, 32))
    labels_all_zero = jnp.zeros((1, 8), jnp.int32)
    loss = t(x, text_embeds=te, labels=labels_all_zero)  # everything ignored
    assert float(loss) == 0.0
