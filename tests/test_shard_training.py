"""Integration: pre-tokenized shards (native C++ loader) -> MaskGit training
from raw token ids (the large-scale training path wired by
examples/tokenize_dataset.py)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from muse_maskgit_pytorch_tpu.models import t5 as t5mod
from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit
from muse_maskgit_pytorch_tpu.models.t5 import T5Config
from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer
from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE
from muse_maskgit_pytorch_tpu.training.shard_loader import ShardLoader, write_shard
from muse_maskgit_pytorch_tpu.training.trainers import MaskGitTrainer

TINY_T5 = "test/tiny-t5"
if TINY_T5 not in t5mod.T5_CONFIGS:
    t5mod.T5_CONFIGS[TINY_T5] = T5Config(32, 64, 2, 16, 2, True)


def test_tokenize_then_train_from_shards(tmp_path, rng):
    codebook, seq_len = 32, 16

    # 1) tokenize a synthetic image set through the frozen VAE (the
    # examples/tokenize_dataset.py flow)
    vae = VQGanVAE(
        dim=16, layers=2, codebook_size=codebook, use_vgg_and_gan=False,
        rngs=nnx.Rngs(0),
    )
    images = jax.random.uniform(rng, (12, 16, 16, 3))
    _, ids, _ = vae.encode(images, train=False)
    tokens = np.asarray(ids).reshape(12, -1).astype(np.int32)
    assert tokens.shape == (12, seq_len)

    shard_path = tmp_path / "tokens.bin"
    write_shard(shard_path, tokens)

    # 2) stream shards through the native loader into the trainer (ids path:
    # MaskGit.forward accepts raw token ids, reference :637-645)
    loader = ShardLoader([shard_path], batch_size=4, seed=0)
    trainer = MaskGitTrainer(
        MaskGit(
            image_size=16,
            transformer=MaskGitTransformer(
                num_tokens=codebook, dim=32, seq_len=seq_len, depth=1,
                dim_head=16, heads=2, t5_name=TINY_T5, rngs=nnx.Rngs(0),
            ),
            vae=vae,
        ),
        num_train_steps=3,
        batch_size=4,
        results_folder=str(tmp_path / "r"),
        save_model_every=10**9,
        use_ema=False,
    )

    te = np.random.default_rng(0).normal(size=(1, 4, 6, 32)).astype(np.float32)
    tm = np.ones((1, 4, 6), bool)
    for _ in range(3):
        batch = loader.next_batch()  # (4, seq_len) int32 from the C++ loader
        logs = trainer.train_step_arrays(batch[None].astype(np.int32), te, tm)
        assert np.isfinite(logs["loss"])
    assert trainer.steps == 3
    loader.close()
