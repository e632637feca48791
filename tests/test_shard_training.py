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


def _tiny_trainer(tmp_path, folder="r2", **kw):
    return MaskGitTrainer(
        MaskGit(
            image_size=16,
            transformer=MaskGitTransformer(
                num_tokens=32, dim=32, seq_len=16, depth=1,
                dim_head=16, heads=2, t5_name=TINY_T5, rngs=nnx.Rngs(0),
            ),
            vae=VQGanVAE(
                dim=16, layers=2, codebook_size=32, use_vgg_and_gan=False,
                rngs=nnx.Rngs(0),
            ),
        ),
        num_train_steps=kw.pop("num_train_steps", 2),
        batch_size=4,
        results_folder=str(tmp_path / folder),
        save_model_every=kw.pop("save_model_every", 10**9),
        use_ema=False,
        **kw,
    )


def test_train_from_shards_with_captions_and_resume(tmp_path, rng):
    """End-to-end: captioned shards -> train_from_shards (text conditioning
    through the fast ids path), then auto-resume continues BOTH the train
    state and the data stream (skip = steps * grad_accum_every)."""
    tokens = np.asarray(jax.random.randint(rng, (10, 16), 0, 32), np.int32)
    caps = [f"caption number {i}" for i in range(10)]
    shard = tmp_path / "tok.bin"
    write_shard(shard, tokens, captions=caps)

    folder = tmp_path / "run"
    t1 = _tiny_trainer(tmp_path, folder="run", num_train_steps=2, save_model_every=1)
    losses = []
    t1.train_from_shards(
        [shard], use_captions=True, loader_seed=9, num_threads=1,
        log_fn=lambda logs: losses.append(logs["loss"]),
    )
    assert t1.steps == 2 and len(losses) == 2
    assert all(np.isfinite(l) for l in losses)

    # crash/restart: a fresh trainer on the same folder resumes at step 2 and
    # trains the remaining steps from the CONTINUED shuffle stream
    t2 = _tiny_trainer(
        tmp_path, folder="run", num_train_steps=4, save_model_every=10**9,
        auto_resume=True,
    )
    assert t2.steps == 2
    t2.train_from_shards([shard], use_captions=True, loader_seed=9, num_threads=1)
    assert t2.steps == 4


def test_train_from_shards_unconditional(tmp_path, rng):
    tokens = np.asarray(jax.random.randint(rng, (8, 16), 0, 32), np.int32)
    shard = tmp_path / "tok_nocap.bin"
    write_shard(shard, tokens)
    t = _tiny_trainer(tmp_path, folder="run-uncond", num_train_steps=2)
    t.train_from_shards([shard], use_captions=False, num_threads=1)
    assert t.steps == 2


def test_train_from_paired_cond_shards(tmp_path, rng):
    """Super-res training from PAIRED shards: each row = [target ids ++
    low-res cond ids] (tokenize_dataset.py --cond-image-size layout);
    train_from_shards(cond_token_len=) feeds the trailing ids to the
    cross-attention context. One loader = one shuffle stream, so the pair
    can never misalign."""
    codebook, seq_len, cond_len = 32, 16, 4

    rng_np = np.random.default_rng(0)
    target = rng_np.integers(0, codebook, size=(12, seq_len)).astype(np.int32)
    cond = rng_np.integers(0, codebook, size=(12, cond_len)).astype(np.int32)
    write_shard(tmp_path / "paired.bin", np.concatenate([target, cond], axis=1))

    trainer = MaskGitTrainer(
        MaskGit(
            image_size=16,
            transformer=MaskGitTransformer(
                num_tokens=codebook, dim=32, seq_len=seq_len, depth=1,
                dim_head=16, heads=2, t5_name=TINY_T5, rngs=nnx.Rngs(0),
            ),
        ),
        num_train_steps=3,
        batch_size=4,
        results_folder=str(tmp_path / "rc"),
        save_model_every=10**9,
        use_ema=False,
    )
    losses = []
    trainer.train_from_shards(
        [tmp_path / "paired.bin"],
        cond_token_len=cond_len,
        log_fn=lambda logs: losses.append(logs["loss"]),
    )
    assert len(losses) == 3 and all(np.isfinite(l) for l in losses)


def test_train_step_arrays_cond_matches_direct(tmp_path, rng):
    """The trainer's cond plumbing computes the same loss as calling the
    model directly with cond_token_ids (same params, same rng split)."""
    codebook, seq_len, cond_len = 32, 16, 4
    mg = MaskGit(
        image_size=16,
        transformer=MaskGitTransformer(
            num_tokens=codebook, dim=32, seq_len=seq_len, depth=1,
            dim_head=16, heads=2, t5_name=TINY_T5, rngs=nnx.Rngs(0),
        ),
    )
    trainer = MaskGitTrainer(
        mg, num_train_steps=1, batch_size=4,
        results_folder=str(tmp_path / "rd"), save_model_every=10**9,
        use_ema=False, seed=7,
    )
    rng_np = np.random.default_rng(1)
    ids = rng_np.integers(0, codebook, size=(1, 4, seq_len)).astype(np.int32)
    cond = rng_np.integers(0, codebook, size=(1, 4, cond_len)).astype(np.int32)
    te = rng_np.normal(size=(1, 4, 6, 32)).astype(np.float32)
    tm = np.ones((1, 4, 6), bool)

    # direct loss with the SAME key the step will draw
    key0 = jax.random.split(jax.random.PRNGKey(7), 2)[1]
    direct = float(
        mg(
            jnp.asarray(ids[0]), rng=key0, text_embeds=jnp.asarray(te[0]),
            text_mask=jnp.asarray(tm[0]), cond_token_ids=jnp.asarray(cond[0]),
        )
    )
    logs = trainer.train_step_arrays(ids, te, tm, cond_token_ids=cond)
    np.testing.assert_allclose(logs["loss"], direct, rtol=1e-5)
