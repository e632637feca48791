"""Trainer tests: VQGanVAETrainer GAN loop and MaskGitTrainer end-to-end on
tiny configs, EMA semantics, checkpoint resume (SURVEY.md §4 + §5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import nnx

from muse_maskgit_pytorch_tpu.models import t5 as t5mod
from muse_maskgit_pytorch_tpu.models.maskgit import MaskGit
from muse_maskgit_pytorch_tpu.models.t5 import T5Config
from muse_maskgit_pytorch_tpu.models.transformer import MaskGitTransformer
from muse_maskgit_pytorch_tpu.models.vqgan_vae import VQGanVAE
from muse_maskgit_pytorch_tpu.training.ema import ema_init, ema_update
from muse_maskgit_pytorch_tpu.training.trainers import MaskGitTrainer, VQGanVAETrainer

TINY_T5 = "test/tiny-t5"
if TINY_T5 not in t5mod.T5_CONFIGS:
    t5mod.T5_CONFIGS[TINY_T5] = T5Config(
        d_model=32, d_ff=64, num_heads=2, d_kv=16, num_layers=2, gated=True
    )


class ArrayDataset:
    """In-memory random image dataset (avoids disk I/O in unit tests)."""

    def __init__(self, n, size, seed=0):
        rng = np.random.default_rng(seed)
        self.data = rng.uniform(size=(n, size, size, 3)).astype(np.float32)

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return self.data[i]


def tiny_vae(use_gan=True):
    return VQGanVAE(
        dim=16, layers=2, codebook_size=256, use_vgg_and_gan=use_gan, rngs=nnx.Rngs(0)
    )


def test_ema_semantics():
    params = {"w": jnp.ones(3)}
    ema = ema_init(params)
    new_params = {"w": jnp.full(3, 2.0)}
    # before update_after_step: copy
    e = ema_update(ema, new_params, step=0, beta=0.9, update_after_step=5)
    np.testing.assert_allclose(np.asarray(e["w"]), 2.0)
    # after: lerp
    e = ema_update(ema, new_params, step=10, beta=0.9, update_after_step=5)
    np.testing.assert_allclose(np.asarray(e["w"]), 0.9 * 1 + 0.1 * 2)
    # update_every gates
    e = ema_update(ema, new_params, step=11, beta=0.9, update_after_step=5, update_every=2)
    np.testing.assert_allclose(np.asarray(e["w"]), 1.0)


@pytest.mark.slow
def test_vqgan_trainer_steps(tmp_path):
    trainer = VQGanVAETrainer(
        tiny_vae(use_gan=False),  # no VGG: fast on CPU
        folder=None,
        dataset=ArrayDataset(16, 16),
        num_train_steps=3,
        batch_size=2,
        image_size=16,
        grad_accum_every=2,
        save_results_every=1000,
        save_model_every=1000,
        results_folder=str(tmp_path / "results"),
        valid_frac=0.25,
        use_ema=True,
    )
    losses = []
    trainer.train(lambda logs: losses.append(logs["loss"]))
    assert trainer.steps == 3
    assert all(np.isfinite(l) for l in losses)


@pytest.mark.slow
def test_vqgan_trainer_gan_path(tmp_path):
    trainer = VQGanVAETrainer(
        tiny_vae(use_gan=True),
        folder=None,
        dataset=ArrayDataset(8, 16),
        num_train_steps=1,
        batch_size=2,
        image_size=16,
        save_results_every=1000,
        save_model_every=1000,
        results_folder=str(tmp_path / "results"),
        valid_frac=0.0,
        use_ema=False,
        apply_grad_penalty_every=1,
    )
    logs = trainer.train_step()
    assert np.isfinite(logs["loss"]) and np.isfinite(logs["discr_loss"])


def _tiny_maskgit():
    vae = VQGanVAE(
        dim=16, layers=2, codebook_size=32, use_vgg_and_gan=False, rngs=nnx.Rngs(0)
    )
    transformer = MaskGitTransformer(
        num_tokens=32,
        dim=32,
        seq_len=16,
        depth=1,
        dim_head=16,
        heads=2,
        t5_name=TINY_T5,
        rngs=nnx.Rngs(0),
    )
    return MaskGit(image_size=16, transformer=transformer, vae=vae)


def test_maskgit_trainer_step_and_loss_decreases(tmp_path):
    trainer = MaskGitTrainer(
        _tiny_maskgit(),
        num_train_steps=8,
        batch_size=2,
        lr=1e-3,
        results_folder=str(tmp_path / "mg"),
        use_ema=True,
        save_model_every=10**9,
    )
    rng = np.random.default_rng(0)
    images = rng.uniform(size=(1, 2, 16, 16, 3)).astype(np.float32)
    te = rng.normal(size=(1, 2, 6, 32)).astype(np.float32)
    tm = np.ones((1, 2, 6), bool)

    losses = [trainer.train_step_arrays(images, te, tm)["loss"] for _ in range(8)]
    assert all(np.isfinite(l) for l in losses)
    # same batch every step: loss must trend down
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_maskgit_trainer_trains_token_critic(tmp_path):
    """Joint generator+critic training (the reference README's token-critic
    TODO, never finished upstream): the trainer's trainable partition must
    include the critic head — its params get gradients and move — and the
    joint CE + BCE loss stays finite."""
    vae = VQGanVAE(
        dim=16, layers=2, codebook_size=32, use_vgg_and_gan=False, rngs=nnx.Rngs(0)
    )
    transformer = MaskGitTransformer(
        num_tokens=32, dim=32, seq_len=16, depth=1, dim_head=16, heads=2,
        t5_name=TINY_T5, rngs=nnx.Rngs(0),
    )
    mg = MaskGit(
        image_size=16, transformer=transformer, vae=vae,
        self_token_critic=True, rngs=nnx.Rngs(0),
    )
    trainer = MaskGitTrainer(
        mg, num_train_steps=4, batch_size=2, lr=1e-3,
        results_folder=str(tmp_path / "mgc"), use_ema=False,
        save_model_every=10**9,
    )
    critic_before = jax.tree.map(
        np.array,
        [l for p, l in jax.tree_util.tree_leaves_with_path(trainer.state["params"])
         if "token_critic" in jax.tree_util.keystr(p)],
    )
    assert critic_before, "critic params missing from the trainable partition"
    rng = np.random.default_rng(0)
    images = rng.uniform(size=(1, 2, 16, 16, 3)).astype(np.float32)
    te = rng.normal(size=(1, 2, 6, 32)).astype(np.float32)
    tm = np.ones((1, 2, 6), bool)
    for _ in range(3):
        out = trainer.train_step_arrays(images, te, tm)
        assert np.isfinite(out["loss"])
    critic_after = [
        l for p, l in jax.tree_util.tree_leaves_with_path(trainer.state["params"])
        if "token_critic" in jax.tree_util.keystr(p)
    ]
    moved = any(
        not np.allclose(np.asarray(a), b) for a, b in zip(critic_after, critic_before)
    )
    assert moved, "critic params did not receive gradients"


def test_maskgit_trainer_data_loop(tmp_path):
    trainer = MaskGitTrainer(
        _tiny_maskgit(),
        num_train_steps=2,
        batch_size=2,
        results_folder=str(tmp_path / "mg2"),
        save_model_every=10**9,
        use_ema=False,
    )
    rng = np.random.default_rng(0)

    def data_gen():
        while True:
            yield rng.uniform(size=(2, 16, 16, 3)).astype(np.float32), ["a cat", "a dog"]

    trainer.train(data_gen())
    assert trainer.steps == 2


def test_maskgit_trainer_periodic_samples(tmp_path):
    folder = tmp_path / "mg-samples"
    trainer = MaskGitTrainer(
        _tiny_maskgit(),
        num_train_steps=2,
        batch_size=2,
        results_folder=str(folder),
        save_model_every=10**9,
        use_ema=False,
        save_results_every=2,
        sample_texts=["a cat", "a dog"],
        sample_kwargs=dict(timesteps=2, cond_scale=1.0),
    )
    rng = np.random.default_rng(0)

    def data_gen():
        while True:
            yield rng.uniform(size=(2, 16, 16, 3)).astype(np.float32), ["a cat", "a dog"]

    trainer.train(data_gen())
    assert (folder / "maskgit.0.png").exists()
    from PIL import Image

    img = Image.open(folder / "maskgit.0.png")
    assert img.size[0] > 16 and img.size[1] > 16  # a grid, not a blank stub


def test_maskgit_trainer_checkpoint_resume(tmp_path):
    folder = str(tmp_path / "mg3")
    t1 = MaskGitTrainer(
        _tiny_maskgit(),
        num_train_steps=2,
        batch_size=2,
        results_folder=folder,
        save_model_every=10**9,
        use_ema=False,
    )
    rng = np.random.default_rng(0)
    images = rng.uniform(size=(1, 2, 16, 16, 3)).astype(np.float32)
    te = rng.normal(size=(1, 2, 6, 32)).astype(np.float32)
    tm = np.ones((1, 2, 6), bool)
    t1.train_step_arrays(images, te, tm)
    t1.save()
    step_saved = t1.steps
    w_saved = np.asarray(jax.tree.leaves(t1.state["params"])[0])

    t2 = MaskGitTrainer(
        _tiny_maskgit(),
        num_train_steps=2,
        batch_size=2,
        results_folder=folder,
        save_model_every=10**9,
        use_ema=False,
    )
    t2.load()
    # full train state restored, including step (the reference lost it —
    # trainers.py:253-273)
    assert t2.steps == step_saved
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(t2.state["params"])[0]), w_saved
    )


def test_checkpoint_retention_and_tmp_dir_robustness(tmp_path):
    """`keep=N` prunes all but the newest N finalized checkpoints, and step
    listing ignores Orbax tmp dirs (a process killed mid-save must not break
    `auto_resume` with a ValueError, nor be resumed from)."""
    from muse_maskgit_pytorch_tpu.utils.checkpoint import (
        finalized_steps,
        latest_step,
        load_train_state,
        save_train_state,
    )

    ckpt = tmp_path / "ckpts"
    tree = {"w": jnp.arange(4.0), "step": jnp.zeros((), jnp.int32)}
    for s in (1, 2, 3):
        save_train_state(ckpt, s, tree, keep=2)
    assert finalized_steps(ckpt) == [2, 3]
    assert latest_step(ckpt) == 3

    # a leftover in-flight tmp dir neither crashes listing nor wins latest
    (ckpt / "step_00000099.orbax-checkpoint-tmp-1234567").mkdir()
    assert finalized_steps(ckpt) == [2, 3]
    assert latest_step(ckpt) == 3
    restored, s = load_train_state(ckpt, target=tree)
    assert s == 3
    np.testing.assert_allclose(np.asarray(restored["w"]), np.arange(4.0))

    # keep=1 on the next save prunes everything but the new step
    save_train_state(ckpt, 4, tree, keep=1)
    assert finalized_steps(ckpt) == [4]


def test_lr_schedule_shapes():
    from muse_maskgit_pytorch_tpu.training.trainers import lr_schedule

    # both knobs off -> plain float (reference fixed-lr behavior)
    assert lr_schedule(3e-4) == 3e-4
    sched = lr_schedule(1e-3, warmup_steps=10, decay_steps=100, end_lr_ratio=0.1)
    assert float(sched(0)) == 0.0
    assert np.isclose(float(sched(5)), 5e-4)
    assert np.isclose(float(sched(10)), 1e-3)  # warmup done -> peak
    assert float(sched(60)) < 1e-3  # decaying
    assert np.isclose(float(sched(10 + 100)), 1e-4)  # floor = end_lr_ratio * lr


def test_maskgit_trainer_schedule_and_grad_norm_logs(tmp_path):
    trainer = MaskGitTrainer(
        _tiny_maskgit(),
        num_train_steps=4,
        batch_size=2,
        lr=1e-3,
        warmup_steps=2,
        lr_decay_steps=4,
        results_folder=str(tmp_path / "mg-sched"),
        save_model_every=10**9,
        use_ema=False,
    )
    rng = np.random.default_rng(0)
    images = rng.uniform(size=(1, 2, 16, 16, 3)).astype(np.float32)
    te = rng.normal(size=(1, 2, 6, 32)).astype(np.float32)
    tm = np.ones((1, 2, 6), bool)
    logs = [trainer.train_step_arrays(images, te, tm) for _ in range(4)]
    assert all(np.isfinite(l["grad_norm"]) and l["grad_norm"] > 0 for l in logs)
    lrs = [l["lr"] for l in logs]
    assert lrs[0] == 0.0 and lrs[1] == pytest.approx(5e-4)  # warmup ramp
    assert lrs[2] == pytest.approx(1e-3)  # peak
    assert lrs[3] < lrs[2]  # cosine decay begins


def test_prune_counts_only_finalized_checkpoints(tmp_path):
    """An in-flight async save (still an Orbax tmp dir) must NOT displace a
    durable checkpoint: a crash mid-write would otherwise leave fewer than
    `keep` restorable states (zero, at keep=1)."""
    from muse_maskgit_pytorch_tpu.utils.checkpoint import (
        finalized_steps,
        prune_checkpoints,
    )

    ckpt = tmp_path / "ckpts"
    (ckpt / "step_00001000").mkdir(parents=True)
    # step 2000's write is in flight under its tmp name
    (ckpt / "step_00002000.orbax-checkpoint-tmp-777").mkdir()
    prune_checkpoints(ckpt, keep=1, current_step=2000)
    assert finalized_steps(ckpt) == [1000]  # durable state survives

    # once 2000 commits, the next prune retires 1000
    (ckpt / "step_00002000.orbax-checkpoint-tmp-777").rename(ckpt / "step_00002000")
    prune_checkpoints(ckpt, keep=1, current_step=3000)
    assert finalized_steps(ckpt) == [2000]


def test_maskgit_trainer_max_checkpoints(tmp_path):
    folder = str(tmp_path / "mg-keep")
    t = MaskGitTrainer(
        _tiny_maskgit(),
        num_train_steps=4,
        batch_size=2,
        results_folder=folder,
        save_model_every=10**9,
        use_ema=False,
        max_checkpoints=2,
    )
    rng = np.random.default_rng(0)
    images = rng.uniform(size=(1, 2, 16, 16, 3)).astype(np.float32)
    te = rng.normal(size=(1, 2, 6, 32)).astype(np.float32)
    tm = np.ones((1, 2, 6), bool)
    for _ in range(3):
        t.train_step_arrays(images, te, tm)
        t.save()

    from muse_maskgit_pytorch_tpu.utils.checkpoint import finalized_steps

    assert finalized_steps(t.results_folder / "checkpoints") == [2, 3]
    t.load()  # latest retained checkpoint restores fine
    assert t.steps == 3
