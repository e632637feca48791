"""Preemption-safe training: SIGTERM/SIGINT between steps checkpoints the
exact train state and exits cleanly, so `auto_resume=True` continues from
the interrupted step. The reference dies mid-step and loses even its step
counter across restarts (trainers.py:253-273 — `steps` is not in the
checkpoint dict)."""

import os
import signal
import threading

import numpy as np

from muse_maskgit_pytorch_tpu.training.preemption import PreemptionGuard
from muse_maskgit_pytorch_tpu.training.trainers import MaskGitTrainer
from muse_maskgit_pytorch_tpu.utils.checkpoint import latest_step

from tests.test_trainers import _tiny_maskgit


def test_guard_catches_signal_and_restores_handlers():
    prev = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert g.armed and not g.requested
        os.kill(os.getpid(), signal.SIGTERM)
        assert g.requested and g.signum == signal.SIGTERM
        # one graceful shot: the previous handler is ALREADY re-armed, so a
        # second signal behaves as if the guard were never installed
        assert signal.getsignal(signal.SIGTERM) is prev
    assert signal.getsignal(signal.SIGTERM) is prev


def test_guard_restores_on_clean_exit():
    prev = signal.getsignal(signal.SIGINT)
    with PreemptionGuard() as g:
        assert g.armed
    assert signal.getsignal(signal.SIGINT) is prev
    assert not g.requested


def test_guard_noop_off_main_thread():
    out = {}

    def run():
        with PreemptionGuard() as g:
            out["armed"] = g.armed

    t = threading.Thread(target=run)
    t.start()
    t.join()
    assert out["armed"] is False  # degrades to inert, not an exception


def test_trainer_checkpoints_on_preemption_and_resumes(tmp_path):
    folder = str(tmp_path / "mg-preempt")
    t1 = MaskGitTrainer(
        _tiny_maskgit(),
        num_train_steps=50,
        batch_size=2,
        results_folder=folder,
        save_model_every=10**9,  # never reaches a periodic save
        use_ema=False,
    )
    rng = np.random.default_rng(0)

    def data_gen():
        while True:
            yield rng.uniform(size=(2, 16, 16, 3)).astype(np.float32), ["a", "b"]

    def preempt_after_first_step(logs):
        os.kill(os.getpid(), signal.SIGTERM)

    t1.train(data_gen(), log_fn=preempt_after_first_step, prefetch=0)
    # exited cleanly after ~1 step, long before num_train_steps
    assert 1 <= t1.steps < 50
    # the preemption checkpoint exists at the interrupted step
    assert latest_step(os.path.join(folder, "checkpoints")) == t1.steps

    t2 = MaskGitTrainer(
        _tiny_maskgit(),
        num_train_steps=50,
        batch_size=2,
        results_folder=folder,
        save_model_every=10**9,
        use_ema=False,
        auto_resume=True,
    )
    assert t2.steps == t1.steps  # continues exactly where the signal landed
    w1 = np.asarray(
        __import__("jax").tree.leaves(t2.state["params"])[0]
    )
    assert np.isfinite(w1).all()
