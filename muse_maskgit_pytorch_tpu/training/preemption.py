"""Cooperative preemption handling for long training runs.

TPU pools are preemptible: the scheduler delivers SIGTERM and gives the
process a grace window before SIGKILL. `PreemptionGuard` converts the first
SIGTERM/SIGINT into a flag the training loop checks between steps, so the
trainer checkpoints its exact state (step counter, PRNG key, optimizer and
EMA state — the Orbax composite) and exits cleanly; a restart with
`auto_resume=True` continues from the interrupted step, and the
shards-path data stream fast-forwards to the exact batch
(`MaskGitTrainer.train_from_shards`).

The reference has nothing here: its trainer loses even the step counter
across restarts (/root/reference/muse_maskgit_pytorch/trainers.py:253-273 —
`steps` is not in the checkpoint dict) and dies mid-step on SIGTERM.

A SECOND signal restores the previous handler's behavior (default: die),
so a stuck checkpoint write can always be interrupted by hand.
"""

from __future__ import annotations

import signal
import threading
from typing import Optional, Tuple


class PreemptionGuard:
    """Context manager: arm SIGTERM/SIGINT -> `requested` flag.

    Usage (what the trainers do):

        with PreemptionGuard() as guard:
            while step < total and not guard.requested:
                train_step()
            if guard.requested:
                save_checkpoint()

    Signal handlers can only be installed from the main thread; from any
    other thread the guard degrades to an inert no-op (`armed` False) so
    library code can use it unconditionally.
    """

    def __init__(self, signals: Tuple[int, ...] = (signal.SIGTERM, signal.SIGINT)):
        self._signals = signals
        self._event = threading.Event()
        self._prev: dict = {}
        self.armed = False
        self.signum: Optional[int] = None

    @property
    def requested(self) -> bool:
        return self._event.is_set()

    def _handle(self, signum, frame):
        self.signum = signum
        self._event.set()
        # one graceful shot: re-arm the PREVIOUS handlers so a second
        # signal behaves as if the guard were never installed
        self._restore()

    def __enter__(self) -> "PreemptionGuard":
        try:
            for s in self._signals:
                self._prev[s] = signal.signal(s, self._handle)
            self.armed = True
        except ValueError:  # not the main thread
            self._restore()
        return self

    def __exit__(self, *exc) -> None:
        self._restore()

    def _restore(self) -> None:
        for s, h in list(self._prev.items()):
            try:
                signal.signal(s, h)
            except ValueError:
                pass
            del self._prev[s]
        self.armed = False
