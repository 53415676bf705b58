"""Graceful-preemption handling for the trainers.

The reference has no failure handling: a dead rank kills the whole job
(its process spawners just wait on subprocesses, reference
src/common/multiproc.py:54-55, src/waveglow/distributed.py:161-170), and
an evicted machine loses everything since the last checkpoint.  Cloud
TPU/GPU schedulers deliver an eviction notice (SIGTERM) shortly before
reclaiming a machine; a production trainer should respond by finishing
the current iteration, writing a final checkpoint, and exiting cleanly so
`checkpoint_path='auto'` resumes with zero lost work.

`PreemptionGuard` installs a SIGTERM handler that records the request;
the epoch loops poll `should_stop()` once per iteration.  In multi-host
runs every process polls in lockstep and the decision is the OR of
every process's flag (one tiny allgather), so a notice delivered to ANY
rank — whole-job eviction signals all of them, a single-VM eviction
signals just one — stops every process after the SAME iteration instead
of hanging the others' collectives.
"""

from __future__ import annotations

import signal
import threading


class PreemptionGuard:
    """Installs a SIGTERM handler; trainers poll `should_stop()` per
    iteration and checkpoint + return cleanly when it fires.

    Falls back to an inert guard (signals untouched, `request()` still
    works for tests/embedding) when not running on the main thread,
    where CPython forbids installing handlers.
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self._flag = threading.Event()
        self._installed = {}
        try:
            for s in signals:
                self._installed[s] = signal.signal(s, self._on_signal)
        except ValueError:
            # not the main thread (or an unsupported signal): restore
            # whatever DID install so the guard leaves no handler behind,
            # then stay inert
            self.uninstall()

    def _on_signal(self, signum, frame):
        del frame
        print(
            f"Preemption notice (signal {signum}): finishing the current "
            "iteration, then saving a final checkpoint and exiting cleanly",
            flush=True,
        )
        self._flag.set()

    def request(self):
        """Programmatic preemption (tests, embedding frameworks)."""
        self._flag.set()

    @property
    def requested(self) -> bool:
        return self._flag.is_set()

    def should_stop(self) -> bool:
        """Per-iteration poll.  Single process: the local flag.
        Multi-host: the OR of every process's flag (allgather), so an
        eviction notice that reaches ANY rank — including a single-VM
        eviction that signals only that machine — stops every process at
        the same iteration (this is a collective: every process must
        call it the same number of times, which the per-iteration poll
        guarantees)."""
        import jax

        if jax.process_count() == 1:
            return self.requested
        import numpy as np
        from jax.experimental import multihost_utils

        flag = np.asarray(1 if self.requested else 0, np.int32)
        return bool(np.max(multihost_utils.process_allgather(flag)))

    def uninstall(self):
        """Restore the previous signal handlers (so embedding callers —
        e.g. a test suite — are unaffected after training returns)."""
        for s, prev in self._installed.items():
            try:
                signal.signal(s, prev)
            except (ValueError, TypeError):
                pass
        self._installed = {}

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.uninstall()
        return False
