"""Fail-fast guards for driver entry points.

Round-3 postmortem: a sick axon TPU plugin *hung* (not failed) inside
the first backend touch, eating the driver's entire budget (rc=124)
instead of producing a diagnosable artifact. These helpers bound every
backend-touching phase: if it doesn't complete in time, the process
emits one structured JSON line on stdout and exits, so the driver
records a diagnosis in seconds instead of timing out.
"""

import contextlib
import json
import os
import sys
import threading
import time


@contextlib.contextmanager
def deadline(seconds, phase, on_timeout=None):
    """Hard-exit the process if the body doesn't finish within ``seconds``.

    A daemon thread fires after the timeout, prints a one-line JSON
    diagnosis (or calls ``on_timeout``) and ``os._exit``\\ s — the only
    reliable escape from a C-level hang in a PJRT plugin, which ignores
    KeyboardInterrupt and cannot be joined.
    """
    done = threading.Event()

    def _fire():
        if done.wait(seconds):
            return
        if on_timeout is not None:
            try:
                on_timeout()
            except Exception:
                pass
        else:
            print(
                json.dumps(
                    {
                        "error": f"{phase} did not complete within {seconds}s",
                        "phase": phase,
                        "timeout_s": seconds,
                    }
                ),
                flush=True,
            )
        os._exit(124)

    t = threading.Thread(target=_fire, daemon=True, name=f"deadline:{phase}")
    t.start()
    try:
        yield
    finally:
        done.set()


def require_backend(timeout_s=90):
    """Initialize the JAX backend with a deadline; raise on failure.

    Probes ``jax.devices()`` in a worker thread so a hung plugin cannot
    block the caller forever: on timeout the MAIN thread raises a clean
    RuntimeError (the worker is a daemon and is abandoned).
    Returns the device list on success.
    """
    import jax

    result = {}

    def _probe():
        try:
            result["devices"] = jax.devices()
        except Exception as exc:  # surfaced to the caller below
            result["error"] = exc

    t = threading.Thread(target=_probe, daemon=True, name="backend-probe")
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise RuntimeError(
            f"JAX backend init did not complete within {timeout_s}s "
            "(hung PJRT plugin?) — set JAX_PLATFORMS=cpu to bypass"
        )
    if "error" in result:
        raise RuntimeError(f"JAX backend init failed: {result['error']!r}")
    return result["devices"]


class Heartbeat:
    """Print a periodic one-line progress note so a long compile is
    distinguishable from a hang in the driver's log tail."""

    def __init__(self, phase, interval_s=30.0, stream=None):
        self.phase = phase
        self.interval_s = interval_s
        self.stream = stream or sys.stdout
        self._stop = threading.Event()
        self._t0 = time.monotonic()
        self._thread = None

    def __enter__(self):
        def _beat():
            while not self._stop.wait(self.interval_s):
                elapsed = time.monotonic() - self._t0
                print(
                    f"[heartbeat] {self.phase}: still running ({elapsed:.0f}s)",
                    file=self.stream,
                    flush=True,
                )

        self._thread = threading.Thread(
            target=_beat, daemon=True, name=f"heartbeat:{self.phase}"
        )
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=1.0)
        return False
