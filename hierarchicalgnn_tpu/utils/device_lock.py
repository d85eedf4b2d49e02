"""Single-tenant accelerator lock: detect (and serialize) device races
between processes.

The TPU chip behind the axon tunnel is single-tenant -- two processes
touching it concurrently race each other's programs, and the loser's
symptoms (stalled readbacks, spurious INTERNAL errors) look exactly like
service flakiness, which makes this the nastiest "race" in the system to
diagnose after the fact.  The reference never needs this: CUDA
time-slices multiple processes per GPU (its analogue is the torch
DataLoader's process pool, whose in-process replacement is covered by
the TSAN harness in ``native/hgnn_io_stress.cc``).

``acquire()`` takes an exclusive ``flock`` on a well-known path before a
process opens the device.  ``flock`` is released by the kernel at process
exit, so a crashed holder can never leave a stale lock.  The lock file
records the holder's pid/argv so a blocked process can *name* the race
it detected instead of hanging mysteriously.

Wired into the TPU entry points: ``bench.py`` (warn-and-proceed after a
bounded wait -- the round's metric must not be lost to a forgotten
background run) and ``run.py`` (block -- queuing training runs is the
desired semantics).  Tests force CPU and never take the lock.
"""

from __future__ import annotations

import fcntl
import json
import os
import sys
import time

def _default_path() -> str:
    """Per-uid lock path (advisor r4): a fixed world-writable /tmp name
    lets another user squat the lock (DoS) or plant a symlink; prefer the
    user-private runtime dir when present."""
    base = os.environ.get("XDG_RUNTIME_DIR")
    if base and os.path.isdir(base):
        return os.path.join(base, "hgnn_device.lock")
    return f"/tmp/hgnn_device.{os.getuid()}.lock"


DEFAULT_PATH = _default_path()

# Module-level keepalive: the fd must stay open for the flock's lifetime.
_held: list = []


def holder_info(path: str = DEFAULT_PATH) -> dict | None:
    """Best-effort description of the current lock holder (None if free)."""
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def acquire(path: str = DEFAULT_PATH, wait_s: float = 600.0,
            on_timeout: str = "raise", status=None) -> bool:
    """Take the exclusive device lock, waiting up to ``wait_s``.

    Returns True when the lock is held.  On timeout: ``on_timeout="raise"``
    raises RuntimeError naming the holder; ``"proceed"`` returns False
    (caller continues at its own risk -- used by bench.py so a wedged
    holder degrades the measurement instead of erasing it).
    """
    # O_NOFOLLOW: refuse a planted symlink instead of truncating its
    # target; 0o600: the lock (and holder info) is per-user state.
    fd = os.open(path, os.O_RDWR | os.O_CREAT | os.O_NOFOLLOW, 0o600)
    deadline = time.monotonic() + wait_s
    warned = False
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except OSError:
            if not warned:
                warned = True
                who = holder_info(path)
                if status:
                    status(f"device lock held by {who}; waiting up to "
                           f"{wait_s:.0f}s")
            if time.monotonic() >= deadline:
                who = holder_info(path)
                msg = (f"single-tenant device lock {path} still held after "
                       f"{wait_s:.0f}s by {who} -- two processes must not "
                       f"share the chip")
                if on_timeout == "proceed":
                    if status:
                        status("WARNING: " + msg + "; proceeding anyway")
                    os.close(fd)
                    return False
                os.close(fd)
                raise RuntimeError(msg)
            time.sleep(1.0)
    os.ftruncate(fd, 0)
    os.write(fd, json.dumps({
        "pid": os.getpid(),
        "argv": sys.argv[:6],
        "acquired_unix": int(time.time()),
    }).encode())
    os.fsync(fd)
    _held.append(fd)  # released by the kernel at process exit
    if status:
        status("device lock acquired")
    return True
