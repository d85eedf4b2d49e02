"""Race-detection subsystem tests.

Two layers:

* The native prefetching loader (``native/hgnn_io.cc``) is the framework's
  one genuinely multithreaded native component -- the in-process
  replacement for the reference's 16-process torch DataLoader (reference
  ``Modules/EdgeClassifier/edge_classifier_base.py:41``, where process
  isolation makes data races structurally impossible).  Here worker
  threads share a reorder buffer, so races would corrupt batches
  silently.  ``native/hgnn_io_stress.cc`` stresses ordering, loop-mode
  epochs, mid-stream teardown and concurrent loaders; we run it plain
  (determinism/semantics) and under ThreadSanitizer (data races).

* The single-tenant device lock (``utils/device_lock.py``) detects the
  cross-process chip race the axon tunnel turns into phantom stalls.
"""

import json
import multiprocessing
import os
import subprocess
import sys

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")


def _make(target):
    return subprocess.run(["make", "-C", NATIVE_DIR, target],
                          capture_output=True, text=True, timeout=300)


class TestLoaderStress:
    def test_stress_harness_plain(self, tmp_path):
        """Determinism + semantics scenarios under -O2 (no sanitizer)."""
        r = _make("hgnn_io_stress")
        assert r.returncode == 0, r.stderr
        out = subprocess.run(
            [os.path.join(NATIVE_DIR, "hgnn_io_stress"), str(tmp_path)],
            capture_output=True, text=True, timeout=120)
        assert out.returncode == 0, out.stdout + out.stderr
        assert "all scenarios passed" in out.stdout

    def test_stress_harness_tsan(self, tmp_path):
        """The same scenarios under ThreadSanitizer: any data race in the
        worker pool / reorder buffer fails with exit code 66."""
        r = _make("hgnn_io_stress_tsan")
        if r.returncode != 0 and "fsanitize" in (r.stderr or ""):
            pytest.skip("toolchain lacks ThreadSanitizer")
        assert r.returncode == 0, r.stderr
        env = dict(os.environ, TSAN_OPTIONS="exitcode=66")
        out = subprocess.run(
            [os.path.join(NATIVE_DIR, "hgnn_io_stress_tsan"),
             str(tmp_path)],
            capture_output=True, text=True, timeout=300, env=env)
        assert out.returncode != 66, (
            "ThreadSanitizer detected a data race:\n" + out.stderr)
        assert out.returncode == 0, out.stdout + out.stderr

    def test_python_binding_order_deterministic(self, tmp_path):
        """Through the ctypes binding: emission order must not depend on
        worker count (an ordering race would be visible here first)."""
        from hierarchicalgnn_tpu.data import native_loader

        if not native_loader.available():
            pytest.skip("libhgnn_io.so not built")
        paths = []
        for i in range(10):
            p = str(tmp_path / f"ev{i}.hnn")
            native_loader.write_event(p, {
                "id": np.array([i], np.int32),
                "x": np.full((8,), float(i), np.float32)})
            paths.append(p)

        def order(n_threads, queue):
            ld = native_loader.NativeEventLoader(paths, queue_capacity=queue,
                                                 n_threads=n_threads,
                                                 shuffle_seed=5)
            ids = [int(ev["id"][0]) for ev in ld]
            ld.close()
            return ids

        ref = order(1, 2)
        assert sorted(ref) == list(range(10))
        for nt, q in [(2, 1), (8, 3), (8, 16)]:
            assert order(nt, q) == ref


def _grab_lock(path, q):
    from hierarchicalgnn_tpu.utils import device_lock

    ok = device_lock.acquire(path=path, wait_s=0.0, on_timeout="proceed")
    q.put(ok)


class TestDeviceLock:
    def test_exclusive_and_named_holder(self, tmp_path):
        from hierarchicalgnn_tpu.utils import device_lock

        path = str(tmp_path / "dev.lock")
        assert device_lock.acquire(path=path, wait_s=0.0)
        info = device_lock.holder_info(path)
        assert info["pid"] == os.getpid()

        # A second PROCESS (flock is per-open-file, not per-process) must
        # see the lock as held and report who holds it.
        ctx = multiprocessing.get_context("spawn")
        q = ctx.Queue()
        p = ctx.Process(target=_grab_lock, args=(path, q))
        p.start()
        assert q.get(timeout=60) is False
        p.join(timeout=60)

    def test_raise_names_holder(self, tmp_path):
        from hierarchicalgnn_tpu.utils import device_lock

        path = str(tmp_path / "dev.lock")
        # Hold from a child process, then expect a named failure here.
        script = (
            "import sys, time; sys.path.insert(0, %r); "
            "from hierarchicalgnn_tpu.utils import device_lock; "
            "device_lock.acquire(path=%r, wait_s=0.0); "
            "print('held', flush=True); time.sleep(30)"
            % (os.path.dirname(NATIVE_DIR), path))
        child = subprocess.Popen([sys.executable, "-c", script],
                                 stdout=subprocess.PIPE, text=True)
        try:
            assert child.stdout.readline().strip() == "held"
            with pytest.raises(RuntimeError, match="held after"):
                device_lock.acquire(path=path, wait_s=0.0)
            info = device_lock.holder_info(path)
            assert info["pid"] == child.pid
        finally:
            child.kill()
            child.wait()

    def test_released_on_process_exit(self, tmp_path):
        """flock releases at process death -- no stale-lock failure mode."""
        from hierarchicalgnn_tpu.utils import device_lock

        path = str(tmp_path / "dev.lock")
        script = (
            "import sys; sys.path.insert(0, %r); "
            "from hierarchicalgnn_tpu.utils import device_lock; "
            "device_lock.acquire(path=%r, wait_s=0.0)"
            % (os.path.dirname(NATIVE_DIR), path))
        subprocess.run([sys.executable, "-c", script], check=True, timeout=120)
        assert device_lock.acquire(path=path, wait_s=0.0)
