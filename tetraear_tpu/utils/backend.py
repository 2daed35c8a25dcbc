"""Backend platform resolution for user-facing entry points.

This container pre-registers a remote-TPU backend whose tunnel is
intermittently degraded (ops fail with bare UNIMPLEMENTED or hang on
device-to-host transfers — see CLAUDE.md).  A library call can let such
an error propagate, but the CLI must not hand the user an empty JSONL
because the accelerator runtime happens to be wedged: `resolve_platform`
("auto") proves the default backend can *execute and return a value*
(scalar-digest D2H in a watchdogged child process — `block_until_ready`
is not a sync on this backend) and falls back to CPU otherwise.

The probe verdict is cached on disk for a few minutes so repeat CLI
invocations don't pay the probe; `--platform cpu|tpu` skips it entirely.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from typing import Optional

import numpy as np

PROBE_TTL_S = 300.0
# Worst-case time-to-first-output on a dead tunnel must stay in single
# digits: the probe program is tiny (a healthy window answers in ~5 s
# incl. the child's jax import), so 10 s separates healthy from wedged.
# A slow-but-healthy window misclassified as dead costs one cached-TTL
# period on CPU — the right trade for an interactive CLI.
PROBE_TIMEOUT_S = 10.0

# Degradation on this backend is program-dependent (tiny programs have
# succeeded in windows where realistic ones fail), so the probe runs at a
# representative size and mixes the op classes the receive pipeline uses.
_PROBE_CODE = r"""
import numpy as np, jax, jax.numpy as jnp
backend = jax.default_backend()
x = jnp.arange(260_000, dtype=jnp.float32)
y = jnp.cos(x * 1e-4) + x * 2.0
digest = float(np.asarray(jnp.sum(y).astype(jnp.float32)))
print("PROBE", backend, digest)
"""
_PROBE_EXPECT = float(np.sum(np.cos(np.arange(260_000, dtype=np.float32)
                                    * 1e-4) + np.arange(260_000,
                                                        dtype=np.float32)
                             * 2.0, dtype=np.float64))


def _cache_path() -> str:
    return os.path.join(tempfile.gettempdir(),
                        f"tetraear_tpu_backend_probe_{os.getuid()}.json")


def _probe_default_backend(timeout: float) -> dict:
    """Run the digest probe in a child process; classify the backend."""
    try:
        proc = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                              capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"ok": False, "backend": "unknown", "reason": "hang"}
    for line in proc.stdout.splitlines():
        if line.startswith("PROBE "):
            _, backend, digest = line.split()
            ok = abs(float(digest) - _PROBE_EXPECT) < abs(_PROBE_EXPECT) * 1e-4
            return {"ok": ok, "backend": backend,
                    "reason": "ok" if ok else "bad-digest"}
    err = (proc.stderr.strip().splitlines() or ["?"])[-1]
    return {"ok": False, "backend": "unknown", "reason": err[-120:]}


# Below this many input samples, a one-shot CLI run can never win on the
# remote accelerator: its first compile alone is minutes over the tunnel
# while the CPU finishes the whole job in seconds.  `--platform tpu`
# overrides (power users / long captures / resident services).
AUTO_MIN_ACCEL_SAMPLES = 20_000_000


def resolve_platform(prefer: str = "auto",
                     probe_timeout: float = PROBE_TIMEOUT_S,
                     workload_samples: Optional[int] = None) -> str:
    """Decide which platform this process should use.

    Returns "cpu", or "default" (keep whatever JAX would pick).  Must be
    consulted before the first in-process JAX backend use.
    ``workload_samples`` lets one-shot commands report their input size;
    small jobs resolve to CPU without probing (compile-amortization
    argument above).
    """
    if prefer == "cpu":
        return "cpu"
    if prefer in ("tpu", "default"):
        return "default"
    if (workload_samples is not None
            and workload_samples < AUTO_MIN_ACCEL_SAMPLES):
        return "cpu"

    # auto: trust a recent cached verdict, else probe in a child process
    path = _cache_path()
    try:
        st = os.stat(path)
        if time.time() - st.st_mtime < PROBE_TTL_S:
            with open(path) as f:
                cached = json.load(f)
            return "default" if cached.get("ok") else "cpu"
    except (OSError, ValueError):
        pass

    verdict = _probe_default_backend(probe_timeout)
    try:
        with open(path, "w") as f:
            json.dump(verdict, f)
    except OSError:
        pass
    if verdict["backend"] == "cpu":
        return "default"          # nothing to fall back from
    return "default" if verdict["ok"] else "cpu"


def apply_platform(platform: str) -> None:
    """Force the JAX platform if requested (before first backend use)."""
    if platform == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")


_COMPLEX_JOIN = None
_COMPLEX_SPLIT = None


def put_complex(x):
    """Host->device transfer that never ships a complex dtype.

    This container's remote-TPU transfer layer raises UNIMPLEMENTED on
    complex64 device_put (bisected in round 2: f32 H2D and on-device
    complex compute both work; only the complex *transfer* is missing —
    and one failed transfer poisons every subsequent op in the process).
    Ship real/imag as one stacked f32 array and rebuild complex64 on
    device; the result feeds existing complex jits with no further
    transfers.  Non-complex inputs pass straight through device_put.
    """
    import jax
    import jax.numpy as jnp

    if isinstance(x, jax.core.Tracer):
        return x                      # under trace — no transfer exists
    if isinstance(x, jax.Array):
        return x                      # already on device — no transfer
    x = np.asarray(x)
    if not np.iscomplexobj(x) or jax.default_backend() == "cpu":
        return jax.device_put(jnp.asarray(x, jnp.complex64)
                              if np.iscomplexobj(x) else x)
    ri = np.ascontiguousarray(
        np.stack([x.real, x.imag]).astype(np.float32))
    global _COMPLEX_JOIN
    if _COMPLEX_JOIN is None:
        _COMPLEX_JOIN = jax.jit(lambda a: jax.lax.complex(a[0], a[1]))
    return _COMPLEX_JOIN(jax.device_put(ri))


def ensure_complex_on_device(x):
    """Model-boundary input guard: device arrays (and tracers) pass
    through with a complex64 cast; host arrays ship via put_complex.
    Replaces the hand-rolled isinstance dance at every frontend."""
    import jax
    import jax.numpy as jnp

    if isinstance(x, (jax.core.Tracer, jax.Array)):
        return jnp.asarray(x, jnp.complex64)
    return put_complex(np.asarray(x, np.complex64))


def get_complex(arr) -> np.ndarray:
    """Device->host pull of a complex array without a complex D2H.

    Splits to a stacked f32 array on device (complex D2H is UNIMPLEMENTED
    on the remote backend), pulls f32, recombines host-side.
    """
    import jax
    import jax.numpy as jnp

    if not jnp.issubdtype(jnp.asarray(arr).dtype, jnp.complexfloating):
        return np.asarray(arr)
    global _COMPLEX_SPLIT
    if _COMPLEX_SPLIT is None:
        _COMPLEX_SPLIT = jax.jit(
            lambda a: jnp.stack([jnp.real(a), jnp.imag(a)]))
    ri = np.asarray(_COMPLEX_SPLIT(arr))
    return (ri[0] + 1j * ri[1]).astype(np.complex64)


def pull_with_watchdog(fn, timeout_s: float = 120.0,
                       what: str = "device read"):
    """Run a device-to-host-pulling callable under a watchdog thread.

    The degraded remote-TPU tunnel's dominant failure mode is a HANG on
    D2H (not an exception) — this converts it into a RuntimeError that
    run_with_cpu_fallback recognizes, so user-facing commands freeze for
    at most `timeout_s` instead of forever.
    """
    import threading
    result: dict = {}

    def work():
        try:
            result["v"] = fn()
        except BaseException as e:      # noqa: BLE001 — re-raised below
            result["e"] = e

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(timeout_s)
    if "v" in result:
        return result["v"]
    if "e" in result:
        raise result["e"]
    raise RuntimeError(f"UNAVAILABLE: {what} timed out after "
                       f"{timeout_s:.0f}s (accelerator hang)")


def is_backend_error(exc: BaseException) -> bool:
    """True for accelerator-runtime failures worth a CPU retry."""
    name = type(exc).__name__
    if name not in ("JaxRuntimeError", "XlaRuntimeError", "RuntimeError"):
        return False
    msg = str(exc)
    return any(tok in msg for tok in
               ("TPU backend error", "UNIMPLEMENTED", "DEADLINE_EXCEEDED",
                "UNAVAILABLE", "INTERNAL"))


def run_with_cpu_fallback(fn, *args, **kwargs):
    """Call fn; on an accelerator-runtime error, pin execution to the CPU
    devices (valid mid-process, unlike jax_platforms) and retry once.

    The pre-probe in resolve_platform cannot predict program-dependent
    degradation (a small probe program has executed in windows where the
    real pipeline failed), so the user-facing commands also need this
    in-flight net.
    """
    try:
        return fn(*args, **kwargs)
    except Exception as exc:          # noqa: BLE001 — filtered below
        if not is_backend_error(exc):
            raise
        import jax
        print("note: accelerator backend failed mid-run "
              f"({str(exc).splitlines()[0][:90]}) -> retrying on CPU",
              file=sys.stderr)
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
        jax.clear_caches()
        return fn(*args, **kwargs)


def device_measure_lock(timeout_s: float = 3600.0,
                        path: str = "/tmp/tetraear_tpu_device.lock"):
    """Cross-process exclusive lock for device MEASUREMENT jobs.

    The remote TPU is a single tunneled chip: two concurrent measurement
    processes (bench.py, tools/tpu_conv_probe.py, the bench_watch loop)
    contend on it and each sees the other's latency as an "accelerator
    hang" — observed live: probe children timing out exactly while a
    watcher bench was running.  Every measurement *parent* takes this
    lock; children spawned by a holder must not re-acquire it (they
    inherit the serialization) — holders export TETRAEAR_DEVLOCK_HELD=1
    and the lock no-ops under it, so a child invoked directly (e.g. a
    hand-run ``--probe``/``--tier``) still serializes itself.
    Usage: ``with device_measure_lock(): ...``."""
    import contextlib
    import fcntl

    @contextlib.contextmanager
    def _lock():
        if os.environ.get("TETRAEAR_DEVLOCK_HELD") == "1":
            yield
            return
        f = open(path, "a+")
        t0 = time.time()
        while True:
            try:
                fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except OSError:
                if time.time() - t0 > timeout_s:
                    f.close()
                    raise TimeoutError(
                        f"device lock {path} held > {timeout_s:.0f}s")
                time.sleep(5.0)
        os.environ["TETRAEAR_DEVLOCK_HELD"] = "1"
        try:
            yield
        finally:
            os.environ.pop("TETRAEAR_DEVLOCK_HELD", None)
            fcntl.flock(f, fcntl.LOCK_UN)
            f.close()
    return _lock()
