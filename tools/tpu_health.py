#!/usr/bin/env python3
"""Backend health probe: classify what the current accelerator runtime can
actually execute, with hang watchdogs (this container's remote-TPU tunnel
intermittently wedges, fails with bare UNIMPLEMENTED, or hangs on D2H —
see CLAUDE.md).  Each probe runs in a child process so a hang cannot take
the parent down; results are printed as one line per op class.

Usage:
    python tools/tpu_health.py [--budget SECONDS]   # default 75s/probe

Interpretation guide (observed states of this backend):
  - all OK                  -> healthy window: run bench.py now
  - f32 OK, complex FAIL    -> use the real-pair bench tiers (automatic)
  - everything HANG/FAIL    -> tunnel wedged; bench will fall back to CPU
"""

from __future__ import annotations

import argparse
import subprocess
import sys

PROBES = [
    ("f32_add", "x + 1.0"),
    ("f32_matmul", "(x[:1024].reshape(32,32) @ x[:1024].reshape(32,32)).ravel()"),
    ("f32_cos", "jnp.cos(x)"),
    ("f32_atan2", "jnp.arctan2(x, x + 1.0)"),
    ("c64_mul", "xc * xc"),
    ("c64_fft", "jnp.fft.fft(xc)"),
    ("gather", "x[idx]"),
    ("top_k", "jax.lax.top_k(x, 8)[0]"),
]

CHILD = r"""
import numpy as np, jax, jax.numpy as jnp
rng = np.random.default_rng(0)
n = 260_000
x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
xc = jnp.asarray((rng.standard_normal(n) + 1j*rng.standard_normal(n)
                  ).astype(np.complex64))
idx = jnp.asarray(rng.integers(0, n, n // 4))
out = {expr}
# scalar-digest D2H: the only reliable execution sync on this backend
print("DIGEST", float(np.asarray(jnp.sum(jnp.abs(out)).astype(jnp.float32))))
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=float, default=75.0)
    args = ap.parse_args()

    healthy = True
    for i, (name, expr) in enumerate(PROBES):
        code = CHILD.replace("{expr}", expr)
        try:
            proc = subprocess.run([sys.executable, "-c", code],
                                  capture_output=True, text=True,
                                  timeout=args.budget)
            if proc.returncode == 0 and "DIGEST" in proc.stdout:
                v = proc.stdout.strip().split()[-1]
                print(f"OK    {name:12s} digest={v}", flush=True)
                continue
            err = (proc.stderr.strip().splitlines() or ["?"])[-1]
            print(f"FAIL  {name:12s} {err[:90]}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"HANG  {name:12s} (> {args.budget:.0f}s)", flush=True)
            if i == 0:
                # the trivial probe hung: the tunnel is wedged, every
                # other probe would also burn a full budget — stop here
                # so a wedged backend costs one budget, not eight
                print("verdict: wedged — f32_add hang; skipping remaining "
                      "probes (bench.py will fall back to CPU)")
                return 2
        healthy = False

    print("verdict:", "healthy — run bench.py" if healthy
          else "degraded — bench.py will tier down / fall back to CPU")
    return 0 if healthy else 1


if __name__ == "__main__":
    sys.exit(main())
