#!/usr/bin/env python3
"""Benchmark: IQ samples/s/chip through the multi-carrier demod+decode
device pipeline (BASELINE config 4: 16 TETRA carriers channelized from one
wideband stream, demodulated, sync-correlated, CRC-checked on device).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's pure-Python chain sustains at best ~2.4 MS/s
(BASELINE.md "Realized throughput"), so vs_baseline = samples_per_sec/2.4e6.

Measurement integrity: on this container's remote-TPU backend,
``jax.block_until_ready`` does NOT reliably wait for remote execution
(dispatch-only timing can overstate throughput by orders of magnitude) and
device-to-host reads can hang when the tunnel is degraded.  Every timed run
here is therefore **sync-verified**: the loop ends by pulling a scalar
digest of the final output, forcing real execution, under a watchdog.  If
the accelerator cannot complete a verified run, the benchmark re-executes
itself on the CPU backend and reports that (honest, smaller) number.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

BASELINE_SPS = 2.4e6
WATCHDOG_S = 240.0


def _verified_rate(step_fn, digest_fn, inputs, n: int, iters: int) -> float:
    """Time `iters` pipeline steps ending with a scalar-digest D2H (the only
    reliable sync on this backend) under a watchdog; returns samples/s."""
    import time as _time

    def run(iters_inner):
        t0 = _time.perf_counter()
        out = None
        for i in range(iters_inner):
            out = step_fn(inputs[i % len(inputs)])
        result = {}

        def pull():
            try:
                result["v"] = float(digest_fn(out))
            except Exception as e:  # pragma: no cover
                result["err"] = e

        th = threading.Thread(target=pull, daemon=True)
        th.start()
        th.join(WATCHDOG_S)
        if "v" in result:
            return _time.perf_counter() - t0
        if "err" in result:
            # completed quickly with a backend error (e.g. UNIMPLEMENTED):
            # NOT a hang — callers may try a different program tier
            raise RuntimeError(f"verified sync failed: {result['err']}")
        raise TimeoutError("verified sync timed out")

    _ = run(1)                        # warmup/compile + first sync
    t_base = run(1)                   # dispatch+sync floor
    t_full = run(iters + 1)
    return n * iters / max(t_full - t_base, 1e-9)


def _measure(num_carriers: int = 16, scale: int = 2, iters: int = 8):
    """Returns (samples_per_sec, backend, variant, carriers) or raises.

    Tries the full complex pipeline (demod+sync+candidates+CRC) first; on
    accelerators whose runtime cannot execute complex arithmetic (see
    CLAUDE.md), falls back to the bit-identical transcendental-free
    real-pair pipeline (demod+sync; models/realpair.py) before giving up.
    On healthy backends the 96-channel polyphase-filterbank pipeline is
    also measured (same wideband samples, 6x the channel coverage, one
    shared FIR + DFT matmul) and the faster verified number wins.
    """
    import jax
    import jax.numpy as jnp

    from tetraear_tpu.config import ReceiverConfig
    from tetraear_tpu.models.multicarrier import (MulticarrierFrontend,
                                                  PfbMulticarrierFrontend)
    from tetraear_tpu.models.realpair import RealPairFrontend, mixer_table

    backend = jax.default_backend()
    cfg = ReceiverConfig()
    step = cfg.decimation_factor * cfg.ref_samples_per_symbol
    n = 8000 * step * scale
    n = (n // 96) * 96                # mixer-table tiling contract

    rng = np.random.default_rng(0)
    # grid-aligned carrier set (multiples of 25 kHz) so the periodic-table
    # mixer of the real-pair variant applies
    offsets = ((np.arange(num_carriers) - num_carriers // 2) * 25e3
               ).astype(np.float32)
    xs_np = [(rng.standard_normal(n) + 1j * rng.standard_normal(n)
              ).astype(np.complex64) * 0.1 for _ in range(2)]

    digest = jax.jit(lambda out: (out.sync_corr.sum()
                                  + out.count.sum().astype(jnp.float32)))

    def run_complex():
        mc = MulticarrierFrontend(cfg, num_candidates=64, threshold=0.80)
        xs = [jax.device_put(jnp.asarray(x)) for x in xs_np]
        od = jax.device_put(jnp.asarray(offsets))
        return _verified_rate(lambda x: mc(x, od, start_index=0), digest,
                              xs, n, iters)

    def run_realpair(k: int = 0):
        # k>0 appends the on-device candidates+CRC stage: the FULL decode
        # compute (same as run_complex) in the complex/transcendental-free
        # op vocabulary.  k=0 is the demod+sync-only reduced program.
        rp = RealPairFrontend(cfg, num_candidates=k, threshold=0.80)
        table = jax.device_put(jnp.asarray(
            mixer_table(offsets, cfg.sample_rate_hz)))
        fn = rp._compiled(n, num_carriers)
        xs_ri = [jax.device_put(jnp.asarray(
            np.stack([x.real, x.imag]).astype(np.float32)))
            for x in xs_np]
        return _verified_rate(lambda x: fn(x, table), digest, xs_ri, n,
                              iters)

    def run_pfb(k: int = 64):
        # 96-channel critically-stacked polyphase filterbank: every 25 kHz
        # channel in the 2.4 MHz capture decoded at once.  Counts the same
        # wideband samples/s as the DDC tiers while covering 6x the
        # carriers — and its compute is one shared polyphase FIR plus a
        # DFT matmul, the MXU-shaped formulation.
        pfb = PfbMulticarrierFrontend(cfg, num_candidates=k, threshold=0.80)
        xs = [jax.device_put(jnp.asarray(x)) for x in xs_np]
        return _verified_rate(pfb, digest, xs, n, iters)

    def run_single():
        # Single-carrier Frontend on CLI-sized blocks: the same program
        # class as the offline decode path, which has been observed to
        # execute on this backend in windows where the larger 16-carrier
        # programs fail.  Directly comparable to the baseline (the
        # reference is also single-channel at 2.4 MS/s).
        from tetraear_tpu.models.receiver import Frontend
        fe = Frontend(cfg)
        n_s = 2048 * step              # ~266k samples, CLI chunk scale
        fn = fe._compiled(n_s, False)
        xs_s = [jax.device_put(jnp.asarray(x[:n_s])) for x in xs_np]
        zero = jnp.float32(0.0)
        return _verified_rate(lambda x: fn(x, zero), digest, xs_s, n_s,
                              iters * 4)

    if backend == "cpu":
        # all full-decode variants, report the fastest that works (one
        # variant's regression must not zero out the whole fallback bench)
        results = []
        for fn, variant, carriers in (
                (run_complex, "demod_decode", num_carriers),
                (lambda: run_realpair(k=64), "demod_decode_realpair",
                 num_carriers),
                (lambda: run_pfb(k=64), "pfb_demod_decode", 96)):
            try:
                results.append((fn(), variant, carriers))
            except Exception as e:
                print(f"[bench] cpu variant {variant} failed: "
                      f"{str(e)[:80]}", file=sys.stderr)
        if not results:
            raise RuntimeError("no CPU variant completed")
        rate, variant, carriers = max(results)
        return rate, backend, variant, carriers

    # A TimeoutError means the tunnel is hanging (not an op gap): later
    # tiers would hang too, so propagate straight to the CPU fallback.
    try:
        r_ddc = run_complex()
        try:
            r_pfb = run_pfb(k=64)
        except Exception:
            r_pfb = 0.0          # ddc already proved the backend works
        if r_pfb > r_ddc:
            return r_pfb, backend, "pfb_demod_decode", 96
        return r_ddc, backend, "demod_decode", num_carriers
    except TimeoutError:
        raise
    except Exception as e:
        print(f"[bench] complex pipeline failed on {backend} "
              f"({str(e)[:80]}); trying real-pair variant", file=sys.stderr)
    try:
        return (run_realpair(k=64), backend, "demod_decode_realpair",
                num_carriers)
    except TimeoutError:
        raise
    except Exception as e:
        print(f"[bench] real-pair decode pipeline failed on {backend} "
              f"({str(e)[:80]}); trying demod+sync-only variant",
              file=sys.stderr)
    try:
        return (run_realpair(k=0), backend, "demod_sync_realpair",
                num_carriers)
    except TimeoutError:
        raise
    except Exception as e:
        print(f"[bench] real-pair pipeline failed on {backend} "
              f"({str(e)[:80]}); trying single-carrier frontend",
              file=sys.stderr)
    return run_single(), backend, "singlecarrier_demod_sync", 1


def main() -> int:
    force_cpu = "--cpu" in sys.argv
    if force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    # size knobs (used by tests/unit/test_bench.py to exercise the full
    # CLI contract cheaply; defaults are the real benchmark)
    kw = dict(
        num_carriers=int(os.environ.get("BENCH_CARRIERS", 16)),
        scale=int(os.environ.get("BENCH_SCALE", 2)),
        iters=int(os.environ.get("BENCH_ITERS", 8)),
    )
    try:
        sps, backend, variant, carriers = _measure(**kw)
    except Exception as e:
        if force_cpu:
            print(json.dumps({"metric": "bench_failed", "value": 0,
                              "unit": "samples/s", "vs_baseline": 0}))
            return 1
        # accelerator unusable -> honest CPU fallback in a fresh process
        print(f"[bench] accelerator run failed ({type(e).__name__}: "
              f"{str(e)[:120]}); falling back to CPU backend",
              file=sys.stderr)
        proc = subprocess.run([sys.executable, os.path.abspath(__file__),
                               "--cpu"], capture_output=True, text=True,
                              timeout=1800)
        sys.stdout.write(proc.stdout.splitlines()[-1] + "\n"
                         if proc.stdout.strip() else "{}\n")
        # ensure no wedged device threads keep us alive
        sys.stdout.flush()
        os._exit(proc.returncode)

    scope = ("" if variant.startswith("singlecarrier")
             else f"{carriers}carrier_")
    if backend != "cpu":
        metric = f"iq_samples_per_sec_per_chip_{scope}{variant}"
    else:
        metric = f"iq_samples_per_sec_{scope}{variant}_cpu_fallback"
    print(json.dumps({
        "metric": metric,
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / BASELINE_SPS, 2),
    }))
    sys.stdout.flush()
    os._exit(0)                       # daemon watchdog threads may linger


if __name__ == "__main__":
    sys.exit(main())
