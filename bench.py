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
digest of the final output, forcing real execution, under a watchdog.

Backend quirks this bench is built around (bisected in round 2, see
tools/tpu_bisect.py):
  * complex64 device_put raises UNIMPLEMENTED — all complex inputs are
    shipped as stacked f32 and rebuilt on device (utils/backend.put_complex)
  * ONE failed op poisons every subsequent op in the process — each
    accelerator tier therefore runs in a fresh child process
If no accelerator tier completes a verified run, the benchmark re-executes
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
TIER_TIMEOUT_S = 900.0           # child budget incl. remote compile (~3 min);
# bounded so a hung tier cannot eat the whole bench window

# accelerator tiers, best first; each runs in its own process.  Order
# evidence: BENCH_r02.json ran both s2d variants in one driver window —
# fused_s2d_of 159.2 MS/s vs fused_s2d 152.3 MS/s (full pipeline, same
# run).  (The tpu_conv_probe of4/of8 numbers predating that run were
# mislabeled — probe-selection bug, fixed — and are not evidence.)
TIERS = ("fused_s2d_of", "fused_s2d", "fused", "complex", "pfb",
         "realpair64", "realpair0", "single")

_PFB_VARIANTS = ("s2d", "s2d_mono", "pallas", "pallas_db", "pallas_bf16")


def _tier_plan(t: str, results: list, custom: bool) -> str | None:
    """Pre-run decision for tier `t`: None = run it, "skip" = next tier,
    "stop" = end the chain.  An explicit BENCH_TIERS list (custom=True)
    is a head-to-head request: run EVERY listed tier — the early-break /
    skip logic exists only to save time on the default fallback chain
    and would otherwise end an A/B after its first verified tier."""
    if custom:
        return None
    if results and t not in ("fused", "fused_s2d", "fused_s2d_of",
                             "complex", "pfb"):
        return "stop"         # a full-decode tier verified; lower tiers
        # are strictly-worse fallbacks, not extra data
    if t in ("fused", "complex") and any(
            r.get("variant", "").startswith("fused") for r in results):
        return "skip"         # a fused tier already proved the full
        # decode; the strided/staged variants are the same decisions,
        # strictly slower (and the strided conv has been observed to
        # hang its child on this backend since the kernel reorder)
    return None


def _after_verified(t: str, custom: bool) -> str:
    """Post-success decision: "continue" to the next tier or "stop".
    On the default chain a verified full-decode tier still continues so
    the 96-channel PFB gets its own number; a custom A/B list always
    continues (every requested tier must be measured)."""
    if custom or t in ("fused", "fused_s2d", "fused_s2d_of", "complex"):
        return "continue"
    return "stop"


def _pfb_variant() -> str:
    """BENCH_PFB_VARIANT, validated — an unknown value must fail loudly,
    not silently select the legacy fused path and mislabel the result."""
    v = os.environ.get("BENCH_PFB_VARIANT", "s2d")
    if v not in _PFB_VARIANTS:
        raise SystemExit(f"[bench] BENCH_PFB_VARIANT={v!r} invalid; "
                         f"choose from {_PFB_VARIANTS}")
    return v


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


def _run_tier(tier: str, num_carriers: int, scale: int, iters: int):
    """Execute one tier in this process; returns (sps, variant, carriers)."""
    import jax
    import jax.numpy as jnp

    from tetraear_tpu.config import ReceiverConfig
    from tetraear_tpu.models.multicarrier import (MulticarrierFrontend,
                                                  PfbMulticarrierFrontend)
    from tetraear_tpu.models.realpair import RealPairFrontend, mixer_table
    from tetraear_tpu.utils.backend import put_complex

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

    if tier == "fused":
        # composite-kernel front-end (ops/fused.py): decision-identical
        # to "complex" (tests/unit/test_fused_frontend.py), MXU-shaped
        mc = MulticarrierFrontend(cfg, num_candidates=64, threshold=0.80,
                                  fused=True)
        fn = mc._compiled_fused(tuple(float(v) for v in offsets))
        xs = [put_complex(x) for x in xs_np]
        zero = jnp.int32(0)
        rate = _verified_rate(lambda x: fn(x, zero), digest, xs, n, iters)
        return rate, "fused_demod_decode", num_carriers
    if tier == "fused_s2d_of":
        # output-folded space-to-depth conv: 2C*fold output channels fill
        # all 128 MXU output lanes (ops/fused.s2d_of_kernel)
        mc = MulticarrierFrontend(cfg, num_candidates=64, threshold=0.80,
                                  fused="s2d_of")
        fn = mc._compiled_fused(tuple(float(v) for v in offsets))
        xs = [put_complex(x) for x in xs_np]
        zero = jnp.int32(0)
        rate = _verified_rate(lambda x: fn(x, zero), digest, xs, n, iters)
        return rate, "fused_s2d_of_demod_decode", num_carriers
    if tier.startswith("fused_pallas"):   # _db/_bf16/_of4/_of4_bf16
        # MXU-mapped Pallas conv stage (ops/pallas/s2d_conv.py); not in
        # the default TIERS until a healthy-window head-to-head shows it
        # ahead — enable via BENCH_TIERS=fused_pallas,...
        mc = MulticarrierFrontend(
            cfg, num_candidates=64, threshold=0.80,
            fused=tier.removeprefix("fused_"))
        fn = mc._compiled_fused(tuple(float(v) for v in offsets))
        xs = [put_complex(x) for x in xs_np]
        zero = jnp.int32(0)
        rate = _verified_rate(lambda x: fn(x, zero), digest, xs, n, iters)
        return rate, f"{tier}_demod_decode", num_carriers
    if tier == "fused_s2d":
        # space-to-depth stride-1 formulation of the same composite conv
        # (ops/fused.s2d_kernel): decimation folded into the channel dim
        mc = MulticarrierFrontend(cfg, num_candidates=64, threshold=0.80,
                                  fused="s2d")
        fn = mc._compiled_fused(tuple(float(v) for v in offsets))
        xs = [put_complex(x) for x in xs_np]
        zero = jnp.int32(0)
        rate = _verified_rate(lambda x: fn(x, zero), digest, xs, n, iters)
        return rate, "fused_s2d_demod_decode", num_carriers
    if tier == "complex":
        mc = MulticarrierFrontend(cfg, num_candidates=64, threshold=0.80)
        xs = [put_complex(x) for x in xs_np]
        od = jax.device_put(jnp.asarray(offsets))
        rate = _verified_rate(lambda x: mc(x, od, start_index=0), digest,
                              xs, n, iters)
        return rate, "demod_decode", num_carriers
    if tier == "pfb":
        # 96-channel polyphase filterbank as ONE dense modulated conv
        # (ops/fused.pfb_kernel): every 25 kHz channel in the 2.4 MHz
        # capture decoded at once.  The gather-based formulation is
        # pathological on the remote backend (tools/tpu_bisect.py).
        pfb = PfbMulticarrierFrontend(
            cfg, num_candidates=64, threshold=0.80,
            # space-to-depth dense conv + split dispatch on accelerators
            # (the 16-carrier tier's wins applied full-band); the gather
            # form wins on CPU (the dense kernel does C x the FLOPs).
            # BENCH_PFB_VARIANT=s2d_mono fuses conv+tail into one program
            # (the 96-channel split was measured NOT to overlap).
            fused=(_pfb_variant() if jax.default_backend() != "cpu"
                   else False))
        xs = [put_complex(x) for x in xs_np]
        return _verified_rate(pfb, digest, xs, n, iters), \
            "pfb_demod_decode", 96
    if tier in ("realpair64", "realpair0"):
        # transcendental/complex-free formulation (models/realpair.py);
        # k=64 appends the on-device candidates+CRC stage (full decode),
        # k=0 is demod+sync only
        k = 64 if tier == "realpair64" else 0
        rp = RealPairFrontend(cfg, num_candidates=k, threshold=0.80)
        table = jax.device_put(jnp.asarray(
            mixer_table(offsets, cfg.sample_rate_hz)))
        fn = rp._compiled(n, num_carriers)
        xs_ri = [jax.device_put(jnp.asarray(
            np.stack([x.real, x.imag]).astype(np.float32)))
            for x in xs_np]
        rate = _verified_rate(lambda x: fn(x, table), digest, xs_ri, n,
                              iters)
        return rate, ("demod_decode_realpair" if k else
                      "demod_sync_realpair"), num_carriers
    if tier == "single":
        # single-carrier Frontend on CLI-sized blocks — directly comparable
        # to the baseline (the reference is single-channel at 2.4 MS/s)
        from tetraear_tpu.models.receiver import Frontend
        fe = Frontend(cfg)
        n_s = 2048 * step
        fn = fe._compiled(n_s, False)
        xs_s = [put_complex(x[:n_s]) for x in xs_np]
        zero = jnp.float32(0.0)
        rate = _verified_rate(lambda x: fn(x, zero), digest, xs_s, n_s,
                              iters * 4)
        return rate, "singlecarrier_demod_sync", 1
    raise ValueError(f"unknown tier {tier}")


def _measure_cpu(num_carriers: int, scale: int, iters: int):
    """CPU fallback: all full-decode variants, report the fastest (one
    variant's regression must not zero out the whole fallback bench)."""
    results = []
    for tier in ("complex", "realpair64", "pfb"):
        try:
            results.append(_run_tier(tier, num_carriers, scale, iters))
        except Exception as e:
            print(f"[bench] cpu variant {tier} failed: {str(e)[:80]}",
                  file=sys.stderr)
    if not results:
        raise RuntimeError("no CPU variant completed")
    return max(results)


def main() -> int:
    force_cpu = "--cpu" in sys.argv
    tier = None
    if "--tier" in sys.argv:
        tier = sys.argv[sys.argv.index("--tier") + 1]
    if force_cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    # size knobs (used by tests/unit/test_bench.py to exercise the full
    # CLI contract cheaply; defaults are the real benchmark)
    kw = dict(
        num_carriers=int(os.environ.get("BENCH_CARRIERS", 16)),
        # scale 8 (8.3 M samples/block) measured fastest on the remote
        # TPU (52.8 vs 42.3 MS/s at scale 2 — block size amortizes the
        # per-dispatch overhead; 16.6 M regresses)
        scale=int(os.environ.get("BENCH_SCALE", 8)),
        iters=int(os.environ.get("BENCH_ITERS", 6)),
    )

    if tier is not None:
        # child mode: one tier, one process (failures cannot poison the
        # other tiers), one JSON line up to the parent.  The lock no-ops
        # when the parent already holds it; a hand-run --tier serializes
        # itself against other measurement jobs.
        import jax
        from tetraear_tpu.utils.backend import device_measure_lock
        try:
            with device_measure_lock():
                sps, variant, carriers = _run_tier(tier, **kw)
            print(json.dumps({"ok": True, "sps": sps, "variant": variant,
                              "carriers": carriers,
                              "backend": jax.default_backend()}))
            sys.stdout.flush()
            os._exit(0)
        except Exception as e:
            print(json.dumps({"ok": False,
                              "err": f"{type(e).__name__}: {str(e)[:160]}"}))
            sys.stdout.flush()
            os._exit(1)

    if force_cpu:
        try:
            sps, variant, carriers = _measure_cpu(**kw)
        except Exception:
            print(json.dumps({"metric": "bench_failed", "value": 0,
                              "unit": "samples/s", "vs_baseline": 0}))
            return 1
        print(json.dumps({
            "metric": f"iq_samples_per_sec_{carriers}carrier_{variant}"
                      "_cpu_fallback",
            "value": round(sps, 1), "unit": "samples/s",
            "vs_baseline": round(sps / BASELINE_SPS, 2)}))
        sys.stdout.flush()
        os._exit(0)

    # parent: serialize against other measurement jobs (bench_watch,
    # tools/tpu_conv_probe.py) — concurrent users of the single tunneled
    # chip read each other's latency as hangs
    from tetraear_tpu.utils.backend import device_measure_lock
    lock = device_measure_lock()
    lock.__enter__()

    # health-classify first — on a wedged tunnel every tier child would
    # burn its full budget, so gate on tools/tpu_health.py BEFORE
    # launching tiers.  A bare f32 digest is NOT a sufficient gate:
    # window classes are op-dependent on this backend (an f32 probe can
    # pass while top_k/gather-class programs — which every decode tier
    # runs — still hang; see CLAUDE.md).  We require the op classes the
    # tiers actually execute: f32 + gather + top_k.  c64 probes may
    # fail — the real-pair tiers exist for exactly those windows.
    # Wedged windows recover on minute scales, so retry for a bounded
    # wait (BENCH_PROBE_WAIT_S, default 10 min) before conceding to the
    # CPU fallback.  measure_watch.sh verifies health under the same
    # device-lock hold immediately before invoking bench; it sets
    # BENCH_SKIP_PROBE=1 so the scarce window isn't spent re-probing.
    health_py = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tools", "tpu_health.py")
    need_ok = ("f32_add", "f32_matmul", "gather", "top_k")
    probe_wait = float(os.environ.get("BENCH_PROBE_WAIT_S", 600))
    probe_deadline = time.monotonic() + probe_wait
    probe_ok = os.environ.get("BENCH_SKIP_PROBE") == "1"
    while not probe_ok:
        try:
            pr = subprocess.run([sys.executable, health_py],
                                capture_output=True, text=True, timeout=540)
            oks = {ln.split()[1] for ln in pr.stdout.splitlines()
                   if ln.startswith("OK ") and len(ln.split()) > 1}
            probe_ok = all(p in oks for p in need_ok)
        except subprocess.TimeoutExpired:
            probe_ok = False
        if probe_ok or time.monotonic() >= probe_deadline:
            break
        print("[bench] health probe not tier-capable; retrying "
              f"({max(0.0, probe_deadline - time.monotonic()):.0f}s left)",
              file=sys.stderr)
        time.sleep(min(60, max(1.0, probe_deadline - time.monotonic())))
    if not probe_ok:
        print("[bench] accelerator probe failed/hung; skipping tiers",
              file=sys.stderr)

    # probe accelerator tiers in isolated children, best tier wins; once a
    # full-decode tier verifies, also try the PFB for the higher channel
    # count, then stop (don't burn time on lower tiers)
    # BENCH_TIERS overrides the tier chain (comma list, e.g.
    # "fused_pallas,fused_s2d" for a same-window head-to-head of a
    # not-yet-promoted tier); unknown names fail loudly in the child
    tiers = TIERS
    custom_tiers = bool(os.environ.get("BENCH_TIERS"))
    if custom_tiers:
        tiers = tuple(t.strip() for t in
                      os.environ["BENCH_TIERS"].split(",") if t.strip())

    results = []
    hangs = 0
    for t in tiers if probe_ok else ():
        if hangs >= 2:
            break             # two hung tiers: the tunnel wedged mid-run
            # (a single hang can be a transient — observed healthy
            # windows alternate hang/success across child processes)
        action = _tier_plan(t, results, custom_tiers)
        if action == "stop":
            break
        if action == "skip":
            continue
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--tier", t],
                capture_output=True, text=True, timeout=TIER_TIMEOUT_S)
            line = (proc.stdout.strip().splitlines() or ["{}"])[-1]
            res = json.loads(line)
        except subprocess.TimeoutExpired:
            print(f"[bench] tier {t} timed out (> {TIER_TIMEOUT_S:.0f}s)",
                  file=sys.stderr)
            hangs += 1
            continue
        except (ValueError, json.JSONDecodeError):
            print(f"[bench] tier {t} produced no result", file=sys.stderr)
            continue
        if res.get("ok") and res.get("backend") != "cpu":
            results.append(res)
            print(f"[bench] tier {t}: {res['sps']:.0f} samples/s on "
                  f"{res['backend']}", file=sys.stderr)
            if _after_verified(t, custom_tiers) == "continue":
                continue              # also measure the 96-channel PFB
            break
        print(f"[bench] tier {t} failed "
              f"({res.get('err', 'backend=cpu')[:90]})", file=sys.stderr)

    if results:
        best = max(results, key=lambda r: r["sps"])
        scope = ("" if best["variant"].startswith("singlecarrier")
                 else f"{best['carriers']}carrier_")
        print(json.dumps({
            "metric": f"iq_samples_per_sec_per_chip_{scope}"
                      f"{best['variant']}",
            "value": round(best["sps"], 1), "unit": "samples/s",
            "vs_baseline": round(best["sps"] / BASELINE_SPS, 2)}))
        sys.stdout.flush()
        os._exit(0)

    # accelerator unusable -> honest CPU fallback in a fresh process
    print("[bench] no accelerator tier verified; falling back to CPU "
          "backend", file=sys.stderr)
    proc = subprocess.run([sys.executable, os.path.abspath(__file__),
                           "--cpu"], capture_output=True, text=True,
                          timeout=1800)
    sys.stdout.write(proc.stdout.splitlines()[-1] + "\n"
                     if proc.stdout.strip() else "{}\n")
    sys.stdout.flush()
    os._exit(proc.returncode)


if __name__ == "__main__":
    sys.exit(main())
