"""bench.py contract tests (the driver-facing benchmark artifact).

Runs the measurement machinery small (4 carriers, 1 iter) on the CPU
backend; pins the tier labels and the one-line-JSON contract without
paying the full benchmark cost.
"""

import json
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def bench():
    sys.path.insert(0, "/root/repo")
    import bench as b
    return b


class TestMeasure:
    def test_cpu_measure_small(self, bench):
        sps, variant, carriers = bench._measure_cpu(num_carriers=4,
                                                    scale=1, iters=1)
        assert variant in ("demod_decode", "demod_decode_realpair",
                           "pfb_demod_decode")
        assert carriers in (4, 96)
        assert sps > 1e5          # sanity: >0.1 MS/s even tiny/contended

    def test_tier_child_contract(self, bench):
        # every tier must run standalone and return (sps, variant, carriers)
        sps, variant, carriers = bench._run_tier("single", num_carriers=4,
                                                 scale=1, iters=1)
        assert variant == "singlecarrier_demod_sync" and carriers == 1
        assert sps > 1e5

    def test_verified_rate_raises_on_hang(self, bench, monkeypatch):
        # a digest that never completes must raise, not wedge the bench
        monkeypatch.setattr(bench, "WATCHDOG_S", 0.2)
        import time

        def hang(_):
            time.sleep(3600)

        with pytest.raises(TimeoutError):
            bench._verified_rate(lambda x: x, hang, [np.zeros(4)], 4, 1)


class TestPickTier:
    """The tier-cycling decisions (pure helper) — in particular that an
    explicit BENCH_TIERS list measures EVERY listed tier (a scarce
    healthy window must yield the whole A/B), and that the default chain
    rotates to robust tiers instead of giving up (round-3 failure: a
    one-shot probe loop conceded windows where a tier would have run)."""

    def test_custom_list_measures_every_tier(self, bench):
        custom = ("fused_pallas", "fused_pallas_of4", "fused_s2d_of")
        results, attempts = [], {}
        ran = []
        while True:
            t = bench.pick_tier(results, attempts, custom)
            if t is None:
                break
            ran.append(t)
            results.append({"ok": True, "tier": t})
        assert ran == list(custom)

    def test_custom_list_rotates_then_retries_failed_tier(self, bench):
        custom = ("fused_pallas", "fused_s2d_of")
        # first tier failed -> the OTHER pending tier gets its turn
        # (a hang-prone entry must not starve the rest of the A/B list)
        attempts = {"fused_pallas": 1}
        assert bench.pick_tier([], attempts, custom) == "fused_s2d_of"
        # once attempts even out, the failed tier is retried
        attempts["fused_s2d_of"] = 1
        assert bench.pick_tier([], attempts, custom) == "fused_pallas"
        # verified tiers leave the rotation
        res = [{"tier": "fused_pallas"}]
        assert bench.pick_tier(res, attempts, custom) == "fused_s2d_of"

    def test_default_fastest_first_then_pfb_then_done(self, bench):
        results, attempts = [], {}
        t = bench.pick_tier(results, attempts, None)
        assert t == "fused_pallas_bf16"
        results.append({"ok": True, "tier": t})
        assert bench.pick_tier(results, attempts, None) == "pfb"
        results.append({"ok": True, "tier": "pfb"})
        assert bench.pick_tier(results, attempts, None) is None

    def test_default_rotates_to_robust_tier_on_failures(self, bench):
        results = []
        attempts = {"fused_pallas_bf16": 1}
        # one failure: the cheaper-attempts tiers get their turn
        nxt = bench.pick_tier(results, attempts, None)
        assert nxt in ("fused_s2d_of", "realpair64")
        # all full-decode tiers failed twice -> degraded-class fallback
        attempts = {t: 2 for t in bench.FULL_DECODE_16C}
        assert bench.pick_tier(results, attempts, None) == "realpair0"

    def test_default_keeps_cycling_after_fallback_exhausted(self, bench):
        # even with everything failing, the loop never returns None
        # before the window budget expires (the parent enforces time)
        attempts = {t: 2 for t in bench.FULL_DECODE_16C}
        attempts["realpair0"] = 2
        assert bench.pick_tier([], attempts, None) in bench.FULL_DECODE_16C


class TestResultLine:
    def test_accelerator_line(self, bench):
        rec = {"sps": 2.4e8, "variant": "fused_s2d_of_demod_decode",
               "carriers": 16, "backend": "tpu"}
        r = json.loads(bench._result_line(rec))
        assert r["metric"] == ("iq_samples_per_sec_per_chip_16carrier_"
                               "fused_s2d_of_demod_decode")
        assert r["vs_baseline"] == 100.0

    def test_cpu_floor_line_is_labeled(self, bench):
        rec = {"sps": 4.6e6, "variant": "demod_decode_realpair",
               "carriers": 16, "backend": "cpu"}
        r = json.loads(bench._result_line(rec))
        assert r["metric"].endswith("_cpu_fallback")

    def test_no_result(self, bench):
        r = json.loads(bench._result_line(None))
        assert r["metric"] == "bench_failed" and r["value"] == 0

    def test_reporter_prefers_accelerator(self, bench):
        rep = bench._Reporter()
        rep.offer({"sps": 9e9, "backend": "cpu", "variant": "x",
                   "carriers": 16})
        rep.offer({"sps": 1e8, "backend": "tpu", "variant": "y",
                   "carriers": 16})
        assert rep.best["sps"] == 1e8 and rep.cpu["sps"] == 9e9


class TestCliContract:
    @pytest.mark.slow
    def test_one_json_line(self):
        import os
        env = dict(os.environ, BENCH_CARRIERS="4", BENCH_SCALE="1",
                   BENCH_ITERS="1")
        proc = subprocess.run(
            [sys.executable, "/root/repo/bench.py", "--cpu"],
            capture_output=True, text=True, timeout=1700, env=env)
        assert proc.returncode == 0, proc.stderr[-500:]
        lines = [l for l in proc.stdout.splitlines() if l.strip()]
        assert len(lines) == 1, proc.stdout
        rec = json.loads(lines[0])
        assert set(rec) == {"metric", "value", "unit", "vs_baseline"}
        assert rec["unit"] == "samples/s"
        assert rec["value"] > 0
