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


class TestTierPlan:
    """The tier-chain control decisions (pure helpers) — in particular
    that an explicit BENCH_TIERS list runs EVERY listed tier: the
    default chain's early-break once ended A/B runs after their first
    verified tier, wasting a scarce healthy TPU window."""

    def test_custom_list_runs_every_tier(self, bench):
        tiers = ("fused_pallas", "fused_pallas_of4", "fused_s2d_of")
        results = []
        ran = []
        for t in tiers:
            assert bench._tier_plan(t, results, custom=True) is None
            ran.append(t)
            results.append({"ok": True, "variant": t})
            assert bench._after_verified(t, custom=True) == "continue"
        assert ran == list(tiers)

    def test_default_chain_stops_after_full_decode(self, bench):
        results = [{"ok": True, "variant": "fused_s2d_of_demod_decode"}]
        # lower fallbacks don't run once a full-decode tier verified
        assert bench._tier_plan("realpair64", results, False) == "stop"
        assert bench._tier_plan("single", results, False) == "stop"
        # but the PFB still gets its own number
        assert bench._tier_plan("pfb", results, False) is None

    def test_default_chain_skips_redundant_fused(self, bench):
        results = [{"ok": True, "variant": "fused_s2d_demod_decode"}]
        assert bench._tier_plan("fused", results, False) == "skip"
        assert bench._tier_plan("complex", results, False) == "skip"

    def test_default_post_success(self, bench):
        assert bench._after_verified("fused_s2d_of", False) == "continue"
        assert bench._after_verified("pfb", False) == "stop"
        assert bench._after_verified("realpair64", False) == "stop"


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
