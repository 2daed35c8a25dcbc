#!/usr/bin/env python3
"""Benchmark: IQ samples/s/chip through the multi-carrier demod+decode
device pipeline (BASELINE config 4: 16 TETRA carriers channelized from one
wideband stream, demodulated, sync-correlated, CRC-checked on device).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's pure-Python chain sustains at best ~2.4 MS/s
(real-time single channel on a desktop core; BASELINE.md "Realized
throughput"), so vs_baseline = samples_per_sec / 2.4e6.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tetraear_tpu.config import ReceiverConfig
    from tetraear_tpu.models.multicarrier import MulticarrierFrontend

    cfg = ReceiverConfig()
    num_carriers = 16
    step = cfg.decimation_factor * cfg.ref_samples_per_symbol
    n = 8000 * step                      # 1.04 M wideband samples (~0.43 s air)

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64) * 0.1
    offsets = ((np.arange(num_carriers) - (num_carriers - 1) / 2) * 25e3
               ).astype(np.float32)

    mc = MulticarrierFrontend(cfg, num_candidates=64, threshold=0.80)
    xd = jax.device_put(jnp.asarray(x))
    od = jax.device_put(jnp.asarray(offsets))

    # warmup / compile
    out = mc(xd, od)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        out = mc(xd, od, start_index=0)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    samples_per_sec = n * iters / dt
    baseline = 2.4e6
    print(json.dumps({
        "metric": "iq_samples_per_sec_per_chip_16carrier_demod_decode",
        "value": round(samples_per_sec, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / baseline, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
