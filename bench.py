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
    n = 16000 * step * 8                 # 16.64 M wideband samples (~6.9 s air)
    num_bufs = 4                         # rotate inputs: no same-buffer reuse

    rng = np.random.default_rng(0)
    offsets = ((np.arange(num_carriers) - (num_carriers - 1) / 2) * 25e3
               ).astype(np.float32)

    mc = MulticarrierFrontend(cfg, num_candidates=64, threshold=0.80)
    xs = [jax.device_put(jnp.asarray(
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64) * 0.1)) for _ in range(num_bufs)]
    od = jax.device_put(jnp.asarray(offsets))
    jax.block_until_ready(xs)

    # warmup / compile
    out = mc(xs[0], od)
    jax.block_until_ready(out)

    iters = 12
    t0 = time.perf_counter()
    for i in range(iters):
        out = mc(xs[i % num_bufs], od, start_index=0)
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
