"""Child process for the multi-process jax.distributed test.

Run by tests/integration/test_distributed.py, twice in parallel:

    python distributed_child.py --coordinator localhost:PORT --pid {0,1} \
        --out result_{pid}.npz

Each process: 4 virtual CPU devices -> 8 global; initialize_distributed;
make_global_mesh sanity; then a time-spans-hosts mesh where each host
ingests ONLY its own half of the IQ stream (host_local_shard), runs the
jitted sharded step, and saves its addressable output shards.  The parent
stitches both halves and compares against the single-process run.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

# exactly 4 virtual devices per process: drop any inherited device-count
# flag (the test-suite conftest exports 8 for in-process tests)
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    ["--xla_force_host_platform_device_count=4"] + _flags)

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--num", type=int, default=2)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tetraear_tpu.config import ReceiverConfig
    from tetraear_tpu.parallel.distributed import (host_local_shard,
                                                   initialize_distributed,
                                                   make_global_mesh)
    from tetraear_tpu.parallel.mesh import CARRIER_AXIS, TIME_AXIS, make_mesh
    from tetraear_tpu.parallel.sharded import build_sharded_step
    from tetraear_tpu.utils import synth

    multi = initialize_distributed(coordinator_address=args.coordinator,
                                   num_processes=args.num,
                                   process_id=args.pid)
    assert multi, "expected multi-process mode"
    assert jax.process_count() == args.num
    assert jax.device_count() == 4 * args.num
    assert jax.local_device_count() == 4

    # make_global_mesh sanity: time within hosts, carrier across
    gmesh = make_global_mesh()
    assert dict(zip(gmesh.axis_names, gmesh.devices.shape)) == {
        CARRIER_AXIS: args.num, TIME_AXIS: 4}

    # equality harness: time spans BOTH hosts so host-local ingestion is
    # exercised (each host device_puts only its own half)
    mesh = make_mesh(carrier=1, time=4 * args.num)

    cfg = ReceiverConfig()
    step = cfg.decimation_factor * cfg.ref_samples_per_symbol
    n_total = 8 * 320 * step            # divisible by 8 shards * grid
    # deterministic wideband input both hosts can synthesize identically
    stream = synth.make_stream_bits(num_frames=12, lead_bits=64, seed=2,
                                    golden=True)
    syms = synth.bits_to_symbols(stream)
    ph = synth.synthesize_symbol_phasors(syms, mapping="ref")
    iq = synth.upsample_hold(ph, 2.4e6, 2.4e6 / 130.0)
    x = np.zeros(n_total, np.complex64)
    x[: min(len(iq), n_total)] = iq[: n_total]

    start, length = host_local_shard(n_total)
    assert length == n_total // args.num and start == args.pid * length
    local = x[start: start + length]

    sharding = NamedSharding(mesh, P(TIME_AXIS))
    xs = jax.make_array_from_process_local_data(sharding, local,
                                                global_shape=(n_total,))
    offs = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(CARRIER_AXIS)),
        np.zeros(1, np.float32), global_shape=(1,))

    halo = 132 * step
    run = build_sharded_step(mesh, cfg, halo)
    res = run(xs, offs)

    shards = {}
    for name in ("bits", "sync_corr"):
        arr = getattr(res, name)
        for s in arr.addressable_shards:
            # index[1] is this shard's slice along the time axis
            shards[f"{name}_{s.index[1].start or 0}"] = np.asarray(s.data)
    np.savez(args.out, **shards,
             meta=np.asarray([n_total, halo, args.pid]))
    print("CHILD_OK", args.pid, len(shards))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
