"""Multi-host distributed runtime glue (SURVEY.md §2.3 / §5.8).

TETRA carriers never communicate and time halos only touch ring
neighbours, so the pod recipe is:

  1. `initialize_distributed()` on every host (jax.distributed) — the
     standard TPU-pod env vars (TPU_WORKER_HOSTNAMES etc.) or explicit
     coordinator args;
  2. build one global (carrier, time) mesh over jax.devices() — put
     `carrier` on the slower/DCN-spanning dimension (no traffic) and keep
     `time` on ICI rings so the overlap-save ppermutes stay intra-slice
     (parallel/mesh.py ordering does this for standard device orders);
  3. each host device_puts its own IQ shard (per-host ingestion,
     `host_local_shard`) and runs the jitted sharded step
     (parallel/sharded.py); ragged decode results return host-side per
     shard and are stitched locally (ShardedReceiver.decode) — no global
     gather needed because frame ownership is shard-local.

Single-process fallback: everything below degrades to a no-op so the same
program runs on one host / the CPU test mesh.
"""

from __future__ import annotations

import logging
from typing import Optional

logger = logging.getLogger(__name__)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed; returns True when multi-process.

    With no arguments, relies on the TPU pod environment (the usual
    auto-detection).  Safe to call when single-host: failures degrade to
    single-process mode with a log line.
    """
    import jax

    try:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        else:
            jax.distributed.initialize()
        multi = jax.process_count() > 1
        logger.info("jax.distributed: process %d/%d, %d local / %d global "
                    "devices", jax.process_index(), jax.process_count(),
                    jax.local_device_count(), jax.device_count())
        return multi
    except Exception as e:
        logger.info("single-process mode (%s)", str(e)[:120])
        return False


def host_local_shard(total_samples: int) -> tuple[int, int]:
    """(start, length) of this host's slice of a time-sharded stream,
    aligned to the decimation*sps grid so shard contracts hold."""
    import jax

    grid = 130  # decim * sps at reference rates
    nproc = jax.process_count()
    pid = jax.process_index()
    per = (total_samples // nproc // grid) * grid
    return pid * per, per


def make_global_mesh(time_axis_per_host: int = 1):
    """(carrier, time) mesh over all global devices: time axis spans the
    devices *within* each host (ICI-adjacent under standard ordering),
    carrier spans hosts."""
    import jax

    from tetraear_tpu.parallel.mesh import make_mesh

    n_local = jax.local_device_count()
    n_total = jax.device_count()
    time_size = min(time_axis_per_host * max(n_local, 1), n_total)
    while n_total % time_size:
        time_size -= 1
    return make_mesh(carrier=n_total // time_size, time=time_size)
