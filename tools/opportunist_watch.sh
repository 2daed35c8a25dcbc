#!/usr/bin/env bash
# Opportunistic TPU measurement queue (round-4 replacement for the
# all-probes-healthy gate of measure_watch.sh): window classes on this
# backend are op-dependent and flap on minute scales — a full-health
# verdict is often unreachable in windows where individual tiers run
# fine (observed live: bench verified two tiers minutes after a
# "degraded" verdict).  So: every cycle, a 15 s f32 pregate; if it
# passes, attempt the next PENDING item directly under a bounded
# timeout.  Each item is its own probe (fast-fail first sync).  Items
# are marked done by sentinel files so the queue survives restarts.
#
# Usage: nohup bash tools/opportunist_watch.sh > logs/oppwatch.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=logs/r4_measure
mkdir -p "$OUT"

# name|timeout|command  (command's stdout -> $OUT/<name>.out)
ITEMS=(
  "bench_b4|700|python bench.py --tier fused_s2d_of_b4"
  "bench_b8|700|python bench.py --tier fused_s2d_of_b8"
  "bench_of|700|python bench.py --tier fused_s2d_of"
  "pallas16|700|python tools/tpu_conv_probe.py --probe pallas16 --scale 8"
  "pallas16_of4|700|python tools/tpu_conv_probe.py --probe pallas16_of4 --scale 8"
  "pallas96|700|python tools/tpu_conv_probe.py --probe pallas96 --scale 8"
  "cand96|700|python tools/tpu_conv_probe.py --probe cand96 --scale 8"
  "tail96|700|python tools/tpu_conv_probe.py --probe tail96 --scale 8"
  "bench_pfb|900|python bench.py --tier pfb"
  "bench_pfb_b4|900|python bench.py --tier pfb_b4"
  "bench_pfb_mono|900|BENCH_PFB_VARIANT=s2d_mono python bench.py --tier pfb"
  "bench_pfb_hb16|900|BENCH_PFB_VARIANT=s2d_hb16 python bench.py --tier pfb"
  # conv-floor input-proportionality: if ms/block halves at scale 4 the
  # floor is input-linear (bytes/positions); if it sticks near ~29.5 it
  # is a fixed per-program cost — decides the next kernel strategy
  "s2d16_sc4|700|python tools/tpu_conv_probe.py --probe s2d16 --scale 4"
  "s2d16_sc2|700|python tools/tpu_conv_probe.py --probe s2d16 --scale 2"
  "s2d16_sc8|700|python tools/tpu_conv_probe.py --probe s2d16 --scale 8"
  # real HBM bandwidth (the 38.5 GB/s 'apparent' number may be the
  # dispatch floor in disguise — ROOFLINE.md revision hinges on this)
  "hbm1g|700|python tools/tpu_conv_probe.py --probe hbm1g --iters 6"
)

pregate() {
  timeout 15 python - <<'EOF' 2>/dev/null | grep -q DIGEST
import numpy as np, jax, jax.numpy as jnp
x = jnp.asarray(np.arange(200000, dtype=np.float32))
print("DIGEST", float(np.asarray(jnp.sum(x + 1.0).astype(jnp.float32))))
EOF
}

for attempt in $(seq 1 400); do
  # hard runtime cap: the driver runs its own bench at round end and
  # must find the device lock free — never outlive ~7.5 h
  [ "$SECONDS" -gt 27000 ] && { echo "runtime cap reached"; exit 0; }
  pending=0
  for item in "${ITEMS[@]}"; do
    name="${item%%|*}"; rest="${item#*|}"
    tmo="${rest%%|*}"; cmd="${rest#*|}"
    [ -e "$OUT/$name.done" ] && continue
    pending=1
    if ! pregate; then
      echo "[$(date +%H:%M:%S)] pregate hung; sleeping"
      break
    fi
    echo "[$(date +%H:%M:%S)] attempt $name"
    if flock -w 600 /tmp/tetraear_tpu_device.lock \
         env TETRAEAR_DEVLOCK_HELD=1 timeout "$tmo" bash -c "$cmd" \
         > "$OUT/$name.out.tmp" 2> "$OUT/$name.err"; then
      # success requires a real result line, not just rc=0
      if grep -qE '"ok": true|ms_per_block' "$OUT/$name.out.tmp"; then
        mv "$OUT/$name.out.tmp" "$OUT/$name.out"
        touch "$OUT/$name.done"
        echo "[$(date +%H:%M:%S)] DONE $name: $(tail -c 200 "$OUT/$name.out")"
        continue
      fi
    fi
    echo "[$(date +%H:%M:%S)] $name failed/hung: $(tail -c 150 "$OUT/$name.out.tmp" 2>/dev/null) $(tail -c 100 "$OUT/$name.err" 2>/dev/null | tr '\n' ' ')"
    break   # window likely closed; re-pregate next cycle
  done
  [ "$pending" = 0 ] && { echo "queue drained"; exit 0; }
  sleep 150
done
echo "attempts exhausted"
