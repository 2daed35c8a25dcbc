#!/usr/bin/env bash
# Health-gated TPU measurement runner: wait for a FULLY healthy window
# (tools/tpu_health.py "verdict: healthy" — an f32-only probe passes in
# windows where top_k/gather-class programs still hang, see CLAUDE.md),
# then run the requested probes and the bench, all under ONE hold of the
# shared device lock so nothing can wedge the device between the health
# verdict and the measurements.  Probes/bench honor the holder protocol
# (TETRAEAR_DEVLOCK_HELD=1 makes their internal device_measure_lock a
# no-op — utils/backend.py).
#
# Usage:
#   bash tools/measure_watch.sh                      # full bench only
#   bash tools/measure_watch.sh cand96 s2d16_of4     # probes, then bench
#   bash tools/measure_watch.sh bench:fused_pallas,fused_s2d_of pallas16
#     — a "bench:<tiers>" arg runs an extra BENCH_TIERS head-to-head
#     bench in the SAME healthy window (windows are scarce; one window
#     should yield both the headline bench and any A/B)
#
# Writes progress to stdout; run under nohup/tmux for long waits.
set -u
cd "$(dirname "$0")/.."
PROBES=("$@")
for attempt in $(seq 1 90); do
  if flock -w 7200 /tmp/tetraear_tpu_device.lock \
       env TETRAEAR_DEVLOCK_HELD=1 bash -s -- ${PROBES[@]+"${PROBES[@]}"} \
       <<'INNER'
set -u
if ! timeout 400 python tools/tpu_health.py >/tmp/measure_health.txt 2>&1 \
   || ! grep -q "verdict: healthy" /tmp/measure_health.txt; then
  exit 1
fi
echo "=== healthy at $(date +%H:%M:%S) ==="
# bench FIRST: it is the headline number and short windows can close
# before a long probe list finishes.  bench.py's own f32 pregate is
# cheap (~15 s) so it is NOT skipped — a verdict can go stale between
# steps in this list (ADVICE r3), and bench cycles/fails fast anyway.
# BENCH_WINDOW_S is shortened: health was verified seconds ago, so a
# wedge mid-run means the window closed — hand the slot to the probes.
echo "=== full bench ==="
BENCH_WINDOW_S=900 timeout 1800 python bench.py 2>/tmp/measure_bench.err
grep "tier" /tmp/measure_bench.err
for p in "$@"; do
  case "$p" in
    bench:*)
      echo "=== bench tiers ${p#bench:} ==="
      BENCH_TIERS="${p#bench:}" BENCH_WINDOW_S=900 timeout 1800 \
        python bench.py 2>/tmp/measure_bench_ab.err
      grep "tier" /tmp/measure_bench_ab.err
      ;;
    *)
      timeout 700 python tools/tpu_conv_probe.py --probe "$p" --scale 8
      ;;
  esac
done
exit 0
INNER
  then
    exit 0
  fi
  echo "not healthy $(date +%H:%M:%S) ($attempt): \
$(grep verdict /tmp/measure_health.txt | head -1)"
  sleep 240
done
echo "no healthy window in $attempt attempts"
exit 1
