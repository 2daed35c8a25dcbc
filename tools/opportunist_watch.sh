#!/usr/bin/env bash
# Opportunistic TPU measurement queue — round-5 rework of the r4 design.
#
# The r4 queue had three process bugs (VERDICT r4 "What's weak" #1/#2):
#   (a) its 15 s f32 pregate ran WITHOUT the device lock, so it contended
#       with a concurrently running driver bench on the single tunneled
#       chip and each read the other's latency as a hang;
#   (b) it iterated ITEMS in fixed order and `break`ed the whole pass on
#       the first failure — a hang-prone item at the queue head starved
#       every measurement behind it (only 1 of 17 items ever completed);
#   (c) `flock -w 600` expiring because ANOTHER holder was measuring was
#       misclassified as a window failure.
#
# Round-5 rules:
#   * The device lock is taken NON-BLOCKING before anything touches the
#     device (including the pregate).  Lock busy => someone else is
#     measuring; sleep and retry — never counted against the item.
#   * Round-robin pointer: each cycle attempts at most ONE item, and the
#     pointer advances past it regardless of outcome, so no item can
#     starve the rest.  Items are retried on later laps until done or
#     MAX_TRIES, when they are parked (.gaveup sentinel).
#   * Sentinels in $OUT survive restarts: <name>.done (verified result in
#     <name>.out), <name>.tries (attempt count), <name>.gaveup.
#   * Hard runtime cap (~6.5 h): the driver runs its own bench at round
#     end and must find the device lock free.
#
# Usage: nohup bash tools/opportunist_watch.sh > logs/oppwatch_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=logs/r5_measure
mkdir -p "$OUT"
LOCK=/tmp/tetraear_tpu_device.lock
MAX_TRIES=${OPPWATCH_MAX_TRIES:-10}
CAP_S=${OPPWATCH_CAP_S:-23400}

# name|timeout|command  (command's stdout -> $OUT/<name>.out)
# Priority order = decision value (VERDICT r4 next-round items 3-5):
# hbm1g decides the ROOFLINE HBM ceiling; the s2d16 scale sweep decides
# whether the 34.8 ms conv floor is fixed-cost or input-linear; pallas*
# decides the MXU-kernel bet; cand96/tail96 attribute the 96-ch tail gap.
ITEMS=(
  # ---- r5 phase 13: block-scale sweep on the NEW default chain (the
  # scale-8 optimum predates the Pallas conv; its smaller fixed-cost
  # fraction may move the optimum up), plus the leftover phase-12 A/B
  "bench_sc16|800|BENCH_SCALE=16 python bench.py --tier fused_pallas_bf16"
  "bench_sc8|700|python bench.py --tier fused_pallas_bf16"
  "bench_sc32|800|BENCH_SCALE=32 python bench.py --tier fused_pallas_bf16"
  "bench_pfb_sc16|900|BENCH_SCALE=16 python bench.py --tier pfb"
  "bench_pfb_pbf_ab3|900|python bench.py --tier pfb"
  "bench_pfb_pmono2|900|BENCH_PFB_VARIANT=pallas_mono python bench.py --tier pfb"
)
N=${#ITEMS[@]}

log() { echo "[$(date -u +%H:%M:%S)] $*"; }

pregate() {
  # runs UNDER the device lock (fd 9 held by caller)
  TETRAEAR_DEVLOCK_HELD=1 timeout 15 python - <<'EOF' 2>/dev/null | grep -q DIGEST
import numpy as np, jax, jax.numpy as jnp
x = jnp.asarray(np.arange(200000, dtype=np.float32))
print("DIGEST", float(np.asarray(jnp.sum(x + 1.0).astype(jnp.float32))))
EOF
}

idx=0
wedged=0
for attempt in $(seq 1 2000); do
  [ "$SECONDS" -gt "$CAP_S" ] && { log "runtime cap reached"; exit 0; }

  # pick the next pending item at/after the round-robin pointer
  pick=-1
  for off in $(seq 0 $((N - 1))); do
    i=$(( (idx + off) % N ))
    name="${ITEMS[$i]%%|*}"
    [ -e "$OUT/$name.done" ] && continue
    [ -e "$OUT/$name.gaveup" ] && continue
    pick=$i
    break
  done
  if [ "$pick" -lt 0 ]; then log "queue drained"; exit 0; fi
  # NOTE: the pointer advances only after an actual ATTEMPT (below) —
  # lock-busy and wedged-pregate cycles must not skip priority items

  item="${ITEMS[$pick]}"
  name="${item%%|*}"; rest="${item#*|}"
  tmo="${rest%%|*}"; cmd="${rest#*|}"

  # non-blocking device lock on fd 9; busy => another measurement owns
  # the chip (e.g. the driver bench) — NOT a window failure, no attempt
  # is charged, just back off
  exec 9>"$LOCK"
  if ! flock -n 9; then
    exec 9>&-
    log "device lock busy; backing off"
    sleep 60
    continue
  fi

  if ! pregate; then
    exec 9>&-
    wedged=$((wedged + 1))
    # every 5th wedged cycle, log at least; cheap 15 s probe + 30 s nap
    [ $((wedged % 5)) -eq 1 ] && log "pregate hung (wedged); napping"
    sleep 30
    continue
  fi
  wedged=0

  idx=$(( (pick + 1) % N ))          # attempt happening: advance pointer
  tries=$(cat "$OUT/$name.tries" 2>/dev/null || echo 0)
  tries=$((tries + 1)); echo "$tries" > "$OUT/$name.tries"
  log "attempt $name (try $tries/$MAX_TRIES)"
  if env TETRAEAR_DEVLOCK_HELD=1 timeout "$tmo" bash -c "$cmd" \
       > "$OUT/$name.out.tmp" 2> "$OUT/$name.err"; then
    # success requires a real ACCELERATOR result line, not just rc=0 —
    # bench_failed / _cpu_fallback lines must NOT park the item as done
    if grep -qE '"ok": true|ms_per_block|iq_samples_per_sec_per_chip' \
         "$OUT/$name.out.tmp" \
       && ! grep -qE 'cpu_fallback|bench_failed' "$OUT/$name.out.tmp"; then
      mv "$OUT/$name.out.tmp" "$OUT/$name.out"
      touch "$OUT/$name.done"
      log "DONE $name: $(tail -c 220 "$OUT/$name.out")"
      exec 9>&-
      continue
    fi
  fi
  exec 9>&-
  log "$name failed/hung: $(tail -c 150 "$OUT/$name.out.tmp" 2>/dev/null) $(tail -c 120 "$OUT/$name.err" 2>/dev/null | tr '\n' ' ')"
  if [ "$tries" -ge "$MAX_TRIES" ]; then
    touch "$OUT/$name.gaveup"
    log "PARKED $name after $tries tries"
  fi
  sleep 10
done
log "attempts exhausted"
