#!/bin/bash
# Round-5 TPU follow-ups behind the r15 sweep (scripts/round5_tpu_driver.sh):
# re-run the GT-less init envelope probes WITH the frame-0 orientation
# search (track_cfg/init_search, VERDICT r4 next 5) to measure how far the
# recovery envelope extends beyond the ~30 deg identity-init cliff.
#
# Idempotent; relaunch-safe after a session restart:
#   nohup bash scripts/round5_probes.sh > /tmp/r5_probes.log 2>&1 &
#   echo $! > /tmp/r5_probes.pid
set -u
cd "$(dirname "$0")/.."

DRIVER_LOG=${DRIVER_LOG:-/tmp/r5_tpu.log}
echo "== waiting for round-5 tpu driver ($(date +%H:%M:%S))"
stale=0
while ! grep -q "round-5 tpu driver complete" "$DRIVER_LOG" 2>/dev/null; do
  sig=$(stat -c '%s:%Y' "$DRIVER_LOG" 2>/dev/null || echo none)
  sleep 60
  sig2=$(stat -c '%s:%Y' "$DRIVER_LOG" 2>/dev/null || echo none)
  if [ "$sig" = "$sig2" ]; then
    stale=$((stale + 60))
    [ "$stale" -ge 2400 ] && { echo "== driver log stopped advancing; assuming dead"; break; }
  else
    stale=0
  fi
done
echo "== driver done, probes start ($(date +%H:%M:%S))"

run () {  # run <log> <cmd...>
  local log=$1; shift
  if [ -s "$log" ] && grep -q "PROBE DONE" "$log"; then
    echo "== skip $log (done)"; return
  fi
  echo "== run $log ($(date +%H:%M:%S))"
  { "$@" && echo "PROBE DONE"; } > "$log" 2>&1 \
    || echo "PROBE FAILED: $log"
}

mkdir -p runs/q4_probes

# init-search mitigation: same checkpoints/protocol as the round-4
# envelope probes, K=32 candidates, 2 descent passes
run runs/q4_probes/gtless_n1_search.log \
  python scripts/gtless_init_probe.py \
    --coord runs/q4_n1_r5/canon_coord/ckpt/model_0000 \
    --rot runs/q4_n1_r5/rot/ckpt/model_0000 \
    --category 1 --init_search 32 \
    --out runs/q4_probes/gtless_n1_search.json

run runs/q4_probes/gtless_laptop_search.log \
  python scripts/gtless_init_probe.py \
    --coord runs/q4_laptop_r5/canon_coord/ckpt/model_0000 \
    --rot runs/q4_laptop_r5/rot/ckpt/model_0000 \
    --obj_config obj_info_sapien.yml --category laptop \
    --init_search 32 \
    --out runs/q4_probes/gtless_laptop_search.json

echo "== round-5 probes complete ($(date +%H:%M:%S))"
