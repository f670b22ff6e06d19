#!/bin/bash
# Round-4 TPU-chip follow-ups that must wait for the quality sweep to
# release the chip: the GT-less frame-0 init envelope probe (VERDICT r3
# weak 5 / next 9) and the train-loop host-sync delta measurement
# (VERDICT r3 weak 3 / next 7).  Idempotent: completed probes are skipped,
# so this script can be relaunched after a session restart.
#
#   nohup bash scripts/post_sweep_probes.sh > /tmp/post_sweep.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

SWEEP_LOG=${SWEEP_LOG:-/tmp/q4_sweep_r2.log}
echo "== waiting for quality sweep to finish ($(date +%H:%M:%S))"
stale=0
while ! grep -q "quality sweep complete" "$SWEEP_LOG" 2>/dev/null; do
  # A dead sweep is one whose log stops advancing: watch the log's
  # size/mtime and give up only after 15 min without progress (a missing
  # log counts as never-advancing).  A sweep legitimately running longer
  # than any fixed cap keeps the chip as long as it keeps logging.
  sig=$(stat -c '%s:%Y' "$SWEEP_LOG" 2>/dev/null || echo none)
  sleep 60
  sig2=$(stat -c '%s:%Y' "$SWEEP_LOG" 2>/dev/null || echo none)
  if [ "$sig" = "$sig2" ]; then
    stale=$((stale + 60))
    [ "$stale" -ge 900 ] && { echo "== sweep log stopped advancing; assuming dead"; break; }
  else
    stale=0
  fi
done
echo "== sweep done, probes start ($(date +%H:%M:%S))"

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

# GT-less init envelope: sym rigid class (bottle) and the articulated
# laptop, both on the round-4 12k device-aug checkpoints.
run runs/q4_probes/gtless_n1.log \
  python scripts/gtless_init_probe.py \
    --coord runs/q4_n1_r5/canon_coord/ckpt/model_0000 \
    --rot runs/q4_n1_r5/rot/ckpt/model_0000 \
    --category 1 --out runs/q4_probes/gtless_n1.json

run runs/q4_probes/gtless_laptop.log \
  python scripts/gtless_init_probe.py \
    --coord runs/q4_laptop_r5/canon_coord/ckpt/model_0000 \
    --rot runs/q4_laptop_r5/rot/ckpt/model_0000 \
    --obj_config obj_info_sapien.yml --category laptop \
    --out runs/q4_probes/gtless_laptop.json

# Host-sync cost: per-step float() vs device-side accumulation, full-size
# jitted train step on the real chip.
run runs/q4_probes/train_sync.log \
  python scripts/bench_train_sync.py --steps 80 --batch 12

# EVIDENCE round-4 finding 4's open follow-up: does the wide-perturbation
# CoordNet transfer to the 3-part glasses layout like it did to laptop?
# (Train r15 coord, reuse the sweep's glasses_r5 RotNet, WIDE stacks.)
if [ ! -f runs/q4_glasses_r15/canon_coord/ckpt/model_0000 ]; then
  echo "== train glasses_r15 ($(date +%H:%M:%S))"
  mkdir -p runs/q4_glasses_r15
  python scripts/tpu_flagship_demo.py --steps 12000 --batch 12 \
    --device_aug --norm gn --dtype bfloat16 \
    --obj_config obj_info_sapien.yml --category glasses \
    --out runs/q4_glasses_r15 --coord_perturb_r 15 --rot_steps 1 \
    > runs/q4_glasses_r15/TRAIN.log 2>&1 || echo "TRAIN FAILED: glasses_r15"
fi
GW=runs/q4_glasses_r15/SWEEP_glasses_wide.log
if ! { [ -s "$GW" ] && grep -q "frozen-init" "$GW"; }; then
  echo "== eval glasses_wide ($(date +%H:%M:%S))"
  python scripts/eval_checkpoint_track.py \
    --coord runs/q4_glasses_r15/canon_coord/ckpt/model_0000 \
    --rot runs/q4_glasses_r5/rot/ckpt/model_0000 \
    --obj_config obj_info_sapien.yml --category glasses \
    --sweep 'npcs:1;npcs:2:forward;npcs:3:forward' \
    > "$GW" 2>&1 || echo "EVAL FAILED: glasses_wide"
fi

echo "== post-sweep probes complete ($(date +%H:%M:%S))"
