#!/bin/bash
# Round-5 TPU queue (VERDICT r4 next 3): the r=15 wide-perturbation
# CoordNet rows that never ran in round 4 (glasses / scissors / drawers),
# plus the scissors seed study that decides whether the npcs:3 > npcs:1
# contradiction (SWEEP_scissors_base.log: 10.40 vs 10.70) is signal or
# eval-draw noise.
#
# Idempotent: finished trainings/evals are skipped; safe to relaunch after
# a session restart.  Runs on the TPU chip; the CPU stays free for the
# two-stack parity trainer (scripts/parity_driver.sh).
#
#   nohup bash scripts/round5_tpu_driver.sh > /tmp/r5_tpu.log 2>&1 &
#   echo $! > /tmp/r5_tpu.pid
set -u
cd "$(dirname "$0")/.."

SAP=obj_info_sapien.yml
WIDE='npcs:1;npcs:2:forward;npcs:3:forward'
BASE='delta:1;npcs:1;npcs:3:forward'

train_r15 () {  # train_r15 <cat>
  local cat=$1 out=runs/q4_${1}_r15
  if [ -f "$out/canon_coord/ckpt/model_0000" ]; then
    echo "== skip train ${cat}_r15 (checkpoint exists)"; return
  fi
  # preserve nothing here: r15 runs only ever write the coord net
  rm -rf "$out/canon_coord"
  echo "== train ${cat}_r15 ($(date +%H:%M:%S))"
  mkdir -p "$out"
  python scripts/tpu_flagship_demo.py --steps 12000 --batch 12 \
    --device_aug --norm gn --dtype bfloat16 \
    --obj_config $SAP --category "$cat" --out "$out" \
    --coord_perturb_r 15 --rot_steps 1 \
    > "$out/TRAIN.log" 2>&1 || echo "TRAIN FAILED: ${cat}_r15"
}

eval_wide () {  # eval_wide <cat>
  local cat=$1 log=runs/q4_${1}_r15/SWEEP_${1}_wide.log
  if [ -s "$log" ] && grep -q "frozen-init" "$log"; then
    echo "== skip eval ${cat}_wide (done)"; return
  fi
  echo "== eval ${cat}_wide ($(date +%H:%M:%S))"
  python scripts/eval_checkpoint_track.py \
    --coord "runs/q4_${cat}_r15/canon_coord/ckpt/model_0000" \
    --rot "runs/q4_${cat}_r5/rot/ckpt/model_0000" \
    --obj_config $SAP --category "$cat" --sweep "$WIDE" \
    > "$log" 2>&1 || echo "EVAL FAILED: ${cat}_wide"
}

for cat in glasses scissors drawers; do
  train_r15 "$cat"
  eval_wide "$cat"
done

# Scissors stack-ranking noise study: same r5 checkpoints, 3 fresh eval
# draws.  If npcs:3:forward beats npcs:1 consistently, the quality preset's
# num_parts==1 refinement fence needs a per-class carve-out; if the sign
# flips across draws, the round-4 delta (0.3 deg) is noise.
for seed in 2000 3000 4000; do
  log=runs/q4_scissors_r5/SWEEP_scissors_seed${seed}.log
  if [ -s "$log" ] && grep -q "frozen-init" "$log"; then
    echo "== skip scissors seed $seed (done)"; continue
  fi
  echo "== eval scissors seed $seed ($(date +%H:%M:%S))"
  python scripts/eval_checkpoint_track.py \
    --coord runs/q4_scissors_r5/canon_coord/ckpt/model_0000 \
    --rot runs/q4_scissors_r5/rot/ckpt/model_0000 \
    --obj_config $SAP --category scissors --sweep "$BASE" \
    --eval_seed_base "$seed" \
    > "$log" 2>&1 || echo "EVAL FAILED: scissors seed $seed"
done

echo "== round-5 tpu driver complete ($(date +%H:%M:%S))"
