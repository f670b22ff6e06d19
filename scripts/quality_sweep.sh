#!/bin/bash
# Round-4 quality-profile sweep (VERDICT r3 items 3 + 5): train 12k-step
# device-aug checkpoints for ALL 10 categories (r=5 reference perturbation,
# plus r=15 CoordNets where the wide-perturbation lever applies) and
# evaluate the tracking stacks {delta, npcs, npcs+refine-forward} on each.
# Results feed the track_cfg/quality_profile preset (config/loader.py)
# and the EVIDENCE.md round-4 tables.
#
# Run from the repo root (or anywhere): bash scripts/quality_sweep.sh
# Idempotent: finished trainings are skipped, finished sweeps are skipped.
set -u
cd "$(dirname "$0")/.."

train () {  # train <tag> <obj_config> <category> [extra flags...]
  local tag=$1 objc=$2 cat=$3; shift 3
  local out=runs/q4_$tag
  if [ -f "$out/canon_coord/ckpt/model_0000" ]; then
    echo "== skip train $tag (checkpoint exists)"; return
  fi
  echo "== train $tag ($(date +%H:%M:%S))"
  mkdir -p "$out"
  python scripts/tpu_flagship_demo.py --steps 12000 --batch 12 \
    --device_aug --norm gn --dtype bfloat16 \
    --obj_config "$objc" --category "$cat" --out "$out" "$@" \
    > "$out/TRAIN.log" 2>&1 || echo "TRAIN FAILED: $tag (see $out/TRAIN.log)"
}

evalsweep () {  # evalsweep <name> <obj_config> <category> <coord_tag> <rot_tag> <sweep>
  local name=$1 objc=$2 cat=$3 coord=$4 rot=$5 sweep=$6
  local log=runs/q4_$coord/SWEEP_$name.log
  if [ -s "$log" ] && grep -q "frozen-init" "$log"; then
    echo "== skip eval $name (done)"; return
  fi
  echo "== eval $name ($(date +%H:%M:%S))"
  python scripts/eval_checkpoint_track.py \
    --coord "runs/q4_$coord/canon_coord/ckpt/model_0000" \
    --rot "runs/q4_$rot/rot/ckpt/model_0000" \
    --obj_config "$objc" --category "$cat" --sweep "$sweep" \
    > "$log" 2>&1 || echo "EVAL FAILED: $name (see $log)"
}

NOCS=obj_info_nocs.yml
SAP=obj_info_sapien.yml

# --- r=5 (reference perturbation) checkpoints, all 10 categories ---------
train n1_r5 $NOCS 1
train n2_r5 $NOCS 2
train n3_r5 $NOCS 3
train n4_r5 $NOCS 4
train n5_r5 $NOCS 5
train n6_r5 $NOCS 6
train laptop_r5   $SAP laptop
train glasses_r5  $SAP glasses
train scissors_r5 $SAP scissors
train drawers_r5  $SAP drawers

# --- r=15 CoordNets (RotationNet recipe unchanged -> reuse the r5 RotNet;
#     --rot_steps 1 keeps the rot training loop a no-op) ------------------
train n1_r15 $NOCS 1 --coord_perturb_r 15 --rot_steps 1
train n2_r15 $NOCS 2 --coord_perturb_r 15 --rot_steps 1
train n4_r15 $NOCS 4 --coord_perturb_r 15 --rot_steps 1
train n3_r15 $NOCS 3 --coord_perturb_r 15 --rot_steps 1
train laptop_r15 $SAP laptop --coord_perturb_r 15 --rot_steps 1

# --- tracking-stack sweeps ------------------------------------------------
BASE='delta:1;npcs:1;npcs:3:forward'
WIDE='npcs:1;npcs:2:forward;npcs:3:forward'

evalsweep n1_base $NOCS 1 n1_r5 n1_r5 "$BASE"
evalsweep n2_base $NOCS 2 n2_r5 n2_r5 "$BASE"
evalsweep n3_base $NOCS 3 n3_r5 n3_r5 "$BASE"
evalsweep n4_base $NOCS 4 n4_r5 n4_r5 "$BASE"
evalsweep n5_base $NOCS 5 n5_r5 n5_r5 "$BASE"
evalsweep n6_base $NOCS 6 n6_r5 n6_r5 "$BASE"
evalsweep laptop_base   $SAP laptop   laptop_r5   laptop_r5   "$BASE"
evalsweep glasses_base  $SAP glasses  glasses_r5  glasses_r5  "$BASE"
evalsweep scissors_base $SAP scissors scissors_r5 scissors_r5 "$BASE"
evalsweep drawers_base  $SAP drawers  drawers_r5  drawers_r5  "$BASE"

evalsweep n1_wide $NOCS 1 n1_r15 n1_r5 "$WIDE"
evalsweep n2_wide $NOCS 2 n2_r15 n2_r5 "$WIDE"
evalsweep n4_wide $NOCS 4 n4_r15 n4_r5 "$WIDE"
evalsweep n3_wide $NOCS 3 n3_r15 n3_r5 "$WIDE"
evalsweep laptop_wide $SAP laptop laptop_r15 laptop_r5 "$WIDE"

echo "== quality sweep complete ($(date +%H:%M:%S))"
