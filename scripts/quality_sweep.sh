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

# --- tracking-stack sweeps ------------------------------------------------
BASE='delta:1;npcs:1;npcs:3:forward'
WIDE='npcs:1;npcs:2:forward;npcs:3:forward'

# Interleaved per category (train -> eval immediately) so a time-bounded run
# leaves complete per-category rows rather than checkpoints with no sweeps.
# r=15 CoordNets reuse the r5 RotNet (RotationNet recipe unchanged;
# --rot_steps 1 keeps the rot training loop a no-op).

category () {  # category <tag> <obj_config> <category> <wide:0|1>
  local tag=$1 objc=$2 cat=$3 wide=$4
  train "${tag}_r5" "$objc" "$cat"
  evalsweep "${tag}_base" "$objc" "$cat" "${tag}_r5" "${tag}_r5" "$BASE"
  if [ "$wide" = 1 ]; then
    train "${tag}_r15" "$objc" "$cat" --coord_perturb_r 15 --rot_steps 1
    evalsweep "${tag}_wide" "$objc" "$cat" "${tag}_r15" "${tag}_r5" "$WIDE"
  fi
}

# Order: novel measurements first. Round 3 already recorded delta-vs-npcs at
# this exact 12k budget for bottle and all four SAPIEN categories
# (EVIDENCE.md round-3 tables), so the new information is: the other sym
# categories (bowl=2, can=4) incl. the r=15 wide lever, the non-sym NOCS
# rigids (camera=3, laptop=5, mug=6), the laptop r=15 wide probe, and only
# then the SAPIEN re-runs.
category n1       $NOCS 1        1
category n2       $NOCS 2        1
category n4       $NOCS 4        1
category n3       $NOCS 3        1
category n5       $NOCS 5        0
category n6       $NOCS 6        0
category laptop   $SAP  laptop   1
category glasses  $SAP  glasses  0
category scissors $SAP  scissors 0
category drawers  $SAP  drawers  0

echo "== quality sweep complete ($(date +%H:%M:%S))"
