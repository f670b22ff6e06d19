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
  # A run is complete only when every net it trains has a checkpoint:
  # --rot_steps 1 runs (r=15 CoordNets) never write a usable rot ckpt, so
  # they are judged by the coord ckpt alone; full runs need both, else an
  # interrupted training (coord done, rot killed mid-run) would be skipped
  # forever and the eval sweep would fail on the missing rot checkpoint.
  local need_rot=1
  case " $* " in *" --rot_steps 1 "*) need_rot=0;; esac
  if [ -f "$out/canon_coord/ckpt/model_0000" ] && \
     { [ "$need_rot" = 0 ] || [ -f "$out/rot/ckpt/model_0000" ]; }; then
    echo "== skip train $tag (checkpoint exists)"; return
  fi
  # Preserve a completed coord net: when only the rot ckpt is missing
  # (interrupted mid-rot), retrain just the rot leg instead of discarding
  # 12k coord steps.  NOTE: any already-written wide-sweep log that paired
  # an r15 coord with this run's old rot ckpt stays valid because the coord
  # net is untouched; only a full coord retrain (coord ckpt absent) would
  # stale them, and then we say so.
  local extra=()
  if [ -f "$out/canon_coord/ckpt/model_0000" ]; then
    echo "== $tag: coord ckpt present, retraining rot leg only"
    extra=(--skip_coord)
  else
    [ -d "$out/canon_coord" ] || [ -d "$out/rot" ] && \
      echo "== $tag: no complete coord ckpt; full retrain (any wide-sweep logs pairing this run's rot net are now stale)"
    rm -rf "$out/canon_coord"
  fi
  rm -rf "$out/rot"
  echo "== train $tag ($(date +%H:%M:%S))"
  mkdir -p "$out"
  python scripts/tpu_flagship_demo.py --steps 12000 --batch 12 \
    --device_aug --norm gn --dtype bfloat16 \
    --obj_config "$objc" --category "$cat" --out "$out" \
    ${extra[@]+"${extra[@]}"} "$@" \
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

# The synthetic generator (data/synthetic.py) conditions only on
# (num_parts, tree, sym, num_joints, joint_type, main_axis), so the 10 real
# categories collapse to 6 DISTINCT experiments here: bottle=bowl=can
# (sym rigid, 1 part), camera=laptop=mug (non-sym rigid, 1 part), and the
# four SAPIEN kinematic layouts.  Verified empirically: the bowl (n2) run
# reproduced bottle's numbers bit-for-bit (runs/q4_n2_r5 vs runs/q4_n1_r5).
# Sweeping the duplicates would re-measure the same bytes, so each
# equivalence class runs once; per-category presets map through the class.
category n1       $NOCS 1        1   # sym rigid class: bottle, bowl, can
category n3       $NOCS 3        1   # non-sym rigid class: camera, laptop, mug
category laptop   $SAP  laptop   1
category glasses  $SAP  glasses  0
category scissors $SAP  scissors 0
category drawers  $SAP  drawers  0

echo "== quality sweep complete ($(date +%H:%M:%S))"
