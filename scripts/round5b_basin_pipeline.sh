#!/bin/bash
# Round-5b basin-head pipeline: the host wipe deleted all trained
# checkpoints, so (1) retrain the bottle nets with the q4 recipe, (2)
# fine-tune the basin-confidence head on the coord net, (3) re-run the
# GT-less init probe three ways on the SAME nets: no search (baseline
# envelope), v3 mode clustering (the rejected unsupervised scorer), and
# the new supervised basin scorer.  Laptop leg follows if the bottle leg
# finishes.
#
# Relaunch-safe: every stage skips when its artifact exists.
#   nohup bash scripts/round5b_basin_pipeline.sh > /tmp/r5b_basin.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

train () {  # train <tag> <obj_config> <category>
  local tag=$1 objc=$2 cat=$3
  local out=runs/r5b_$tag
  if [ -f "$out/canon_coord/ckpt/model_0000" ] && \
     [ -f "$out/rot/ckpt/model_0000" ]; then
    echo "== skip train $tag (checkpoints exist)"; return
  fi
  echo "== train $tag ($(date +%H:%M:%S))"
  mkdir -p "$out"
  python scripts/tpu_flagship_demo.py --steps 12000 --batch 12 \
    --device_aug --norm gn --dtype bfloat16 \
    --obj_config "$objc" --category "$cat" --out "$out" \
    > "$out/TRAIN.log" 2>&1 || echo "TRAIN FAILED: $tag"
}

basin () {  # basin <tag> <obj_config> <category> [steps]
  local tag=$1 objc=$2 cat=$3 steps=${4:-1500}
  local out=runs/r5b_${tag}_basin
  if [ -f "$out/ckpt/model_0000" ]; then
    echo "== skip basin $tag (checkpoint exists)"; return
  fi
  echo "== basin fine-tune $tag ($(date +%H:%M:%S))"
  mkdir -p "$out"
  python scripts/train_basin_head.py \
    --coord "runs/r5b_$tag/canon_coord/ckpt/model_0000" \
    --out "$out" --obj_config "$objc" --category "$cat" \
    --steps "$steps" --norm gn --dtype bfloat16 \
    > "$out/TRAIN.log" 2>&1 || echo "BASIN FAILED: $tag"
}

probe () {  # probe <name> <coord> <rot> <extra...>
  local name=$1 coord=$2 rot=$3; shift 3
  local log=runs/q4_probes/$name.log
  if [ -s "$log" ] && grep -q "theta=90" "$log"; then
    echo "== skip probe $name (done)"; return
  fi
  echo "== probe $name ($(date +%H:%M:%S))"
  mkdir -p runs/q4_probes
  python scripts/gtless_init_probe.py --coord "$coord" --rot "$rot" \
    --out "runs/q4_probes/$name.json" "$@" > "$log" 2>&1 \
    || echo "PROBE FAILED: $name"
}

# ---------------- bottle (sym, 1 part) ----------------
train n1 obj_info_nocs.yml 1
basin n1 obj_info_nocs.yml 1
C=runs/r5b_n1/canon_coord/ckpt/model_0000
R=runs/r5b_n1/rot/ckpt/model_0000
CB=runs/r5b_n1_basin/ckpt/model_0000
probe gtless_n1_r5b_base "$C" "$R" --category 1
probe gtless_n1_r5b_basin "$CB" "$R" --category 1 \
  --init_search 64 --init_search_steps 4 --init_search_scorer basin
echo "== bottle leg complete ($(date +%H:%M:%S))"

# ---------------- laptop (non-sym, 2 parts) ----------------
train laptop obj_info_sapien.yml laptop
basin laptop obj_info_sapien.yml laptop 2000
CL=runs/r5b_laptop/canon_coord/ckpt/model_0000
RL=runs/r5b_laptop/rot/ckpt/model_0000
CLB=runs/r5b_laptop_basin/ckpt/model_0000
probe gtless_laptop_r5b_base "$CL" "$RL" \
  --obj_config obj_info_sapien.yml --category laptop
probe gtless_laptop_r5b_basin "$CLB" "$RL" \
  --obj_config obj_info_sapien.yml --category laptop \
  --init_search 384 --init_search_steps 6 --init_search_scorer basin
echo "== basin pipeline complete ($(date +%H:%M:%S))"
