#!/bin/bash
# Round-5 v3 init-search probes: mode-clustering selection
# (track_cfg/init_search_tau, commit "Init-search v3") on the same
# checkpoints/protocol as the v1/v2 probe rows.
#   * sym (bottle): y-axis 2-sphere covering, K=64, 4 descent passes
#   * non-sym articulated (laptop): full SO(3) covering — needs K~384
#     for a ~20 deg covering radius (scorer diagnosis, EVIDENCE.md r5)
#
# Idempotent; relaunch-safe after a session restart:
#   nohup bash scripts/round5_probes3.sh > /tmp/r5_probes3.log 2>&1 &
#   echo $! > /tmp/r5_probes3.pid
set -u
cd "$(dirname "$0")/.."

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

run runs/q4_probes/gtless_n1_search_v3.log \
  python scripts/gtless_init_probe.py \
    --coord runs/q4_n1_r5/canon_coord/ckpt/model_0000 \
    --rot runs/q4_n1_r5/rot/ckpt/model_0000 \
    --category 1 --init_search 64 --init_search_steps 4 \
    --init_search_tau 10 \
    --out runs/q4_probes/gtless_n1_search_v3.json

run runs/q4_probes/gtless_laptop_search_v3.log \
  python scripts/gtless_init_probe.py \
    --coord runs/q4_laptop_r5/canon_coord/ckpt/model_0000 \
    --rot runs/q4_laptop_r5/rot/ckpt/model_0000 \
    --obj_config obj_info_sapien.yml --category laptop \
    --init_search 384 --init_search_steps 6 --init_search_tau 15 \
    --out runs/q4_probes/gtless_laptop_search_v3.json

echo "== round-5 v3 probes complete ($(date +%H:%M:%S))"
