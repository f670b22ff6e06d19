#!/bin/bash
# Round-4 two-stack trained-quality parity runs (VERDICT r3 missing 1 /
# next 1): bottle (sym rigid) then laptop (articulated), same recipe, same
# synthetic data, torch reference vs this stack, identical eval scans.
#
# 300 coord / 150 rot steps per net is what the 1-CPU host affords
# in-session (torch ~10 s/step here; RotationNet's loss converges by step
# ~50 on this recipe, see runs logs); the harness checkpoints every 100
# steps, so re-running this script resumes rather than restarts.  Both
# stacks always get identical budgets — the comparison, not the absolute
# scale, is the measurement.
set -u
cd "$(dirname "$0")/.."

run () {  # run <out> [args...]
  local out=$1; shift
  if [ -f "$out/REPORT.json" ]; then echo "== skip $out (report exists)"; return; fi
  mkdir -p "$out"
  echo "== parity $out ($(date +%H:%M:%S))"
  JAX_PLATFORMS=cpu python scripts/ref_train_parity.py \
    --steps 300 --rot_steps 150 --out "$out" "$@" >> "$out/DRIVER.log" 2>&1 \
    || echo "PARITY FAILED: $out (see $out/DRIVER.log)"
}

run runs/ref_parity_bottle --category 1
run runs/ref_parity_laptop --obj_config obj_info_sapien.yml --category laptop
echo "== parity driver complete ($(date +%H:%M:%S))"
