#!/bin/bash
# Round-5 CPU queue (VERDICT r4 next 1 + 2 + 7), in strict order on this
# 1-CPU host:
#   1. wait for the in-flight bottle parity run (relaunch-resume if it died
#      before writing REPORT.json — the harness checkpoints every 100 steps)
#   2. one SOLO full-pytest run with the host otherwise idle, proof to
#      GREEN_r05.txt (tail + EXIT code); core dumps enabled so a segfault
#      finally yields a native frame
#   3. the laptop parity leg (torch reference + ours, same budgets); kept
#      on CPU so the TPU chip stays free for kernel work
#
# Idempotent; relaunch-safe after a session restart:
#   nohup bash scripts/round5_cpu_driver.sh > /tmp/r5_cpu.log 2>&1 &
#   echo $! > /tmp/r5_cpu.pid
set -u
cd "$(dirname "$0")/.."

BOTTLE=runs/ref_parity_bottle
LAPTOP=runs/ref_parity_laptop
BOTTLE_PID_FILE=/tmp/parity_bottle.pid

# --- 1. bottle report ------------------------------------------------------
while [ ! -f "$BOTTLE/REPORT.json" ]; do
  pid=$(cat "$BOTTLE_PID_FILE" 2>/dev/null || echo 0)
  if ! kill -0 "$pid" 2>/dev/null; then
    echo "== bottle parity not running; relaunch-resume ($(date +%H:%M:%S))"
    mkdir -p "$BOTTLE"
    JAX_PLATFORMS=cpu nohup python scripts/ref_train_parity.py \
      --steps 300 --rot_steps 150 --out "$BOTTLE" --category 1 \
      >> "$BOTTLE/DRIVER.log" 2>&1 &
    echo $! > "$BOTTLE_PID_FILE"
  fi
  sleep 60
done
echo "== bottle report present ($(date +%H:%M:%S))"

# --- 2. solo green pytest ---------------------------------------------------
# wait for the TPU probes to drain too (solo means SOLO: the round-4 crash
# has contention as a candidate cause; this run rules it in or out)
stale=0
while ! grep -q "round-5 probes complete" /tmp/r5_probes.log 2>/dev/null; do
  sig=$(stat -c '%s:%Y' /tmp/r5_probes.log 2>/dev/null || echo none)
  sleep 60
  sig2=$(stat -c '%s:%Y' /tmp/r5_probes.log 2>/dev/null || echo none)
  if [ "$sig" = "$sig2" ]; then
    stale=$((stale + 60))
    [ "$stale" -ge 1800 ] && { echo "== probe log stalled; proceeding"; break; }
  else
    stale=0
  fi
done

if [ -f GREEN_r05.txt ] && grep -q "^EXIT=0" GREEN_r05.txt; then
  echo "== skip solo pytest (GREEN_r05.txt already green)"
else
  echo "== solo pytest start ($(date +%H:%M:%S))"
  ulimit -c unlimited
  python -m pytest tests/ -q > /tmp/green_r05_full.log 2>&1
  ec=$?
  {
    echo "# Full-suite solo run, round 5 ($(date -u +%FT%TZ))"
    echo "# host otherwise idle (bottle parity finished, probes drained)"
    echo "# command: python -m pytest tests/ -q   (full log: /tmp/green_r05_full.log)"
    tail -25 /tmp/green_r05_full.log
    echo "EXIT=$ec"
  } > GREEN_r05.txt
  echo "== solo pytest EXIT=$ec ($(date +%H:%M:%S))"
fi

# --- 3. laptop parity leg ----------------------------------------------------
if [ -f "$LAPTOP/REPORT.json" ]; then
  echo "== skip laptop parity (report exists)"
else
  echo "== laptop parity start ($(date +%H:%M:%S))"
  mkdir -p "$LAPTOP"
  JAX_PLATFORMS=cpu python scripts/ref_train_parity.py \
    --steps 300 --rot_steps 150 --out "$LAPTOP" \
    --obj_config obj_info_sapien.yml --category laptop \
    >> "$LAPTOP/DRIVER.log" 2>&1 \
    || echo "PARITY FAILED: $LAPTOP (see $LAPTOP/DRIVER.log)"
fi
echo "== round-5 cpu driver complete ($(date +%H:%M:%S))"
