#!/bin/bash
# Waits for the in-flight solo full-suite run to finish and formats the
# GREEN proof artifact.  The run itself is `python -m pytest tests/ -q`
# redirected to /tmp/green_r05_full.log with a trailing EXIT=$? line.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/green_r05_full.log

while ! tail -1 "$LOG" 2>/dev/null | grep -q "^EXIT="; do sleep 30; done
ec=$(tail -1 "$LOG" | cut -d= -f2)
{
  echo "# Full-suite solo run, round 5 ($(date -u +%FT%TZ))"
  echo "# first run with BOTH round-5b fixes in place:"
  echo "#   - EH-frame no-op shim LD_PRELOAD re-exec (native/ehframe_shim.c,"
  echo "#     re-exec moved to pytest_configure so output survives capture)"
  echo "#   - serial XLA CPU codegen + executable pin (earlier fixes)"
  echo "# host otherwise idle (no trainer, no probes, no TPU jobs)"
  echo "# command: python -m pytest tests/ -q   (full log: /tmp/green_r05_full.log)"
  tail -25 "$LOG"
} > GREEN_r05.txt
echo "green watcher: wrote GREEN_r05.txt (EXIT=$ec)"
