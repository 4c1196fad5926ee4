#!/bin/bash
# TPU job launcher with retry: the axon PJRT registration is flaky (the
# backend occasionally fails to register or registers under a different
# platform name); a fresh process usually succeeds. Usage:
#   scripts/run_tpu.sh <logfile> <python args...>
LOG=$1; shift
for i in 1 2 3 4 5; do
  PYTHONPATH=/root/repo python "$@" > "$LOG" 2>&1
  rc=$?
  if ! grep -q "Unable to initialize backend" "$LOG"; then
    exit $rc
  fi
  echo "[run_tpu] attempt $i hit backend-init flake; retrying" >> "$LOG.attempts"
  sleep 5
done
exit 1
