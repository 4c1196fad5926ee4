#!/bin/bash
# TPU job launcher with retry: the axon PJRT registration is flaky (the
# backend occasionally fails to register or registers under a different
# platform name); a fresh process usually succeeds. Usage:
#   scripts/run_tpu.sh <logfile> <python args...>
LOG=$1; shift
for i in $(seq 1 12); do
  PYTHONPATH=/root/repo:${PYTHONPATH:-} python "$@" > "$LOG" 2>&1
  rc=$?
  if ! grep -q "Unable to initialize backend" "$LOG"; then
    exit $rc
  fi
  echo "[run_tpu] attempt $i hit backend-init flake; retrying" >> "$LOG.attempts"
  sleep 20
done
exit 1
