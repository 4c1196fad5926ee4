#!/bin/bash
# Round-5 TPU queue, fourth revision: the machine was rebooted between
# sessions, wiping the gitignored datasets/ and ckp/ dirs, so the
# earlier queue's assumptions (CPU-side RPF regen in flight, round-4
# TGV-2D ckp available for the 200k resume) no longer hold.  This
# revision is time-aware: every stage checks remaining wall clock
# against a hard cutoff and trims or skips itself, so whatever the
# driver's actual cutoff is we always end with committed artifacts.
#
# Order (highest VERDICT weight first):
#   1. 3D TGV train (time-boxed; best-ckp saved every eval) + test infer
#   2. Trained 400-step long-horizon row on the Pallas path
#   3. Streamed-kernel crossover rows (64k/100k/150k)
#   4. RPF gen (TPU) + time-boxed train + test infer
#   5. LDC chain only if time somehow remains
set -u
cd /root/repo
CUTOFF=$(date -u -d '2026-08-20 05:40' +%s)
left() { echo $(( CUTOFF - $(date +%s) )); }
log() { echo "[r5_main4] $* $(date -u +%H:%M:%S) left=$(left)s"; }

# 0. wait for the in-flight 3D TGV generation
GEN_PID=$(cat /tmp/tgv3d_gen.pid 2>/dev/null || echo "")
if [ -n "$GEN_PID" ]; then
  while kill -0 "$GEN_PID" 2>/dev/null; do sleep 20; done
fi
log "tgv3d gen done"

# 1. 3D TGV train + test infer.  step_max stays at the preset 25k; the
# timeout is the budget and the best ckp (saved at each eval) is what
# the infer consumes, so an early kill still yields a table row.
if [ -f datasets/TGV_3D_gen/metadata.json ] && [ "$(left)" -gt 2400 ]; then
  T=$(( $(left) - 3000 )); [ "$T" -gt 5400 ] && T=5400; [ "$T" -lt 1200 ] && T=1200
  PYTHONFAULTHANDLER=1 timeout "$T" python -u main.py \
    config=configs/tgv_3d_gen/gns.yaml logging.eval_steps=2500 \
    > logs/train_tgv3d_r5.log 2>&1
  log "tgv3d train rc=$?"
  CKP=$(ls -dt ckp/gns_TGV_3D_gen_* 2>/dev/null | head -1)
  if [ -n "$CKP" ] && [ "$(left)" -gt 600 ]; then
    timeout 1800 python -u main.py \
      config=configs/tgv_3d_gen/gns.yaml mode=infer load_ckp="$CKP" \
      eval.test=True eval.n_rollout_steps=100 eval.infer.n_trajs=-1 \
      > logs/infer_tgv3d_test.log 2>&1
    log "tgv3d infer rc=$?"
  fi
else
  log "tgv3d dataset missing or no time, skipping train"
fi

# 2. Trained long-horizon row (400 steps, trained 3D ckp, Pallas path)
TGV3D_CKP=$(ls -dt ckp/gns_TGV_3D_gen_* 2>/dev/null | head -1)
if [ -n "$TGV3D_CKP" ] && [ "$(left)" -gt 600 ]; then
  LONG_CKP="$TGV3D_CKP" LONG_DATA=datasets/TGV_3D_gen \
    timeout 1500 python -u scripts/bench_long_horizon.py \
    > logs/bench_long_horizon_trained.log 2>&1
  log "long-horizon trained rc=$?"
fi

# 3. Streamed-kernel crossover rows
if [ "$(left)" -gt 900 ]; then
  CROSSOVER_PATHS=pallas,celllist timeout 2400 \
    python -u scripts/bench_crossover.py 64000 100000 150000 \
    > logs/bench_crossover_r5.log 2>&1
  log "crossover rc=$?"
fi

# 4. RPF: generate on TPU (fast), time-boxed train, test infer
if [ ! -f datasets/RPF_2D_gen/metadata.json ] && [ "$(left)" -gt 1500 ]; then
  rm -rf datasets/sims/2D_RPF datasets/RPF_2D_gen
  timeout 2400 python -u scripts/generate_sph_dataset.py --case rpf \
    --sim_dir datasets/sims/2D_RPF --dst_dir datasets/RPF_2D_gen \
    > logs/gen_rpf_tpu.log 2>&1
  log "rpf gen rc=$?"
fi
if [ -f datasets/RPF_2D_gen/metadata.json ] && [ "$(left)" -gt 1200 ]; then
  T=$(( $(left) - 900 )); [ "$T" -gt 5400 ] && T=5400; [ "$T" -lt 600 ] && T=600
  PYTHONFAULTHANDLER=1 timeout "$T" python -u main.py \
    config=configs/rpf_2d_gen/gns.yaml logging.eval_steps=2500 \
    > logs/train_rpf_r5.log 2>&1
  log "rpf train rc=$?"
  CKP=$(ls -dt ckp/gns_RPF_2D_gen_* 2>/dev/null | head -1)
  if [ -n "$CKP" ] && [ "$(left)" -gt 300 ]; then
    timeout 900 python -u main.py \
      config=configs/rpf_2d_gen/gns.yaml mode=infer load_ckp="$CKP" \
      eval.test=True eval.n_rollout_steps=20 eval.infer.n_trajs=-1 \
      > logs/infer_rpf_test.log 2>&1
    log "rpf infer rc=$?"
  fi
fi

# 5. LDC chain only if time remains
if [ ! -f datasets/LDC_2D_gen/metadata.json ] && [ "$(left)" -gt 3600 ]; then
  rm -rf datasets/sims/2D_LDC datasets/LDC_2D_gen
  timeout 2400 python -u scripts/generate_sph_dataset.py --case ldc \
    --sim_dir datasets/sims/2D_LDC --dst_dir datasets/LDC_2D_gen \
    > logs/gen_ldc.log 2>&1
  log "ldc gen rc=$?"
fi
if [ -f datasets/LDC_2D_gen/metadata.json ] && [ "$(left)" -gt 1800 ]; then
  T=$(( $(left) - 600 ))
  PYTHONFAULTHANDLER=1 timeout "$T" python -u main.py \
    config=configs/ldc_2d_gen/gns.yaml train.step_max=15000 \
    logging.eval_steps=2500 > logs/train_ldc_r5.log 2>&1
  log "ldc train rc=$?"
fi
log "all done"
