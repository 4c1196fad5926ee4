#!/bin/bash
# Round-5 queue, sixth revision: train-and-infer stage of the 200k
# TGV-2D calibration (r5_main5.sh ran the dataset regeneration).  Split
# out so the training timeout can be computed when the stage actually
# starts: the run must release the TPU before the driver's round-end
# bench.py (a concurrent trainer would pollute the recorded headline),
# so train is budgeted to end by TRAIN_END_UTC and the per-5k-step eval
# table + best ckp make any cut point reportable.
set -u
cd /root/repo
log() { echo "[r5_main6] $* $(date -u +%H:%M:%S)"; }
TRAIN_END_UTC=${TRAIN_END_UTC:-"2026-08-20 12:45"}

if [ ! -f datasets/TGV_2500_gen/metadata.json ]; then
  log "dataset missing; run r5_main5.sh first"; exit 1
fi

END=$(date -u -d "$TRAIN_END_UTC" +%s)
T=$(( END - $(date +%s) ))
[ "$T" -gt 18000 ] && T=18000
[ "$T" -lt 1200 ] && T=1200
log "train budget ${T}s"
PYTHONFAULTHANDLER=1 timeout "$T" python -u main.py \
  config=configs/tgv_2d_gen/gns_200k.yaml \
  > logs/train_tgv2d_200k.log 2>&1
log "200k train rc=$?"

CKP=$(ls -dt ckp/gns_TGV_2500_gen_* 2>/dev/null | head -1)
if [ -n "$CKP" ]; then
  timeout 2400 python -u main.py \
    config=configs/tgv_2d_gen/gns_200k.yaml mode=infer load_ckp="$CKP" \
    eval.test=True eval.n_rollout_steps=100 eval.infer.n_trajs=-1 \
    > logs/infer_tgv2d_200k_test.log 2>&1
  log "test infer rc=$?"
fi
log "all done"
