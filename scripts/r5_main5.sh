#!/bin/bash
# Round-5 queue, fifth revision.  Every item in VERDICT r4's "next round"
# list has landed except item 4 (long-schedule accuracy calibration);
# the reboot wiped the round-4 TGV-2D dataset and checkpoint the earlier
# queue revisions planned to resume, so this revision regenerates the
# dataset and runs ONE continuous 200k-step schedule from scratch
# (configs/tgv_2d_gen/gns_200k.yaml — the 50k config stretched 4x).
# Eval fires every 5k steps, so the MSE-vs-steps table exists at
# whatever step the clock kills the run; the best ckp (saved per eval)
# feeds the closing test infer.
set -u
cd /root/repo
log() { echo "[r5_main5] $* $(date -u +%H:%M:%S)"; }

if [ ! -f datasets/TGV_2500_gen/metadata.json ]; then
  rm -rf datasets/sims/2D_TGV_r5 datasets/TGV_2500_gen
  timeout 3600 python -u scripts/generate_sph_dataset.py --case tgv2d \
    --sim_dir datasets/sims/2D_TGV_r5 --dst_dir datasets/TGV_2500_gen \
    > logs/gen_tgv2d_r5.log 2>&1
  log "tgv2d gen rc=$?"
fi

if [ -f datasets/TGV_2500_gen/metadata.json ]; then
  PYTHONFAULTHANDLER=1 timeout 18000 python -u main.py \
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
fi
log "all done"
