#!/bin/bash
# Round-5 TPU queue, third revision: waits for the in-flight 3D TGV
# generation (pid /tmp/tgv3d_gen.pid), then runs the rebalanced tail.
# Changes vs r5_main2: RPF (regenerated on CPU with c0=15 after the NaN
# run) moves ahead of LDC; the trained long-horizon row and the
# crossover table run before LDC (higher VERDICT weight); LDC trains on
# a compressed 15k schedule; the 200k TGV-2D resume absorbs whatever
# remains before the 03:50 UTC cutoff.
set -u
cd /root/repo
log() { echo "[r5_main3] $* $(date -u +%H:%M:%S)"; }

GEN_PID=$(cat /tmp/tgv3d_gen.pid 2>/dev/null || echo "")
if [ -n "$GEN_PID" ]; then
  while kill -0 "$GEN_PID" 2>/dev/null; do sleep 30; done
fi
log "tgv3d gen done"

# 1. 3D TGV train + test infer
if [ -f datasets/TGV_3D_gen/metadata.json ]; then
  PYTHONFAULTHANDLER=1 timeout 10800 python -u main.py \
    config=configs/tgv_3d_gen/gns.yaml > logs/train_tgv3d_r5.log 2>&1
  log "tgv3d train rc=$?"
  CKP=$(ls -dt ckp/gns_TGV_3D_gen_* 2>/dev/null | head -1)
  [ -n "$CKP" ] && timeout 3600 python -u main.py \
    config=configs/tgv_3d_gen/gns.yaml mode=infer load_ckp="$CKP" \
    eval.test=True eval.n_rollout_steps=100 eval.infer.n_trajs=-1 \
    > logs/infer_tgv3d_test.log 2>&1
  log "tgv3d infer rc=$?"
else
  log "tgv3d dataset missing, skipping train"
fi

# 2. RPF train + test infer (dataset regenerating on CPU; wait for it,
# generate on TPU only if the CPU run died)
RPF_GEN_PID=$(cat /tmp/gen_rpf.pid 2>/dev/null || echo "")
if [ -n "$RPF_GEN_PID" ]; then
  while kill -0 "$RPF_GEN_PID" 2>/dev/null; do sleep 30; done
fi
if [ ! -f datasets/RPF_2D_gen/metadata.json ]; then
  log "rpf dataset missing after CPU gen; generating on TPU"
  rm -rf datasets/sims/2D_RPF datasets/RPF_2D_gen
  timeout 7200 python -u scripts/generate_sph_dataset.py --case rpf \
    --sim_dir datasets/sims/2D_RPF --dst_dir datasets/RPF_2D_gen \
    > logs/gen_rpf_tpu.log 2>&1
  log "rpf gen rc=$?"
fi
if [ -f datasets/RPF_2D_gen/metadata.json ]; then
  PYTHONFAULTHANDLER=1 timeout 10800 python -u main.py \
    config=configs/rpf_2d_gen/gns.yaml > logs/train_rpf_r5.log 2>&1
  log "rpf train rc=$?"
  CKP=$(ls -dt ckp/gns_RPF_2D_gen_* 2>/dev/null | head -1)
  [ -n "$CKP" ] && timeout 3600 python -u main.py \
    config=configs/rpf_2d_gen/gns.yaml mode=infer load_ckp="$CKP" \
    eval.test=True eval.n_rollout_steps=20 eval.infer.n_trajs=-1 \
    > logs/infer_rpf_test.log 2>&1
  log "rpf infer rc=$?"
fi

# 3. Trained long-horizon row (400 steps, trained 3D ckp, Pallas path)
TGV3D_CKP=$(ls -dt ckp/gns_TGV_3D_gen_* 2>/dev/null | head -1)
if [ -n "$TGV3D_CKP" ]; then
  LONG_CKP="$TGV3D_CKP" LONG_DATA=datasets/TGV_3D_gen \
    timeout 7200 python -u scripts/bench_long_horizon.py \
    > logs/bench_long_horizon_trained.log 2>&1
  log "long-horizon trained rc=$?"
fi

# 4. Streamed-kernel crossover table
timeout 7200 python -u scripts/bench_crossover.py > logs/bench_crossover_r5.log 2>&1
log "crossover rc=$?"

# 5. LDC: generate + compressed 15k train + test infer
if [ ! -f datasets/LDC_2D_gen/metadata.json ]; then
  rm -rf datasets/sims/2D_LDC datasets/LDC_2D_gen
  timeout 7200 python -u scripts/generate_sph_dataset.py --case ldc \
    --sim_dir datasets/sims/2D_LDC --dst_dir datasets/LDC_2D_gen \
    > logs/gen_ldc.log 2>&1
  log "ldc gen rc=$?"
fi
if [ -f datasets/LDC_2D_gen/metadata.json ]; then
  PYTHONFAULTHANDLER=1 timeout 7200 python -u main.py \
    config=configs/ldc_2d_gen/gns.yaml train.step_max=15000 \
    > logs/train_ldc_r5.log 2>&1
  log "ldc train rc=$?"
  CKP=$(ls -dt ckp/gns_LDC_2D_gen_* 2>/dev/null | head -1)
  [ -n "$CKP" ] && timeout 3600 python -u main.py \
    config=configs/ldc_2d_gen/gns.yaml mode=infer load_ckp="$CKP" \
    eval.test=True eval.n_rollout_steps=20 eval.infer.n_trajs=-1 \
    > logs/infer_ldc_test.log 2>&1
  log "ldc infer rc=$?"
fi

# 6. 200k-step TGV-2D resume until the cutoff
CUTOFF=$(date -u -d '2026-08-20 03:50' +%s)
NOW=$(date +%s)
T=$((CUTOFF - NOW))
if [ "$T" -gt 900 ]; then
  PYTHONFAULTHANDLER=1 timeout "$T" python -u main.py \
    config=configs/tgv_2d_gen/gns.yaml \
    load_ckp=ckp/gns_TGV_2500_gen_20260819-030936 train.step_max=200000 \
    > logs/train_tgv2d_200k.log 2>&1
  log "tgv2d 200k rc=$?"
fi
log "all done"
