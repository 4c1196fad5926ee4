#!/bin/bash
# Round-5 TPU queue, continuation: picks up after the in-flight RPF
# training (r5_main.sh stage 6, pid /tmp/rpf_train.pid). The first
# r5_main pass lost its 3D TGV generation to a pallas scoped-VMEM
# compile OOM (now fixed: runtime celllist fallback + pinned backend
# for the generator), so the 3D chain is re-ordered here ahead of the
# LDC chain and the benches.
set -u
cd /root/repo
log() { echo "[r5_main2] $* $(date -u +%H:%M:%S)"; }

RPF_PID=$(cat /tmp/rpf_train.pid 2>/dev/null || echo "")
if [ -n "$RPF_PID" ]; then
  while kill -0 "$RPF_PID" 2>/dev/null; do sleep 20; done
fi
log "rpf train done"

CKP=$(ls -dt ckp/gns_RPF_2D_gen_* 2>/dev/null | head -1)
[ -n "$CKP" ] && timeout 3600 python -u main.py \
  config=configs/rpf_2d_gen/gns.yaml mode=infer load_ckp="$CKP" \
  eval.test=True eval.n_rollout_steps=20 eval.infer.n_trajs=-1 \
  > logs/infer_rpf_test.log 2>&1
log "rpf infer rc=$?"

# 3D TGV chain (celllist-pinned generator, Verlet skin)
if [ ! -f datasets/TGV_3D_gen/metadata.json ]; then
  rm -rf datasets/sims/3D_TGV datasets/TGV_3D_gen
  timeout 10800 python -u scripts/generate_sph_dataset.py --case tgv3d \
    --sim_dir datasets/sims/3D_TGV --dst_dir datasets/TGV_3D_gen \
    > logs/gen_tgv3d.log 2>&1
  log "tgv3d gen rc=$?"
fi
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
fi

# LDC chain
if [ ! -f datasets/LDC_2D_gen/metadata.json ]; then
  rm -rf datasets/sims/2D_LDC datasets/LDC_2D_gen
  timeout 7200 python -u scripts/generate_sph_dataset.py --case ldc \
    --sim_dir datasets/sims/2D_LDC --dst_dir datasets/LDC_2D_gen \
    > logs/gen_ldc.log 2>&1
  log "ldc gen rc=$?"
fi
if [ -f datasets/LDC_2D_gen/metadata.json ]; then
  PYTHONFAULTHANDLER=1 timeout 10800 python -u main.py \
    config=configs/ldc_2d_gen/gns.yaml > logs/train_ldc_r5.log 2>&1
  log "ldc train rc=$?"
  CKP=$(ls -dt ckp/gns_LDC_2D_gen_* 2>/dev/null | head -1)
  [ -n "$CKP" ] && timeout 3600 python -u main.py \
    config=configs/ldc_2d_gen/gns.yaml mode=infer load_ckp="$CKP" \
    eval.test=True eval.n_rollout_steps=20 eval.infer.n_trajs=-1 \
    > logs/infer_ldc_test.log 2>&1
  log "ldc infer rc=$?"
fi

# Trained long-horizon row (400 steps, Pallas path, trained 3D ckp)
TGV3D_CKP=$(ls -dt ckp/gns_TGV_3D_gen_* 2>/dev/null | head -1)
if [ -n "$TGV3D_CKP" ]; then
  LONG_CKP="$TGV3D_CKP" LONG_DATA=datasets/TGV_3D_gen \
    timeout 7200 python -u scripts/bench_long_horizon.py \
    > logs/bench_long_horizon_trained.log 2>&1
  log "long-horizon trained rc=$?"
fi

# Streamed-kernel crossover table
timeout 7200 python -u scripts/bench_crossover.py > logs/bench_crossover_r5.log 2>&1
log "crossover rc=$?"

# 200k-step TGV-2D resume until the cutoff
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
