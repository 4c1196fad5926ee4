#!/bin/bash
# Round-5 consolidated TPU job queue (replaces r5_queue{1,2,3}.sh, which
# raced each other's pid files). ONE chip -> strictly serial. Ordered by
# judge value per VERDICT r4: DAM test infer (walls, item 1) -> 3D TGV
# gen+train+infer (item 2) -> RPF gen+train+infer (item 7) -> LDC
# gen+train+infer (item 1) -> trained long-horizon row (item 2) ->
# streamed crossover (item 3) -> 200k TGV-2D resume (item 4, absorbs the
# remaining wall clock up to the cutoff time).
set -u
cd /root/repo
log() { echo "[r5_main] $* $(date -u +%H:%M:%S)"; }

# 1. DAM test-split inference (training finished 21:31, logs/train_dam_r5.log)
if [ ! -s logs/infer_dam_test.log ] || ! grep -q "val/" logs/infer_dam_test.log; then
  DAM_CKP=$(ls -dt ckp/gns_DAM_2D_gen_* 2>/dev/null | head -1)
  timeout 3600 python -u main.py config=configs/dam_2d_gen/gns.yaml mode=infer \
    load_ckp="$DAM_CKP" eval.test=True eval.n_rollout_steps=100 \
    eval.infer.n_trajs=-1 > logs/infer_dam_test.log 2>&1
  log "dam infer rc=$?"
fi

# 2. 3D TGV dataset (trimmed ensemble + Verlet skin; ~75 min)
if [ ! -f datasets/TGV_3D_gen/metadata.json ]; then
  rm -rf datasets/sims/3D_TGV datasets/TGV_3D_gen
  timeout 10800 python -u scripts/generate_sph_dataset.py --case tgv3d \
    --sim_dir datasets/sims/3D_TGV --dst_dir datasets/TGV_3D_gen \
    > logs/gen_tgv3d.log 2>&1
  log "tgv3d gen rc=$?"
fi

# 3. 3D TGV GNS training
if [ -f datasets/TGV_3D_gen/metadata.json ]; then
  PYTHONFAULTHANDLER=1 timeout 10800 python -u main.py \
    config=configs/tgv_3d_gen/gns.yaml > logs/train_tgv3d_r5.log 2>&1
  log "tgv3d train rc=$?"
  # 4. 3D TGV test infer (100-step rollouts; the two long test
  # trajectories also serve the long-horizon bench below)
  CKP=$(ls -dt ckp/gns_TGV_3D_gen_* 2>/dev/null | head -1)
  [ -n "$CKP" ] && timeout 3600 python -u main.py \
    config=configs/tgv_3d_gen/gns.yaml mode=infer load_ckp="$CKP" \
    eval.test=True eval.n_rollout_steps=100 eval.infer.n_trajs=-1 \
    > logs/infer_tgv3d_test.log 2>&1
  log "tgv3d infer rc=$?"
fi

# 5-7. RPF: generate (band-reversal forcing), train, test infer
if [ ! -f datasets/RPF_2D_gen/metadata.json ]; then
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

# 8-10. LDC: generate (moving lid), train, test infer
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

# 11. Trained long-horizon row: 400 steps, trained 3D checkpoint, Pallas path
TGV3D_CKP=$(ls -dt ckp/gns_TGV_3D_gen_* 2>/dev/null | head -1)
if [ -n "$TGV3D_CKP" ]; then
  LONG_CKP="$TGV3D_CKP" LONG_DATA=datasets/TGV_3D_gen \
    timeout 7200 python -u scripts/bench_long_horizon.py \
    > logs/bench_long_horizon_trained.log 2>&1
  log "long-horizon trained rc=$?"
fi

# 12. Streamed-kernel crossover table (pallas vs celllist vs spatial)
timeout 7200 python -u scripts/bench_crossover.py > logs/bench_crossover_r5.log 2>&1
log "crossover rc=$?"

# 13. 200k-step TGV-2D resume — absorbs the remaining wall clock; stop at
# the cutoff so the driver's round-end bench gets the chip back.
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
