#!/bin/bash
# Round-5 TPU job queue, stage 2: runs after queue1 (which ends with the
# 3D TGV training). RPF + LDC trainings, trained long-horizon bench,
# streamed crossover bench, then the 200k-step TGV-2D resume.
set -u
cd /root/repo

Q1_PID=$(cat /tmp/queue1.pid 2>/dev/null || echo "")
if [ -n "$Q1_PID" ]; then
  while kill -0 "$Q1_PID" 2>/dev/null; do sleep 30; done
fi
echo "[queue2] queue1 done $(date)"

# RPF training: dataset may still be generating on CPU; if it has not
# landed, generate it here on the TPU (fast) first.
if [ ! -f datasets/RPF_2D_gen/metadata.json ]; then
  echo "[queue2] RPF dataset missing; generating on TPU"
  RPF_CPU_PID=$(cat /tmp/gen_rpf.pid 2>/dev/null || echo "")
  [ -n "$RPF_CPU_PID" ] && kill "$RPF_CPU_PID" 2>/dev/null
  sleep 2
  rm -rf datasets/sims/2D_RPF datasets/RPF_2D_gen
  timeout 14400 python -u scripts/generate_sph_dataset.py --case rpf \
    --sim_dir datasets/sims/2D_RPF --dst_dir datasets/RPF_2D_gen \
    > logs/gen_rpf_tpu.log 2>&1
  echo "[queue2] rpf gen rc=$?"
fi
PYTHONFAULTHANDLER=1 timeout 14400 python -u main.py config=configs/rpf_2d_gen/gns.yaml \
  > logs/train_rpf_r5.log 2>&1
echo "[queue2] rpf train rc=$?"

PYTHONFAULTHANDLER=1 timeout 14400 python -u main.py config=configs/ldc_2d_gen/gns.yaml \
  > logs/train_ldc_r5.log 2>&1
echo "[queue2] ldc train rc=$?"

# trained long-horizon row (VERDICT r4 item 2): 400 steps on the 3D TGV
# test trajectory with the trained checkpoint
TGV3D_CKP=$(ls -dt ckp/gns_TGV_3D_gen_* 2>/dev/null | head -1)
if [ -n "$TGV3D_CKP" ]; then
  LONG_CKP="$TGV3D_CKP" LONG_DATA=datasets/TGV_3D_gen \
    timeout 7200 python -u scripts/bench_long_horizon.py \
    > logs/bench_long_horizon_trained.log 2>&1
  echo "[queue2] long-horizon trained rc=$?"
fi

# streamed-kernel crossover table (VERDICT r4 item 3)
timeout 10800 python -u scripts/bench_crossover.py > logs/bench_crossover_r5.log 2>&1
echo "[queue2] crossover rc=$?"

# 200k-step TGV-2D resume (VERDICT r4 item 4) — biggest block, last
PYTHONFAULTHANDLER=1 timeout 43000 python -u main.py config=configs/tgv_2d_gen/gns.yaml \
  load_ckp=ckp/gns_TGV_2500_gen_20260819-030936 train.step_max=200000 \
  > logs/train_tgv2d_200k.log 2>&1
echo "[queue2] tgv2d 200k rc=$?"
echo "[queue2] all done $(date)"
