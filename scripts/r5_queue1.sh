#!/bin/bash
# Round-5 TPU job queue, stage 1: runs after the DAM training finishes.
# Keeps the single chip busy: streamed-kernel smoke -> 3D TGV dataset
# generation -> LDC dataset generation -> 3D TGV GNS training.
set -u
cd /root/repo

DAM_PID=$(cat /tmp/train_dam.pid 2>/dev/null || echo "")
if [ -n "$DAM_PID" ]; then
  while kill -0 "$DAM_PID" 2>/dev/null; do sleep 20; done
fi
echo "[queue1] DAM training done $(date)"

echo "[queue1] streamed smoke" && timeout 1800 python -u scripts/smoke_streamed_tpu.py 64000 > logs/smoke_streamed.log 2>&1
echo "[queue1] smoke rc=$?"

rm -rf datasets/sims/3D_TGV datasets/TGV_3D_gen
timeout 14400 python -u scripts/generate_sph_dataset.py --case tgv3d \
  --sim_dir datasets/sims/3D_TGV --dst_dir datasets/TGV_3D_gen \
  > logs/gen_tgv3d.log 2>&1
echo "[queue1] tgv3d gen rc=$?"

rm -rf datasets/sims/2D_LDC datasets/LDC_2D_gen
timeout 14400 python -u scripts/generate_sph_dataset.py --case ldc \
  --sim_dir datasets/sims/2D_LDC --dst_dir datasets/LDC_2D_gen \
  > logs/gen_ldc.log 2>&1
echo "[queue1] ldc gen rc=$?"

PYTHONFAULTHANDLER=1 timeout 21600 python -u main.py config=configs/tgv_3d_gen/gns.yaml \
  > logs/train_tgv3d_r5.log 2>&1
echo "[queue1] tgv3d train rc=$?"
echo "[queue1] all done $(date)"
