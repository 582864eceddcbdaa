#!/bin/bash
# Baseline SSL objectives — grids from the reference's scripts/pretrain_baselines/*
set -e
DATA_ROOT=${DATA_ROOT:-data}
EXTRA=${EXTRA:-}

for model in schnet painn; do
  for obj in supervised charge distance torsion infograph; do
    out="runs/baseline_${obj}/${model}"
    [ -f "$out/model_final.ckpt" ] && continue
    python -m geossl_tpu.train.pretrain_baselines $obj \
      --model_3d $model --dataset Molecule3D_1000000 --data_root $DATA_ROOT \
      --batch_size 128 --epochs 100 --lr 5e-4 --output_model_dir "$out" $EXTRA
  done
  # contrastive baselines: EBM-NCE sigma grid {0.3, 1} per
  # submit_pretrain_GeoSSL_EBM_NCE.sh:20-22; InfoNCE; RR
  for sigma in 0.3 1; do
    out="runs/baseline_EBM_NCE/${model}_sigma${sigma}"
    [ -f "$out/model_final.ckpt" ] && continue
    python -m geossl_tpu.train.pretrain_geossl --GeoSSL_option EBM_NCE \
      --model_3d $model --GeoSSL_sigma $sigma --data_root $DATA_ROOT \
      --batch_size 128 --epochs 100 --lr 5e-4 --output_model_dir "$out" $EXTRA
  done
done
