#!/bin/bash
# GeoSSL-DDM pretraining sweep — hyperparameter grid from the reference's
# scripts/pretrain_GeoSSL_DDM/submit_pretrain_GeoSSL_DDM.sh:2-28
# (SLURM array jobs there; plain sequential loop here — one TPU chip each).
set -e
DATA_ROOT=${DATA_ROOT:-data}
EXTRA=${EXTRA:-}

for model in schnet painn; do
for masking in 0 0.3; do
for levels in 30 50; do
for anneal in 0.05 2 5 10; do
  out="runs/GeoSSL_DDM/${model}_mask${masking}_L${levels}_a${anneal}"
  [ -f "$out/model_final.ckpt" ] && continue   # idempotent resubmission
  python -m geossl_tpu.train.pretrain_geossl \
    --GeoSSL_option DDM --model_3d $model \
    --dataset Molecule3D_1000000 --data_root $DATA_ROOT \
    --GeoSSL_atom_masking_ratio $masking \
    --SM_num_noise_level $levels --SM_anneal_power $anneal \
    --batch_size 128 --epochs 100 --lr 5e-4 \
    --output_model_dir "$out" $EXTRA
done; done; done; done
