#!/bin/bash
# Atom3D protocols — scripts/finetune/submit_finetune_lba_lep_schnet.sh:8-33
# (LBA: batch 64, lr 1e-4, 300 epochs, seeds {12,22,32,42,52};
#  LEP: batch 16, lr 1e-4).
set -e
DATA_ROOT=${DATA_ROOT:-data}
MODEL=${MODEL:-schnet}
CKPT=${CKPT:-}
EXTRA=${EXTRA:-}
CKPT_ARG=""
[ -n "$CKPT" ] && CKPT_ARG="--input_model_file $CKPT"

for seed in 12 22 32 42 52; do
  python -m geossl_tpu.train.finetune_lba \
    --model_3d $MODEL --data_root $DATA_ROOT --seed $seed \
    --split atom3d_lba_split30 --batch_size 64 --epochs 300 --lr 1e-4 \
    --output_model_dir "runs/lba_${MODEL}/seed${seed}" $CKPT_ARG $EXTRA
  python -m geossl_tpu.train.finetune_lep \
    --model_3d $MODEL --data_root $DATA_ROOT --seed $seed \
    --batch_size 16 --epochs 300 --lr 1e-4 \
    --output_model_dir "runs/lep_${MODEL}/seed${seed}" $CKPT_ARG $EXTRA
done
