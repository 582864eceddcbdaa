#!/bin/bash
# Atom3D protocols — scripts/finetune/submit_finetune_lba_lep_schnet.sh:8-33
# (LBA: batch 64, lr 1e-4, 300 epochs, seeds {12,22,32,42,52};
#  LEP: batch 16, lr 1e-4).
set -e
DATA_ROOT=${DATA_ROOT:-data}
MODEL=${MODEL:-schnet}
CKPT=${CKPT:-}
EXTRA=${EXTRA:-}
OUT_PREFIX_LBA=${OUT_PREFIX_LBA:-runs/lba_${MODEL}}
OUT_PREFIX_LEP=${OUT_PREFIX_LEP:-runs/lep_${MODEL}}
CKPT_ARG=""
[ -n "$CKPT" ] && CKPT_ARG="--input_model_file $CKPT"

for seed in 12 22 32 42 52; do
  out="${OUT_PREFIX_LBA}/seed${seed}"
  if [ ! -f "$out/model_final.ckpt" ]; then
    python -m geossl_tpu.train.finetune_lba \
      --model_3d $MODEL --data_root $DATA_ROOT --seed $seed \
      --split atom3d_lba_split30 --batch_size 64 --epochs 300 --lr 1e-4 \
      --output_model_dir "$out" $CKPT_ARG $EXTRA
  fi
  out="${OUT_PREFIX_LEP}/seed${seed}"
  if [ ! -f "$out/model_final.ckpt" ]; then
    python -m geossl_tpu.train.finetune_lep \
      --model_3d $MODEL --data_root $DATA_ROOT --seed $seed \
      --batch_size 16 --epochs 300 --lr 1e-4 \
      --output_model_dir "$out" $CKPT_ARG $EXTRA
  fi
done
