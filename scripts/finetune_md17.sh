#!/bin/bash
# MD17 protocol — scripts/finetune/submit_finetune_md17_schnet.sh:9-19
# (train batch 5, 1000/1000 split, loss 0.05*E + 0.95*F, 1000 epochs).
set -e
DATA_ROOT=${DATA_ROOT:-data}
MODEL=${MODEL:-schnet}
CKPT=${CKPT:-}
EXTRA=${EXTRA:-}
OUT_PREFIX=${OUT_PREFIX:-runs/md17_${MODEL}}
CKPT_ARG=""
[ -n "$CKPT" ] && CKPT_ARG="--input_model_file $CKPT"

for task in aspirin benzene2018 ethanol malonaldehyde naphthalene salicylic toluene uracil; do
  out="${OUT_PREFIX}/${task}"
  [ -f "$out/model_final.ckpt" ] && continue   # idempotent resubmission
  python -m geossl_tpu.train.finetune_md17 \
    --model_3d $MODEL --task $task --data_root $DATA_ROOT \
    --MD17_train_batch_size 5 --epochs 1000 --lr 5e-4 \
    --output_model_dir "$out" $CKPT_ARG $EXTRA
done
