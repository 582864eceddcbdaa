#!/bin/bash
# QM9 fine-tune protocol — scripts/finetune/submit_finetune_qm9_schnet.sh:6-43
# (customized_01 split, batch 128, lr 5e-4 cosine, 1000 epochs, 12 targets).
set -e
DATA_ROOT=${DATA_ROOT:-data}
MODEL=${MODEL:-schnet}
CKPT=${CKPT:-}   # pretrained backbone, e.g. runs/GeoSSL_DDM/.../model.ckpt
EXTRA=${EXTRA:-}
OUT_PREFIX=${OUT_PREFIX:-runs/qm9_${MODEL}}
CKPT_ARG=""
[ -n "$CKPT" ] && CKPT_ARG="--input_model_file $CKPT"

for task in mu alpha homo lumo gap r2 zpve u0 u298 h298 g298 cv; do
  out="${OUT_PREFIX}/${task}"
  [ -f "$out/model_final.ckpt" ] && continue   # idempotent resubmission
  python -m geossl_tpu.train.finetune_qm9 \
    --model_3d $MODEL --task $task --data_root $DATA_ROOT \
    --batch_size 128 --epochs 1000 --lr 5e-4 --loss mae \
    --output_model_dir "$out" $CKPT_ARG $EXTRA
done
