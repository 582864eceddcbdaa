#!/bin/bash
# Pretrain -> finetune matrix walker: enumerate every pretrained checkpoint
# under runs/ and fan out all downstream protocols with the published
# per-task hypers — the reference's scripts/finetune/submit_utils.sh shape
# (it walks output_home_list over all pretrain dirs and submits every
# finetune grid against each).
#
# Usage:
#   scripts/finetune_all.sh                 # all ckpts x {qm9,md17,lba,lep}
#   TASKS="qm9 md17" scripts/finetune_all.sh
#   RUNS_GLOB="runs/GeoSSL_DDM/*" scripts/finetune_all.sh
#   SCRATCH=1 scripts/finetune_all.sh       # also the random-init rows
#
# Idempotent like the pretrain sweeps: each underlying finetune script skips
# any seed/task whose model_final.ckpt already exists, so the walker can be
# resubmitted after interruption.
set -e
cd "$(dirname "$0")/.."
DATA_ROOT=${DATA_ROOT:-data}
TASKS=${TASKS:-"qm9 md17 lba lep"}
RUNS_GLOB=${RUNS_GLOB:-"runs/*/*"}
OUT_ROOT=${OUT_ROOT:-runs/finetune}
SCRATCH=${SCRATCH:-0}
EXTRA=${EXTRA:-}

run_matrix() {  # $1=model  $2=ckpt(or empty)  $3=tag
  local model=$1 ckpt=$2 tag=$3
  for task in $TASKS; do
    case $task in
      qm9)
        MODEL=$model CKPT=$ckpt DATA_ROOT=$DATA_ROOT EXTRA="$EXTRA" \
          OUT_PREFIX="${OUT_ROOT}/${tag}/qm9_${model}" \
          bash scripts/finetune_qm9.sh ;;
      md17)
        MODEL=$model CKPT=$ckpt DATA_ROOT=$DATA_ROOT EXTRA="$EXTRA" \
          OUT_PREFIX="${OUT_ROOT}/${tag}/md17_${model}" \
          bash scripts/finetune_md17.sh ;;
      lba|lep)
        # finetune_lba_lep.sh drives both; run it once per tag
        [ "$task" = lep ] && continue
        MODEL=$model CKPT=$ckpt DATA_ROOT=$DATA_ROOT EXTRA="$EXTRA" \
          OUT_PREFIX_LBA="${OUT_ROOT}/${tag}/lba_${model}" \
          OUT_PREFIX_LEP="${OUT_ROOT}/${tag}/lep_${model}" \
          bash scripts/finetune_lba_lep.sh ;;
      *) echo "unknown task: $task" >&2; exit 1 ;;
    esac
  done
}

if [ "$SCRATCH" = 1 ]; then
  for model in schnet painn; do
    run_matrix "$model" "" "scratch_${model}"
  done
fi

shopt -s nullglob
found=0
for dir in $RUNS_GLOB; do
  ckpt="$dir/model_final.ckpt"
  [ -f "$ckpt" ] || continue
  case $dir in runs/finetune/*|*/runs/finetune/*|"$OUT_ROOT"/*) continue ;; esac   # don't walk our own output
  found=1
  # model arch is recoverable from the pretrain dir naming convention
  # (runs/GeoSSL_DDM/painn_mask0.3_..., runs/baseline_charge/schnet, ...)
  case $dir in
    *painn*) model=painn ;;
    *) model=schnet ;;
  esac
  # tag = path under the runs root (works for absolute RUNS_GLOB too)
  tag=$(echo "$dir" | sed 's|.*/runs/||; s|^runs/||; s|/|__|g')
  echo "== $tag (model=$model ckpt=$ckpt)"
  run_matrix "$model" "$ckpt" "$tag"
done

if [ "$found" = 0 ] && [ "$SCRATCH" != 1 ]; then
  echo "no pretrained checkpoints under $RUNS_GLOB; run the pretrain sweeps" \
       "first (scripts/pretrain_geossl_ddm.sh, scripts/pretrain_baselines.sh)" >&2
  exit 1
fi
