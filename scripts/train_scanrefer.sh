#!/usr/bin/env bash
# Two-stage ScanRefer training (reference scripts/train_scanrefer.sh recipe:
# lr 2e-4 / backbone 2e-3, decay at epochs 50 & 75, batch 12, --butd).
if [ -z "${PP_CHECKPOINT:-}" ]; then
  echo "warning: PP_CHECKPOINT unset — training WITHOUT the pretrained" \
       "GroupFree backbone the reference recipe loads (gf_detector_l6o256.pth)" >&2
fi
python train.py \
    --use_color \
    --weight_decay 0.0005 \
    --data_root "${DATA_ROOT:-data/}" \
    --dataset scanrefer --test_dataset scanrefer \
    --lr_decay_epochs 50 75 \
    --detect_intermediate --joint_det \
    --use_soft_token_loss --use_contrastive_align \
    --self_attend --augment_det --butd \
    --lr 2e-4 --lr_backbone 2e-3 \
    --batch_size 12 --val_freq 3 --save_freq 3 --print_freq 500 \
    ${PP_CHECKPOINT:+--pp_checkpoint "$PP_CHECKPOINT"} \
    --log_dir "${LOG_DIR:-logs/scanrefer_butd}" \
    "$@"
