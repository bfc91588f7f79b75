#!/usr/bin/env bash
# NR3D training (reference scripts/train_nr3d.sh: lr 1e-4 / 1e-3, decay 150).
if [ -z "${PP_CHECKPOINT:-}" ]; then
  echo "warning: PP_CHECKPOINT unset — training WITHOUT the pretrained" \
       "GroupFree backbone the reference recipe loads (gf_detector_l6o256.pth)" >&2
fi
python train.py \
    --use_color \
    --weight_decay 0.0005 \
    --data_root "${DATA_ROOT:-data/}" \
    --dataset nr3d --test_dataset nr3d \
    --lr_decay_epochs 150 \
    --detect_intermediate --joint_det \
    --use_soft_token_loss --use_contrastive_align \
    --self_attend --butd_cls \
    --lr 1e-4 --lr_backbone 1e-3 \
    --batch_size 12 --val_freq 3 --save_freq 3 --print_freq 500 \
    ${PP_CHECKPOINT:+--pp_checkpoint "$PP_CHECKPOINT"} \
    --log_dir "${LOG_DIR:-logs/nr3d}" \
    "$@"
