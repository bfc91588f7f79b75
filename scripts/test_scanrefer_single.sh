#!/usr/bin/env bash
# Evaluate a SINGLE-STAGE ScanRefer checkpoint (reference
# scripts/test_scanrefer_single.sh: no detected-box stream — no --butd).
python train.py \
    --num_decoder_layers 6 \
    --use_color \
    --weight_decay 0.0005 \
    --data_root "${DATA_ROOT:-data/}" \
    --val_freq 3 --batch_size 12 --save_freq 3 --print_freq 500 \
    --lr_backbone 2e-3 --lr 2e-4 \
    --dataset scanrefer --test_dataset scanrefer \
    --detect_intermediate --joint_det \
    --use_soft_token_loss --use_contrastive_align \
    --lr_decay_epochs 50 75 \
    --self_attend --augment_det \
    --eval --checkpoint_path "${1:?usage: test_scanrefer_single.sh <ckpt>}" \
    --log_dir "${LOG_DIR:-logs/scanrefer_single_eval}"
