#!/usr/bin/env bash
# Evaluate a ScanRefer checkpoint (reference scripts/test_*.sh).
python train.py \
    --use_color \
    --data_root "${DATA_ROOT:-data/}" \
    --dataset scanrefer --test_dataset scanrefer \
    --detect_intermediate \
    --use_soft_token_loss --use_contrastive_align \
    --self_attend --butd \
    --batch_size 12 \
    --eval --checkpoint_path "${1:?usage: test_scanrefer.sh <ckpt_dir>}" \
    --log_dir "${LOG_DIR:-logs/scanrefer_eval}"
