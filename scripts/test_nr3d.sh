#!/usr/bin/env bash
# Evaluate an NR3D checkpoint (reference scripts/test_nr3d.sh: butd_cls
# protocol, NR3D split of ReferIt3D).
python train.py \
    --num_decoder_layers 6 \
    --use_color \
    --weight_decay 0.0005 \
    --data_root "${DATA_ROOT:-data/}" \
    --val_freq 3 --batch_size 12 --save_freq 3 --print_freq 500 \
    --lr_backbone 1e-3 --lr 1e-4 \
    --dataset nr3d --test_dataset nr3d \
    --detect_intermediate --joint_det \
    --use_soft_token_loss --use_contrastive_align \
    --lr_decay_epochs 150 \
    --butd_cls --self_attend \
    --eval --checkpoint_path "${1:?usage: test_nr3d.sh <ckpt>}" \
    --log_dir "${LOG_DIR:-logs/nr3d_eval}"
