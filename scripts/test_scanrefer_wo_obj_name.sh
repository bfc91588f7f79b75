#!/usr/bin/env bash
# "Grounding without object name" protocol (reference
# scripts/test_scanrefer_wo_obj_name.sh): evaluate on the released
# ScanRefer_val_without_object_name_attri_rel.json annotation variant,
# passed as the second argument.
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
    --butd --self_attend --augment_det \
    --wo_obj_name "${2:?usage: test_scanrefer_wo_obj_name.sh <ckpt> <wo_obj_name.json>}" \
    --eval --checkpoint_path "${1:?usage: test_scanrefer_wo_obj_name.sh <ckpt> <wo_obj_name.json>}" \
    --log_dir "${LOG_DIR:-logs/scanrefer_wo_obj_name_eval}"
