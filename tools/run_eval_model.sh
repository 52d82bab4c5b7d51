#!/usr/bin/env bash
# Reproduction harness: evaluate the published model variants
# (reference tools/run_eval_model.sh pins five checkpoints; same matrix here).
set -e
DATA_ROOT=${DATA_ROOT:-data}
CKPT_DIR=${CKPT_DIR:-output}

# PointRCNN-style baseline (no LI-Fusion, no CE loss)
python tools/eval.py --cfg_file cfgs/default.yaml --eval_mode rcnn_online \
    --data_root "$DATA_ROOT" --ckpt "$CKPT_DIR/baseline/ckpt/checkpoint_epoch_49" \
    --set TRAIN.CE_WEIGHT 0.0 || true

# LI-Fusion, no CE
python tools/eval.py --cfg_file cfgs/LI_Fusion_with_attention_use_ce_loss.yaml \
    --eval_mode rcnn_online --data_root "$DATA_ROOT" \
    --ckpt "$CKPT_DIR/li_fusion/ckpt/checkpoint_epoch_49" \
    --set TRAIN.CE_WEIGHT 0.0 || true

# CE loss, no LI-Fusion
python tools/eval.py --cfg_file cfgs/default.yaml --eval_mode rcnn_online \
    --data_root "$DATA_ROOT" --ckpt "$CKPT_DIR/ce_loss/ckpt/checkpoint_epoch_49" || true

# Full EPNet (LI-Fusion + CE)
python tools/eval.py --cfg_file cfgs/LI_Fusion_with_attention_use_ce_loss.yaml \
    --eval_mode rcnn_online --data_root "$DATA_ROOT" \
    --ckpt "$CKPT_DIR/epnet/ckpt/checkpoint_epoch_49" || true

# EPNet + IoU branch
python tools/eval.py --cfg_file cfgs/LI_Fusion_with_attention_use_ce_loss_iou_branch.yaml \
    --eval_mode rcnn_online --data_root "$DATA_ROOT" \
    --ckpt "$CKPT_DIR/epnet_iou/ckpt/checkpoint_epoch_49" || true
