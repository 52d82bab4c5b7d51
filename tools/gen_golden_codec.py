"""Generate golden codec/loss vectors by EXECUTING the reference code.

Runs /root/reference's ``decode_bbox_target`` (lib/utils/bbox_transform.py:25-259)
and ``get_reg_loss`` (lib/utils/loss_utils.py:90-341) on pinned inputs with
torch-CPU and dumps the outputs to ``tests/golden_codec.json``. Only the
*values* are committed — no reference code enters the repo. This closes the
self-consistency hole in tests/test_codec_losses.py: a systematic offset
present in both our encode and decode would roundtrip cleanly but cannot
match values produced by the reference implementation itself.

Covers (VERDICT r2 item 6):
  - argmax decode (BBOX_AVG_BY_BIN=False) and soft decode (=True)
  - RY_WITH_BIN both half-circles, RPN full-circle and RCNN fine modes
  - get_reg_loss with cls_mask_with_bin CE loss (loss_utils.py:282-341)

Usage: python tools/gen_golden_codec.py   (writes tests/golden_codec.json)
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/reference")

# The image lacks `easydict`; shim the one behavior lib/config.py needs
# (a dict with attribute access) so the reference imports unmodified.
import types  # noqa: E402


class _EasyDict(dict):
    def __init__(self, d=None):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = v

    def __setitem__(self, k, v):
        if isinstance(v, dict) and not isinstance(v, _EasyDict):
            v = _EasyDict(v)
        super().__setitem__(k, v)

    __setattr__ = __setitem__

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


_ed_mod = types.ModuleType("easydict")
_ed_mod.EasyDict = _EasyDict
sys.modules.setdefault("easydict", _ed_mod)

import torch  # noqa: E402

# The reference assumes CUDA tensors (`anchor_size.to(roi.get_device())`,
# bbox_transform.py:41); on CPU get_device() returns -1 which `.to` rejects.
# Redirect to the tensor's device so the reference runs unmodified on CPU.
torch.Tensor.get_device = lambda self: self.device
# loss_utils.py:146 allocates one-hot scratch via torch.cuda.FloatTensor.
torch.cuda.FloatTensor = torch.FloatTensor

from lib.config import cfg  # noqa: E402
import lib.utils.bbox_transform as bt  # noqa: E402
import lib.utils.loss_utils as lu  # noqa: E402

torch.manual_seed(0)

OUT = {}


def pinned_pred_reg(n, c, seed):
    rng = np.random.RandomState(seed)
    return rng.uniform(-1.5, 1.5, size=(n, c)).astype(np.float32)


def run_decode(name, *, loc_scope, loc_bin_size, num_head_bin, anchor,
               get_xz_fine, get_y_by_bin, loc_y_scope, loc_y_bin_size,
               get_ry_fine, avg_by_bin, ry_with_bin, roi7, seed):
    per_loc_bin = int(loc_scope / loc_bin_size) * 2
    loc_y_bin = int(loc_y_scope / loc_y_bin_size) * 2
    c = per_loc_bin * 2
    if get_xz_fine:
        c += per_loc_bin * 2
    c += (loc_y_bin * 2) if get_y_by_bin else 1
    c += num_head_bin * 2 + 3

    n = 6
    pred = pinned_pred_reg(n, c, seed)
    rng = np.random.RandomState(seed + 100)
    if roi7:
        roi = np.concatenate([
            rng.uniform(-3, 3, (n, 1)), rng.uniform(-1, 1, (n, 1)),
            rng.uniform(5, 40, (n, 1)), rng.uniform(1.2, 1.8, (n, 1)),
            rng.uniform(1.4, 1.8, (n, 1)), rng.uniform(3.2, 4.2, (n, 1)),
            rng.uniform(-np.pi, np.pi, (n, 1)),
        ], axis=1).astype(np.float32)
    else:
        roi = np.concatenate([
            rng.uniform(-3, 3, (n, 1)), rng.uniform(-1, 1, (n, 1)),
            rng.uniform(5, 40, (n, 1)),
        ], axis=1).astype(np.float32)

    cfg.TRAIN.BBOX_AVG_BY_BIN = cfg.TEST.BBOX_AVG_BY_BIN = avg_by_bin
    cfg.TRAIN.RY_WITH_BIN = cfg.TEST.RY_WITH_BIN = ry_with_bin
    out = bt.decode_bbox_target(
        torch.from_numpy(roi), torch.from_numpy(pred),
        loc_scope=loc_scope, loc_bin_size=loc_bin_size,
        num_head_bin=num_head_bin,
        anchor_size=torch.tensor(anchor, dtype=torch.float32),
        get_xz_fine=get_xz_fine, get_y_by_bin=get_y_by_bin,
        loc_y_scope=loc_y_scope, loc_y_bin_size=loc_y_bin_size,
        get_ry_fine=get_ry_fine,
    )
    OUT[name] = {
        "pred_reg": pred.tolist(), "roi": roi.tolist(),
        "anchor": list(anchor),
        "params": dict(loc_scope=loc_scope, loc_bin_size=loc_bin_size,
                       num_head_bin=num_head_bin, get_xz_fine=get_xz_fine,
                       get_y_by_bin=get_y_by_bin, loc_y_scope=loc_y_scope,
                       loc_y_bin_size=loc_y_bin_size, get_ry_fine=get_ry_fine,
                       bbox_avg_by_bin=avg_by_bin, ry_with_bin=ry_with_bin),
        "expected": out.numpy().tolist(),
    }


ANCHOR = (1.52563191462, 1.62856739989, 3.88311640418)

# RPN-style decode (roi = xyz only, full-circle ry, y offset), both decode modes
for avg, rwb, seed in [(False, False, 1), (True, False, 2), (True, True, 3),
                       (False, True, 4)]:
    run_decode(f"rpn_avg{int(avg)}_rwb{int(rwb)}",
               loc_scope=3.0, loc_bin_size=0.5, num_head_bin=12,
               anchor=ANCHOR, get_xz_fine=True, get_y_by_bin=False,
               loc_y_scope=0.5, loc_y_bin_size=0.25, get_ry_fine=False,
               avg_by_bin=avg, ry_with_bin=rwb, roi7=False, seed=seed)

# RCNN-style decode (roi = full 7-box, fine ry, y by bin), both decode modes
for avg, rwb, seed in [(False, False, 11), (True, True, 12)]:
    run_decode(f"rcnn_avg{int(avg)}_rwb{int(rwb)}",
               loc_scope=1.5, loc_bin_size=0.5, num_head_bin=9,
               anchor=ANCHOR, get_xz_fine=True, get_y_by_bin=True,
               loc_y_scope=0.5, loc_y_bin_size=0.25, get_ry_fine=True,
               avg_by_bin=avg, ry_with_bin=rwb, roi7=True, seed=seed)

# Half-circle coverage check: craft ry logits that put the softmax mass on
# the left half-circle (ry > pi) so the RY_WITH_BIN left branch is exercised
# (bbox_transform.py:163-241 splits by ry <= pi).
def run_decode_forced_half(name, left, seed):
    loc_scope, loc_bin_size, H = 3.0, 0.5, 12
    per = int(loc_scope / loc_bin_size) * 2
    c = per * 4 + 1 + H * 2 + 3
    n = 4
    pred = pinned_pred_reg(n, c, seed)
    start = per * 4 + 1
    # full-circle ry_all = (k*api + res*api/2) % 2pi; bins 0..5 land in (0,pi]
    # (right), bins 7..11 in (pi,2pi) (left). Boost the chosen half's logits.
    boost = np.zeros((n, H), dtype=np.float32)
    if left:
        boost[:, 8:11] = 6.0
    else:
        boost[:, 1:4] = 6.0
    pred[:, start:start + H] += boost
    rng = np.random.RandomState(seed + 100)
    roi = np.concatenate([
        rng.uniform(-3, 3, (n, 1)), rng.uniform(-1, 1, (n, 1)),
        rng.uniform(5, 40, (n, 1)),
    ], axis=1).astype(np.float32)
    cfg.TRAIN.BBOX_AVG_BY_BIN = cfg.TEST.BBOX_AVG_BY_BIN = True
    cfg.TRAIN.RY_WITH_BIN = cfg.TEST.RY_WITH_BIN = True
    out = bt.decode_bbox_target(
        torch.from_numpy(roi), torch.from_numpy(pred),
        loc_scope=loc_scope, loc_bin_size=loc_bin_size, num_head_bin=H,
        anchor_size=torch.tensor(ANCHOR, dtype=torch.float32),
        get_xz_fine=True, get_y_by_bin=False, get_ry_fine=False,
    )
    OUT[name] = {
        "pred_reg": pred.tolist(), "roi": roi.tolist(), "anchor": list(ANCHOR),
        "params": dict(loc_scope=loc_scope, loc_bin_size=loc_bin_size,
                       num_head_bin=H, get_xz_fine=True, get_y_by_bin=False,
                       loc_y_scope=0.5, loc_y_bin_size=0.25, get_ry_fine=False,
                       bbox_avg_by_bin=True, ry_with_bin=True),
        "expected": out.numpy().tolist(),
    }


run_decode_forced_half("rpn_rwb_left_half", left=True, seed=21)
run_decode_forced_half("rpn_rwb_right_half", left=False, seed=22)


# ---- get_reg_loss golden values (loss_utils.py:90-341) --------------------
def run_reg_loss(name, *, ce_mask_with_bin, iou_branch, seed):
    loc_scope, loc_bin_size, H = 3.0, 0.5, 12
    per = int(loc_scope / loc_bin_size) * 2
    c = per * 4 + 1 + H * 2 + 3
    n = 8
    rng = np.random.RandomState(seed)
    pred = torch.from_numpy(rng.uniform(-1.0, 1.0, (n, c)).astype(np.float32))
    cls_score = torch.from_numpy(rng.uniform(-2, 2, (n,)).astype(np.float32))
    mask_score = torch.from_numpy(rng.uniform(0.1, 0.9, (n,)).astype(np.float32))
    # reg_label = offsets within scope + plausible sizes + ry
    reg_label = np.concatenate([
        rng.uniform(-2.5, 2.5, (n, 1)), rng.uniform(-0.4, 0.4, (n, 1)),
        rng.uniform(-2.5, 2.5, (n, 1)), rng.uniform(1.3, 1.7, (n, 1)),
        rng.uniform(1.4, 1.8, (n, 1)), rng.uniform(3.3, 4.3, (n, 1)),
        rng.uniform(-np.pi, np.pi, (n, 1)),
    ], axis=1).astype(np.float32)
    reg_label = torch.from_numpy(reg_label)

    cfg.TRAIN.IOU_LOSS_TYPE = 'cls_mask_with_bin' if ce_mask_with_bin else 'raw'
    pred_iou = [torch.from_numpy(
        rng.uniform(0.05, 0.95, (n, 1)).astype(np.float32))] if iou_branch else None

    loss_loc, loss_angle, loss_size, loss_iou, reg_loss_dict = lu.get_reg_loss(
        cls_score, mask_score, pred, reg_label,
        loc_scope=loc_scope, loc_bin_size=loc_bin_size, num_head_bin=H,
        anchor_size=torch.tensor(ANCHOR, dtype=torch.float32),
        get_xz_fine=True, get_y_by_bin=False, get_ry_fine=False,
        use_cls_score=True, use_mask_score=False,
        gt_iou_weight=torch.ones(n), use_iou_branch=iou_branch,
        iou_branch_pred=pred_iou[0] if iou_branch else None,
    )
    loss_iou_branch = reg_loss_dict.get('iou_branch_loss', torch.tensor(0.0))
    OUT[name] = {
        "pred_reg": pred.numpy().tolist(),
        "cls_score": cls_score.numpy().tolist(),
        "mask_score": mask_score.numpy().tolist(),
        "reg_label": reg_label.numpy().tolist(),
        "iou_branch_pred": (pred_iou[0].numpy().tolist() if iou_branch else None),
        "anchor": list(ANCHOR),
        "params": dict(loc_scope=loc_scope, loc_bin_size=loc_bin_size,
                       num_head_bin=H, ce_mask_with_bin=ce_mask_with_bin,
                       iou_branch=iou_branch),
        "expected": dict(
            loss_loc=float(loss_loc), loss_angle=float(loss_angle),
            loss_size=float(loss_size), loss_iou=float(loss_iou),
            loss_iou_branch=float(loss_iou_branch),
        ),
    }


run_reg_loss("regloss_cemask_bin", ce_mask_with_bin=True, iou_branch=False, seed=31)
run_reg_loss("regloss_plain_ce", ce_mask_with_bin=False, iou_branch=False, seed=32)
run_reg_loss("regloss_iou_branch", ce_mask_with_bin=True, iou_branch=True, seed=33)

with open("/root/repo/tests/golden_codec.json", "w") as f:
    json.dump(OUT, f)
print("wrote", len(OUT), "golden cases")
