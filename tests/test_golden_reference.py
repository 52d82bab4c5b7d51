"""Reference-golden codec/loss tests (VERDICT r2 item 6).

``tests/golden_codec.json`` holds input/output pairs produced by EXECUTING
the reference implementation (``/root/reference/lib/utils/bbox_transform.py:25-259``
and ``lib/utils/loss_utils.py:90-341``) on torch-CPU via
``tools/gen_golden_codec.py``. Unlike the roundtrip tests in
test_codec_losses.py, these catch systematic offsets shared by our encode
AND decode (e.g. a half-bin shift) — the decode must match the reference's
numbers, not just invert our own encode.

Coverage: argmax + BBOX_AVG_BY_BIN soft decode, RY_WITH_BIN on both
half-circles, RPN full-circle + RCNN fine heading modes, y-by-bin, roi-frame
rotation restore, and get_reg_loss totals for 'raw' and 'cls_mask_with_bin'
CE modes plus the IoU-branch BCE.
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from epnet_tpu.losses import get_reg_loss
from epnet_tpu.ops.bbox_codec import decode_bbox_target

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_codec.json")

with open(GOLDEN) as f:
    CASES = json.load(f)

DECODE_CASES = sorted(k for k in CASES if not k.startswith("regloss"))
LOSS_CASES = sorted(k for k in CASES if k.startswith("regloss"))


@pytest.mark.parametrize("name", DECODE_CASES)
def test_decode_matches_reference(name):
    case = CASES[name]
    p = case["params"]
    out = decode_bbox_target(
        jnp.asarray(case["roi"], jnp.float32),
        jnp.asarray(case["pred_reg"], jnp.float32),
        anchor_size=jnp.asarray(case["anchor"], jnp.float32),
        loc_scope=p["loc_scope"], loc_bin_size=p["loc_bin_size"],
        num_head_bin=p["num_head_bin"], get_xz_fine=p["get_xz_fine"],
        get_y_by_bin=p["get_y_by_bin"], loc_y_scope=p["loc_y_scope"],
        loc_y_bin_size=p["loc_y_bin_size"], get_ry_fine=p["get_ry_fine"],
        bbox_avg_by_bin=p["bbox_avg_by_bin"], ry_with_bin=p["ry_with_bin"],
    )
    expected = np.asarray(case["expected"], np.float32)
    got = np.asarray(out)
    assert got.shape == expected.shape
    # ry is periodic: compare modulo 2*pi
    dry = np.abs(got[:, 6] - expected[:, 6])
    dry = np.minimum(dry, 2 * np.pi - dry)
    np.testing.assert_allclose(got[:, :6], expected[:, :6], atol=1e-4, rtol=1e-4)
    assert dry.max() < 1e-4, f"ry mismatch: {dry}"


@pytest.mark.parametrize("name", LOSS_CASES)
def test_reg_loss_matches_reference(name):
    case = CASES[name]
    p = case["params"]
    n = len(case["reg_label"])
    iou_pred = case["iou_branch_pred"]
    loc, angle, size, iou, d = get_reg_loss(
        jnp.asarray(case["cls_score"], jnp.float32),
        jnp.asarray(case["mask_score"], jnp.float32),
        jnp.asarray(case["pred_reg"], jnp.float32),
        jnp.asarray(case["reg_label"], jnp.float32),
        fg_mask=jnp.ones((n,), jnp.float32),
        loc_scope=p["loc_scope"], loc_bin_size=p["loc_bin_size"],
        num_head_bin=p["num_head_bin"],
        anchor_size=jnp.asarray(case["anchor"], jnp.float32),
        get_xz_fine=True, get_y_by_bin=False, get_ry_fine=False,
        use_cls_score=True, use_mask_score=False,
        use_iou_branch=p["iou_branch"],
        iou_branch_pred=(jnp.asarray(iou_pred, jnp.float32)
                         if iou_pred is not None else None),
        iou_loss_type=('cls_mask_with_bin' if p["ce_mask_with_bin"] else 'raw'),
    )
    exp = case["expected"]
    np.testing.assert_allclose(float(loc), exp["loss_loc"], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(float(angle), exp["loss_angle"], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(float(size), exp["loss_size"], atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(float(iou), exp["loss_iou"], atol=2e-4, rtol=2e-4)
    if p["iou_branch"]:
        np.testing.assert_allclose(float(d["iou_branch_loss"]),
                                   exp["loss_iou_branch"], atol=2e-4, rtol=2e-4)
