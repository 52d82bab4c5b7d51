"""Proposal layer vs a direct numpy transcription of the reference's
distance-based proposal logic (proposal_layer.py:58-119)."""

import numpy as np
import pytest

from epnet_tpu.models.proposal import ProposalLayer
from epnet_tpu.ops.boxes import boxes3d_to_bev

from tiny import tiny_config


def np_axis_iou(boxes):
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)
    lx = np.maximum(x1[:, None], x1[None, :])
    rx = np.minimum(x2[:, None], x2[None, :])
    ly = np.maximum(y1[:, None], y1[None, :])
    ry = np.minimum(y2[:, None], y2[None, :])
    inter = np.clip(rx - lx, 0, None) * np.clip(ry - ly, 0, None)
    return inter / np.clip(area[:, None] + area[None, :] - inter, 1e-8, None)


def np_nms(boxes_bev5, scores, thresh):
    order = np.argsort(-scores, kind='stable')
    b = boxes_bev5[order]
    iou = np_axis_iou(b[:, :4])
    n = len(b)
    suppressed = np.zeros(n, bool)
    keep = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep.append(order[i])
        suppressed |= iou[i] > thresh
        suppressed[i] = False
    return np.array(keep, np.int64)


def np_distance_based(scores, props, pre, post, thresh):
    order = np.argsort(-scores, kind='stable')
    s, p = scores[order], props[order]
    pre_ns = (int(pre * 0.7), pre - int(pre * 0.7))
    post_ns = (int(post * 0.7), post - int(post * 0.7))
    dist = p[:, 2]
    out_boxes, out_scores = [], []
    m1 = (dist > 0) & (dist <= 40.0)
    for i, (lo, hi) in enumerate(((0.0, 40.0), (40.0, 80.0))):
        m = (dist > lo) & (dist <= hi)
        if m.sum() != 0:
            cs, cp = s[m][:pre_ns[i]], p[m][:pre_ns[i]]
        else:
            cs = s[m1][pre_ns[0]:][:pre_ns[1]]
            cp = p[m1][pre_ns[0]:][:pre_ns[1]]
        bev = np.asarray(boxes3d_to_bev(cp))
        keep = np_nms(bev[:, [0, 1, 2, 3]], cs, thresh)[:post_ns[i]]
        out_boxes.append(cp[keep])
        out_scores.append(cs[keep])
    return np.concatenate(out_scores), np.concatenate(out_boxes, axis=0)


@pytest.mark.parametrize('seed', [0, 1])
def test_distance_based_proposals_match_reference_semantics(seed):
    cfg = tiny_config()
    rng = np.random.RandomState(seed)
    N = 256
    # decoded-proposal surrogate: feed the layer's internals directly by
    # reproducing its decode, so compare only the partition+NMS logic
    scores = rng.randn(1, N).astype(np.float32)
    # boxes in both distance ranges
    props = np.stack([
        rng.uniform(-20, 20, N), rng.uniform(0, 2, N), rng.uniform(1, 79, N),
        rng.uniform(1.4, 1.7, N), rng.uniform(1.5, 1.7, N),
        rng.uniform(3.5, 4.2, N), rng.uniform(-np.pi, np.pi, N)],
        axis=1).astype(np.float32)

    player = ProposalLayer(cfg, mode='TRAIN')
    import jax.numpy as jnp
    boxes, scr, cnt = player._single(jnp.asarray(scores[0]), jnp.asarray(props))
    boxes, scr, cnt = np.asarray(boxes), np.asarray(scr), int(cnt)

    pre, post = cfg.TRAIN.RPN_PRE_NMS_TOP_N, cfg.TRAIN.RPN_POST_NMS_TOP_N
    want_s, want_b = np_distance_based(scores[0], props, pre, post,
                                       cfg.TRAIN.RPN_NMS_THRESH)
    assert cnt == len(want_s)
    np.testing.assert_allclose(scr[:cnt], want_s, rtol=1e-5)
    np.testing.assert_allclose(boxes[:cnt], want_b, rtol=1e-5)


def test_far_range_fallback():
    """When no box lies in (40, 80], the far quota reuses near-range ranks
    [pre_n1 : pre_n1+pre_n2] (proposal_layer.py:92-100)."""
    cfg = tiny_config()
    rng = np.random.RandomState(3)
    N = 256
    scores = rng.randn(1, N).astype(np.float32)
    props = np.stack([
        rng.uniform(-20, 20, N), rng.uniform(0, 2, N), rng.uniform(1, 39, N),
        rng.uniform(1.4, 1.7, N), rng.uniform(1.5, 1.7, N),
        rng.uniform(3.5, 4.2, N), rng.uniform(-np.pi, np.pi, N)],
        axis=1).astype(np.float32)

    player = ProposalLayer(cfg, mode='TRAIN')
    import jax.numpy as jnp
    boxes, scr, cnt = player._single(jnp.asarray(scores[0]), jnp.asarray(props))
    boxes, scr, cnt = np.asarray(boxes), np.asarray(scr), int(cnt)
    want_s, want_b = np_distance_based(scores[0], props,
                                       cfg.TRAIN.RPN_PRE_NMS_TOP_N,
                                       cfg.TRAIN.RPN_POST_NMS_TOP_N,
                                       cfg.TRAIN.RPN_NMS_THRESH)
    assert cnt == len(want_s)
    np.testing.assert_allclose(scr[:cnt], want_s, rtol=1e-5)
