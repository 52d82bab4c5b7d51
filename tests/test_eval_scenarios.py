"""Differential AP scenarios with hand-derived exact values.

Each scenario's AP is computable by hand from the official protocol
(reference tools/kitti_object_eval_python/eval.py): 41 recall-spaced
thresholds (:556-561 R40 averaging), VOC-interpolated precision
(max over recalls >= r), greedy matching (:156-273), DontCare regions
(metric 0 only), height/occlusion/truncation difficulty gating (:28-82).
These are exact-value checks — the loose `> 0.x` sanity asserts live in
test_eval.py.
"""

import numpy as np

from epnet_tpu.eval.kitti_ap import empty_anno, eval_class, get_official_eval_result, map_r40


def make_anno(boxes3d, names=None, scores=None, heights=60.0, occluded=None,
              truncated=None, bbox=None):
    n = len(boxes3d)
    if n == 0:
        return empty_anno()
    if bbox is None:
        bbox = np.zeros((n, 4))
        bbox[:, 0] = np.arange(n) * 110.0  # disjoint 2D boxes
        bbox[:, 2] = bbox[:, 0] + 100
        bbox[:, 3] = np.broadcast_to(heights, (n,))
    return {
        'name': np.array(names if names is not None else ['Car'] * n),
        'truncated': (np.zeros(n) if truncated is None else np.asarray(truncated, float)),
        'occluded': (np.zeros(n, np.int64) if occluded is None
                     else np.asarray(occluded, np.int64)),
        'alpha': np.zeros(n), 'bbox': np.asarray(bbox, float),
        'dimensions': boxes3d[:, [5, 3, 4]],
        'location': boxes3d[:, 0:3], 'rotation_y': boxes3d[:, 6],
        'score': np.asarray(scores if scores is not None else np.ones(n), float),
    }


def grid_boxes(n, spacing=10.0):
    """n disjoint, axis-aligned car boxes on a line (IoU(i,j)=0 for i!=j)."""
    b = np.zeros((n, 7))
    b[:, 0] = np.arange(n) * spacing
    b[:, 1] = 1.6
    b[:, 2] = 20.0
    b[:, 3:6] = (1.5, 1.6, 3.9)
    return b


def test_ap_perfect_is_exactly_100():
    """Enough gt that all 41 recall sample points fill -> AP == 100.0."""
    G = 200
    rng = np.random.RandomState(0)
    boxes = grid_boxes(G)
    scores = rng.permutation(G) / G + 0.5
    gt = [make_anno(boxes)]
    dt = [make_anno(boxes, scores=scores)]
    r = eval_class(gt, dt, 'car', 0, 2, 0.7)
    assert abs(map_r40(r['precision']) - 100.0) < 1e-9


def test_ap_top_scoring_fp_floor_is_exactly_80():
    """200 perfect TPs + 50 FPs scored ABOVE every TP: at each threshold
    fp=50, so precision(k TPs) = k/(k+50); interpolation flattens the curve
    to the final 200/250 = 0.8 -> AP == 80.0 exactly."""
    G, F = 200, 50
    rng = np.random.RandomState(1)
    boxes = grid_boxes(G)
    fp_boxes = grid_boxes(F) + np.array([10000, 0, 0, 0, 0, 0, 0.0])
    fp_bbox = np.zeros((F, 4))
    fp_bbox[:, 0] = 30000 + np.arange(F) * 110
    fp_bbox[:, 2] = fp_bbox[:, 0] + 100
    fp_bbox[:, 3] = 60.0
    gt = [make_anno(boxes)]
    dt_boxes = np.concatenate([boxes, fp_boxes])
    scores = np.concatenate([rng.permutation(G) / G * 0.4 + 0.1,    # TPs
                             rng.permutation(F) / F * 0.05 + 0.9])  # FPs on top
    bbox = np.concatenate([make_anno(boxes)['bbox'], fp_bbox])
    dt = [make_anno(dt_boxes, scores=scores, bbox=bbox)]
    r = eval_class(gt, dt, 'car', 0, 2, 0.7)
    assert abs(map_r40(r['precision']) - 80.0) < 1e-9


def test_ap_recall_ceiling_half_is_exactly_50():
    """Half the gt detected perfectly, no FP: recall caps at 0.5, the 20
    reachable sample positions are precision 1 -> AP == 50.0 exactly."""
    G = 200
    rng = np.random.RandomState(2)
    boxes = grid_boxes(G)
    gt = [make_anno(boxes)]
    dt = [make_anno(boxes[:G // 2], scores=rng.permutation(G // 2) + 1.0)]
    r = eval_class(gt, dt, 'car', 0, 2, 0.7)
    assert abs(map_r40(r['precision']) - 50.0) < 1e-9


def test_dontcare_region_absorbs_fp_on_bbox_metric():
    """A detection inside a DontCare 2D region must not count as FP for the
    bbox metric (compute_fp dc pass, eval.py:249-264) — AP identical to the
    run without that detection."""
    G = 60
    rng = np.random.RandomState(3)
    boxes = grid_boxes(G)
    scores = rng.permutation(G) / G + 0.5
    base = make_anno(boxes)
    # DontCare gt: its 3D fields are irrelevant, 2D bbox defines the region
    dc_bbox = np.array([[50000.0, 0.0, 50100.0, 60.0]])
    gt_anno = make_anno(np.concatenate([boxes, grid_boxes(1) + 40000]),
                        names=['Car'] * G + ['DontCare'],
                        bbox=np.concatenate([base['bbox'], dc_bbox]))
    gt = [gt_anno]

    dt_clean = [make_anno(boxes, scores=scores)]
    # extra detection fully inside the DontCare region, top score
    extra = grid_boxes(1) + 41000
    dtb = np.concatenate([boxes, extra])
    dt_bbox = np.concatenate([base['bbox'], dc_bbox])
    dt_dc = [make_anno(dtb, scores=np.concatenate([scores, [9.9]]),
                       bbox=dt_bbox)]

    r_clean = eval_class(gt, dt_clean, 'car', 0, 0, 0.7)
    r_dc = eval_class(gt, dt_dc, 'car', 0, 0, 0.7)
    assert abs(map_r40(r_clean['precision']) - map_r40(r_dc['precision'])) < 1e-9
    # ... and the same extra detection OUTSIDE any dc region IS an fp
    dt_fp = [make_anno(dtb, scores=np.concatenate([scores, [9.9]]))]
    r_fp = eval_class(gt, dt_fp, 'car', 0, 0, 0.7)
    assert map_r40(r_fp['precision']) < map_r40(r_dc['precision']) - 1.0


def test_small_height_detection_ignored_at_easy_counts_at_moderate():
    """dt bbox height in [25, 40) px: ignored (not FP) on easy, a real FP on
    moderate (MIN_HEIGHT (40, 25, 25), eval.py:28-82)."""
    G = 60
    rng = np.random.RandomState(4)
    boxes = grid_boxes(G)
    scores = rng.permutation(G) / G + 0.5
    gt = [make_anno(boxes)]

    extra = grid_boxes(1) + 41000
    small_bbox = np.array([[50000.0, 0.0, 50100.0, 30.0]])  # 30 px tall
    dtb = np.concatenate([boxes, extra])
    bbox = np.concatenate([make_anno(boxes)['bbox'], small_bbox])
    dt = [make_anno(dtb, scores=np.concatenate([scores, [9.9]]), bbox=bbox)]
    dt_clean = [make_anno(boxes, scores=scores)]

    easy = eval_class(gt, dt, 'car', 0, 2, 0.7)
    easy_clean = eval_class(gt, dt_clean, 'car', 0, 2, 0.7)
    assert abs(map_r40(easy['precision']) - map_r40(easy_clean['precision'])) < 1e-9

    mod = eval_class(gt, dt, 'car', 1, 2, 0.7)
    mod_clean = eval_class(gt, dt_clean, 'car', 1, 2, 0.7)
    assert map_r40(mod['precision']) < map_r40(mod_clean['precision']) - 1.0


def test_occluded_gt_ignored_at_easy_counted_at_hard():
    """occluded=2 gt: out of scope on easy (detection on it isn't FP,
    missing it isn't FN); in scope on hard."""
    G = 60
    rng = np.random.RandomState(5)
    boxes = grid_boxes(G)
    scores = rng.permutation(G) / G + 0.5
    K = 10  # one missed gt in ~60 sits below the R40 grid's resolution
    occ = np.zeros(G + K, np.int64)
    occ[-K:] = 2
    hard_gt = np.concatenate([boxes, grid_boxes(K) + 41000])
    gt = [make_anno(hard_gt, occluded=occ)]

    dt_miss = [make_anno(boxes, scores=scores)]     # occluded gts undetected
    easy = eval_class(gt, dt_miss, 'car', 0, 2, 0.7)
    assert abs(map_r40(easy['precision']) - 100.0) < 1e-9  # not FNs on easy
    hard = eval_class(gt, dt_miss, 'car', 2, 2, 0.7)
    assert map_r40(hard['precision']) < 90.0                # FNs on hard

    # detecting the occluded gts adds no FP on easy either
    dt_hit = [make_anno(hard_gt,
                        scores=np.concatenate([scores, 9.0 + np.arange(K) * 0.01]),
                        occluded=None)]
    easy_hit = eval_class(gt, dt_hit, 'car', 0, 2, 0.7)
    assert abs(map_r40(easy_hit['precision']) - 100.0) < 1e-9


def test_full_report_exact_on_perfect_multi_difficulty():
    """get_official_eval_result end-to-end: perfect detections at mixed
    occlusion levels -> 100.0 on every metric and difficulty."""
    G = 80
    rng = np.random.RandomState(6)
    gt, dt = [], []
    for f in range(3):
        boxes = grid_boxes(G)
        occ = rng.randint(0, 3, G)
        anno = make_anno(boxes, occluded=occ)
        gt.append(anno)
        d = make_anno(boxes, scores=rng.permutation(G) / G + 0.5, occluded=occ)
        dt.append(d)
    _, res = get_official_eval_result(gt, dt, 'Car', use_aos=False)
    for metric in ('bbox', 'bev', '3d'):
        for diff in range(3):
            assert abs(res['Car'][metric][diff] - 100.0) < 1e-9, (metric, diff)
