"""Tiny configs + synthetic scenes for fast CPU tests."""

import numpy as np

from epnet_tpu.config import Config


def tiny_config(li_fusion=True, rcnn=True, **over) -> Config:
    cfg = Config().merged({
        'CLS_MEAN_SIZE': ((1.52563191462, 1.62856739989, 3.88311640418),),
        'USE_IOU_BRANCH': False,
        'LI_FUSION': {
            'ENABLED': li_fusion,
            'ADD_Image_Attention': True,
            'IMG_FEATURES_CHANNEL': 32,
            'IMG_CHANNELS': (3, 8, 16, 24, 32),
            'POINT_CHANNELS': (24, 48, 96, 192),
            'DeConv_Reduce': (4, 4, 4, 4),
            'DeConv_Kernels': (2, 4, 8, 16),
            'DeConv_Strides': (2, 4, 8, 16),
        },
        'RPN': {
            'USE_INTENSITY': False,
            'LOC_XZ_FINE': True,
            'NUM_POINTS': 256,
            'LOSS_CLS': 'SigmoidFocalLoss',
            'SA_CONFIG': {
                'NPOINTS': (64, 32, 16, 8),
                'RADIUS': ((0.2, 1.0), (1.0, 2.0), (2.0, 4.0), (4.0, 8.0)),
                'NSAMPLE': ((8, 16), (8, 16), (8, 16), (8, 16)),
                'MLPS': (((8, 8, 12), (8, 8, 12)),
                         ((16, 16, 24), (16, 16, 24)),
                         ((24, 24, 48), (24, 24, 48)),
                         ((48, 48, 96), (48, 48, 96))),
            },
            'FP_MLPS': ((32, 32), (48, 48), (64, 64), (96, 96)),
            'CLS_FC': (32,),
            'REG_FC': (32,),
        },
        'RCNN': {
            'ENABLED': rcnn,
            'ROI_SAMPLE_JIT': True,
            'NUM_POINTS': 64,
            'POOL_EXTRA_WIDTH': 0.2,
            'ROI_PER_IMAGE': 16,
            'HARD_BG_RATIO': 0.8,
            'XYZ_UP_LAYER': (32, 32),
            'SA_CONFIG': {
                'NPOINTS': (32, 16, -1),
                'RADIUS': (0.2, 0.4, 100),
                'NSAMPLE': (16, 16, 16),
                'MLPS': ((32, 32, 32), (32, 32, 48), (48, 48, 64)),
            },
            'CLS_FC': (32, 32),
            'REG_FC': (32, 32),
        },
        'TRAIN': {
            'RPN_PRE_NMS_TOP_N': 128,
            'RPN_POST_NMS_TOP_N': 32,
            'RPN_NMS_THRESH': 0.85,
            'BBOX_AVG_BY_BIN': True,
            'IOU_LOSS_TYPE': 'cls_mask_with_bin',
        },
        'TEST': {
            'RPN_PRE_NMS_TOP_N': 128,
            'RPN_POST_NMS_TOP_N': 16,
            'RPN_NMS_THRESH': 0.8,
        },
    })
    if over:
        cfg = cfg.merged(over)
    return cfg


IMG_H, IMG_W = 32, 64


def synthetic_batch(rng, cfg, batch=2, with_gt=True):
    """Random scene: points in front of a 'camera', a couple of gt cars."""
    N = cfg.RPN.NUM_POINTS
    pts = np.stack([
        rng.uniform(-20, 20, (batch, N)),
        rng.uniform(-1, 2, (batch, N)),
        rng.uniform(1, 69, (batch, N)),
    ], axis=-1).astype(np.float32)
    batch_dict = {
        'pts_input': pts,
        'img': rng.rand(batch, IMG_H, IMG_W, 3).astype(np.float32),
        'pts_origin_xy': np.stack([
            rng.uniform(0, 1279, (batch, N)),
            rng.uniform(0, 383, (batch, N)),
        ], axis=-1).astype(np.float32),
    }
    if with_gt:
        G = 3
        gt = np.stack([
            rng.uniform(-15, 15, (batch, G)),
            rng.uniform(0.8, 1.6, (batch, G)),
            rng.uniform(5, 60, (batch, G)),
            rng.uniform(1.4, 1.7, (batch, G)),
            rng.uniform(1.5, 1.7, (batch, G)),
            rng.uniform(3.5, 4.2, (batch, G)),
            rng.uniform(-np.pi, np.pi, (batch, G)),
        ], axis=-1).astype(np.float32)
        batch_dict['gt_boxes3d'] = gt
        # simple per-point labels: fg if inside any gt (analytic test)
        from epnet_tpu.ops import points_in_boxes3d
        inb = np.asarray(points_in_boxes3d(pts, gt))  # (B, G, N)
        fg = inb.any(axis=1)
        batch_dict['rpn_cls_label'] = fg.astype(np.int32)
        # reg label: offsets to the nearest gt center (only used where fg)
        gi = inb.argmax(axis=1)  # (B, N)
        gsel = np.take_along_axis(gt, gi[..., None], axis=1)  # (B, N, 7)
        reg = gsel.copy()
        reg[..., 0:3] -= pts
        batch_dict['rpn_reg_label'] = reg.astype(np.float32)
    return batch_dict
