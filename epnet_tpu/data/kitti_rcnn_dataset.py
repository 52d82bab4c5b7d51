"""KITTI preprocessing pipeline for RPN/RCNN training and evaluation.

Rebuild of ``/root/reference/lib/datasets/kitti_rcnn_dataset.py``: the
LI-Fusion sample path (:281-409), the LiDAR-only path with per-point RGB
(:411-544, interpolate_img_by_xy :13-35), GT-paste augmentation
(:590-696), scene augmentation (:698-755), per-point RPN label generation
(:546-576 — the Delaunay ``in_hull`` replaced by the equivalent analytic
rotated-box test), and ragged-gt collate (:1291-1325).

TPU-first deltas:
  * every output is fixed-shape: N points exactly, gt boxes padded to a
    configurable ``max_gt`` CONSTANT (the reference pads to the per-batch
    max, which would trigger an XLA recompile per batch),
  * hot host geometry (point-in-box masks) uses the C++ kernels in
    ``native/`` when built.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np

from ..config import Config
from . import box_np
from .kitti_dataset import PAD_H, PAD_W, KittiDataset
from .object3d import objs_to_boxes3d

MAX_GT_DEFAULT = 50


def interpolate_img_by_xy(img: np.ndarray, xy: np.ndarray, normal_shape) -> np.ndarray:
    """Bilinear fetch of (N, C) pixel features at float (x, y) locations.

    Matches the reference's torch ``grid_sample``-based helper
    (kitti_rcnn_dataset.py:13-35): align_corners normalization against
    ``size - 1``, zero padding outside.
    """
    H, W = img.shape[0], img.shape[1]
    x, y = xy[:, 0], xy[:, 1]
    x0, y0 = np.floor(x), np.floor(y)
    dx, dy = x - x0, y - y0
    out = np.zeros((xy.shape[0], img.shape[2]), np.float32)
    for ix, iy, w in ((x0, y0, (1 - dx) * (1 - dy)), (x0 + 1, y0, dx * (1 - dy)),
                      (x0, y0 + 1, (1 - dx) * dy), (x0 + 1, y0 + 1, dx * dy)):
        inside = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
        xi = np.clip(ix, 0, W - 1).astype(np.int64)
        yi = np.clip(iy, 0, H - 1).astype(np.int64)
        out += img[yi, xi] * (w * inside)[:, None]
    return out


class KittiRCNNDataset(KittiDataset):
    def __init__(self, root_dir: str, cfg: Config, npoints: int = 16384,
                 split: str = 'train', classes: str = 'Car', mode: str = 'TRAIN',
                 random_select: bool = True, logger=None,
                 gt_database_dir: Optional[str] = None,
                 rcnn_eval_roi_dir: Optional[str] = None,
                 rcnn_eval_feature_dir: Optional[str] = None,
                 rcnn_training_roi_dir: Optional[str] = None,
                 rcnn_training_feature_dir: Optional[str] = None,
                 max_gt: int = MAX_GT_DEFAULT,
                 aug_scene_root_dir: Optional[str] = None):
        super().__init__(root_dir=root_dir, split=split)
        self.cfg = cfg
        if classes == 'Car':
            self.classes = ('Background', 'Car')
            scene_sub = 'aug_scene'
        elif classes == 'People':
            self.classes = ('Background', 'Pedestrian', 'Cyclist')
            scene_sub = 'aug_scene_ped'
        elif classes == 'Pedestrian':
            self.classes = ('Background', 'Pedestrian')
            scene_sub = 'aug_scene_ped'
        elif classes == 'Cyclist':
            self.classes = ('Background', 'Cyclist')
            scene_sub = 'aug_scene_cyclist'
        else:
            raise ValueError(f'invalid classes {classes}')
        self.num_class = len(self.classes)
        self.npoints = npoints
        self.mode = mode
        self.random_select = random_select
        self.max_gt = max_gt
        self.logger = logger
        root = aug_scene_root_dir or os.path.join(root_dir, 'KITTI', scene_sub)
        self.aug_label_dir = os.path.join(root, 'training', 'aug_label')
        self.aug_pts_dir = os.path.join(root, 'training', 'rectified_data')
        self.rcnn_eval_roi_dir = rcnn_eval_roi_dir
        self.rcnn_eval_feature_dir = rcnn_eval_feature_dir
        self.rcnn_training_roi_dir = rcnn_training_roi_dir
        self.rcnn_training_feature_dir = rcnn_training_feature_dir

        self.gt_database = None
        if cfg.RPN.ENABLED and gt_database_dir is not None:
            with open(gt_database_dir, 'rb') as f:
                db = pickle.load(f)
            if cfg.GT_AUG_HARD_RATIO > 0:
                easy = [o for o in db if o['points'].shape[0] > 100]
                hard = [o for o in db if o['points'].shape[0] <= 100]
                self.gt_database = [easy, hard]
            else:
                self.gt_database = db

        if cfg.RPN.ENABLED and mode == 'TRAIN':
            self.sample_id_list = self._filter_training_samples()
        else:
            self.sample_id_list = [int(s) for s in self.image_idx_list]

    # ------------------------------------------------------------------
    def _filter_training_samples(self):
        """Drop frames without any target-class object
        (preprocess_rpn_training_data :131-147)."""
        keep = []
        for s in self.image_idx_list:
            sid = int(s)
            if self.filtrate_objects(self.get_label(sid)):
                keep.append(sid)
        if self.logger:
            self.logger.info('filtered %d / %d samples', len(keep),
                             len(self.image_idx_list))
        return keep

    def get_label(self, idx: int):
        if idx < 10000:
            return super().get_label(idx)
        from .object3d import load_label_file
        return load_label_file(os.path.join(self.aug_label_dir, '%06d.txt' % idx))

    def filtrate_objects(self, obj_list):
        """(filtrate_objects :185-206)."""
        whitelist = list(self.classes)
        if self.mode == 'TRAIN' and self.cfg.INCLUDE_SIMILAR_TYPE:
            if 'Car' in whitelist:
                whitelist.append('Van')
            if 'Pedestrian' in whitelist:
                whitelist.append('Person_sitting')
        out = []
        for obj in obj_list:
            if obj.cls_type not in whitelist:
                continue
            if self.mode == 'TRAIN' and self.cfg.PC_REDUCE_BY_RANGE \
                    and not self._in_pc_range(obj.pos):
                continue
            out.append(obj)
        return out

    def _in_pc_range(self, xyz) -> bool:
        r = self.cfg.PC_AREA_SCOPE
        return all(r[i][0] <= xyz[i] <= r[i][1] for i in range(3))

    def get_valid_flag(self, pts_rect, pts_img, pts_depth, img_shape):
        """In-image and in-range mask (get_valid_flag :229-251)."""
        flag = (pts_img[:, 0] >= 0) & (pts_img[:, 0] < img_shape[1]) & \
               (pts_img[:, 1] >= 0) & (pts_img[:, 1] < img_shape[0]) & \
               (pts_depth >= 0)
        if self.cfg.PC_REDUCE_BY_RANGE:
            r = np.asarray(self.cfg.PC_AREA_SCOPE)
            for i in range(3):
                flag &= (pts_rect[:, i] >= r[i][0]) & (pts_rect[:, i] <= r[i][1])
        return flag

    # ------------------------------------------------------------------
    def _stratified_choice(self, pts_rect):
        """Depth-stratified sampling to exactly npoints (:325-342)."""
        n = len(pts_rect)
        if self.npoints < n:
            depth = pts_rect[:, 2]
            far = np.where(depth >= 40.0)[0]
            near = np.where(depth < 40.0)[0]
            take_near = self.npoints - len(far)
            if take_near <= 0:  # degenerate: more far points than budget
                choice = np.random.choice(np.arange(n), self.npoints, replace=False)
            else:
                near_choice = np.random.choice(near, take_near, replace=False)
                choice = np.concatenate([near_choice, far]) if len(far) else near_choice
            np.random.shuffle(choice)
        else:
            choice = np.arange(0, n, dtype=np.int32)
            if self.npoints > n:
                if n == 0:
                    return np.zeros(self.npoints, np.int32)
                extra = np.random.choice(choice, self.npoints - n,
                                         replace=self.npoints - n > n)
                choice = np.concatenate([choice, extra])
            np.random.shuffle(choice)
        return choice

    def generate_rpn_training_labels(self, pts_rect, gt_boxes3d):
        """Per-point seg labels + regression targets (:546-576). Foreground
        membership via the analytic rotated-box test (identical to Delaunay
        in_hull on box corners for convex boxes, and much faster)."""
        cls_label = np.zeros(pts_rect.shape[0], np.int32)
        reg_label = np.zeros((pts_rect.shape[0], 7), np.float32)
        extended = box_np.enlarge_box3d(gt_boxes3d, extra_width=0.2)
        for k in range(gt_boxes3d.shape[0]):
            fg = box_np.points_in_box3d(pts_rect, gt_boxes3d[k])
            cls_label[fg] = 1
            enlarged = box_np.points_in_box3d(pts_rect, extended[k])
            cls_label[np.logical_xor(fg, enlarged)] = -1

            center3d = gt_boxes3d[k][0:3].copy()
            center3d[1] -= gt_boxes3d[k][3] / 2  # true vertical center
            reg_label[fg, 0:3] = center3d - pts_rect[fg]
            reg_label[fg, 3:7] = gt_boxes3d[k][3:7]
        return cls_label, reg_label

    def data_augmentation(self, pts_rect, gt_boxes3d, gt_alpha, mustaug=False):
        """Global scene augmentation (:698-755): rotation (ry restored via
        alpha), scaling, horizontal flip."""
        cfg = self.cfg
        aug_list = cfg.AUG_METHOD_LIST
        enable = 1 - np.random.rand(3)
        if mustaug:
            enable[0] = -1
            enable[1] = -1
        method = []
        if 'rotation' in aug_list and enable[0] < cfg.AUG_METHOD_PROB[0]:
            angle = np.random.uniform(-np.pi / cfg.AUG_ROT_RANGE, np.pi / cfg.AUG_ROT_RANGE)
            pts_rect = box_np.rotate_pc_along_y(pts_rect, angle)
            gt_boxes3d = box_np.rotate_pc_along_y(gt_boxes3d, angle)
            x, z = gt_boxes3d[:, 0], gt_boxes3d[:, 2]
            beta = np.arctan2(z, x)
            gt_boxes3d[:, 6] = np.sign(beta) * np.pi / 2 + gt_alpha - beta
            method.append(['rotation', angle])
        if 'scaling' in aug_list and enable[1] < cfg.AUG_METHOD_PROB[1]:
            scale = np.random.uniform(0.95, 1.05)
            pts_rect = pts_rect * scale
            gt_boxes3d = gt_boxes3d.copy()
            gt_boxes3d[:, 0:6] *= scale
            method.append(['scaling', scale])
        if 'flip' in aug_list and enable[2] < cfg.AUG_METHOD_PROB[2]:
            pts_rect = pts_rect.copy()
            gt_boxes3d = gt_boxes3d.copy()
            pts_rect[:, 0] = -pts_rect[:, 0]
            gt_boxes3d[:, 0] = -gt_boxes3d[:, 0]
            gt_boxes3d[:, 6] = np.sign(gt_boxes3d[:, 6]) * np.pi - gt_boxes3d[:, 6]
            method.append('flip')
        return pts_rect, gt_boxes3d, method

    # ------------------------------------------------------------------
    def apply_gt_aug_to_one_scene(self, sample_id, pts_rect, pts_features,
                                  all_gt_boxes3d):
        """GT-paste augmentation (:590-696): drop sampled objects onto the
        road plane, reject overlaps, carve out original points inside."""
        cfg = self.cfg
        assert self.gt_database is not None
        extra_num = np.random.randint(10, cfg.GT_EXTRA_NUM) if cfg.GT_AUG_RAND_NUM \
            else cfg.GT_EXTRA_NUM
        try_times, cnt = 100, 0
        cur_boxes = all_gt_boxes3d.copy()
        if len(cur_boxes):
            cur_boxes[:, 4] += 0.5
            cur_boxes[:, 5] += 0.5
        src_flag = np.ones(pts_rect.shape[0], np.int32)
        a, b, c, d = self.get_road_plane(sample_id)

        extra_boxes, extra_objs, new_pts, new_feats = [], [], [], []
        while try_times > 0 and cnt <= extra_num:
            try_times -= 1
            if cfg.GT_AUG_HARD_RATIO > 0:
                pool = self.gt_database[0] if np.random.rand() > cfg.GT_AUG_HARD_RATIO \
                    else self.gt_database[1]
                # the reference assumes both pools are populated (real KITTI
                # always has easy+hard objects); on tiny synthetic trees one
                # pool can be empty — fall back to the other instead of
                # aborting the paste loop
                pool = pool or self.gt_database[0] or self.gt_database[1]
            else:
                pool = self.gt_database
            if not pool:
                break
            gd = pool[np.random.randint(0, len(pool))]
            box = gd['gt_box3d'].copy()
            pts = gd['points'].copy()
            feats = np.concatenate(
                [gd['intensity'].reshape(-1, 1), gd['rgb']], axis=1) \
                if 'rgb' in gd else gd['intensity'].reshape(-1, 1)
            # match the caller's feature width: the training path passes
            # intensity+rgb (4), the offline aug CLI intensity only (1) —
            # mirrors the reference's separate aug_one_scene
            # (tools/generate_aug_scene.py:150-214) which drops rgb
            if feats.shape[1] < pts_features.shape[1]:
                raise ValueError(
                    f'gt database entries carry {feats.shape[1]} feature '
                    f'channels but the pipeline needs {pts_features.shape[1]} '
                    '(intensity+rgb); regenerate the gt database with '
                    'tools/generate_gt_database.py under the same config')
            feats = feats[:, :pts_features.shape[1]]
            if cfg.PC_REDUCE_BY_RANGE and not self._in_pc_range(box[0:3]):
                continue
            if len(pts) < 5:
                continue
            # place on the road plane
            cur_h = (-d - a * box[0] - c * box[2]) / b
            dh = box[1] - cur_h
            box[1] -= dh
            pts[:, 1] -= dh
            big = box.copy()
            big[4] += 0.5
            big[5] += 0.5
            cnt += 1
            if len(cur_boxes):
                iou = box_np.boxes_iou3d_cpu(big.reshape(1, 7), cur_boxes)
                if iou.max() >= 1e-8:
                    continue
            carve = box.copy()
            carve[3] += 2.0
            mask = box_np.points_in_boxes3d(pts_rect, carve.reshape(1, 7))[0]
            src_flag[mask] = 0
            new_pts.append(pts)
            new_feats.append(feats)
            cur_boxes = np.concatenate([cur_boxes, big.reshape(1, 7)], axis=0) \
                if len(cur_boxes) else big.reshape(1, 7)
            extra_boxes.append(box.reshape(1, 7))
            extra_objs.append(gd.get('obj'))

        if not new_pts:
            return False, pts_rect, pts_features, None, None
        keep = src_flag == 1
        pts_rect = np.concatenate([pts_rect[keep]] + new_pts, axis=0)
        pts_features = np.concatenate([pts_features[keep]] + new_feats, axis=0)
        return True, pts_rect, pts_features, np.concatenate(extra_boxes, 0), extra_objs

    # ------------------------------------------------------------------
    def __len__(self):
        return len(self.sample_id_list)

    def _maybe_morton_sort(self, info):
        """Sort every per-point array by 2-D Morton code when the model's
        block-local grouping (RPN.BLOCK_LOCAL; see ops/block_local.py) or
        the windowed-FP middle mode (RPN.FP_WINDOW) is on.

        Point order is a loader detail — the reference itself returns an
        arbitrary stratified-shuffle order — so only the *joint* permutation
        matters. Runs after augmentation so the codes reflect final coords.
        """
        if not (self.cfg.RPN.BLOCK_LOCAL or self.cfg.RPN.FP_WINDOW > 0) \
                or 'pts_input' not in info:
            return info
        from ..ops.morton import morton_argsort_np

        perm = morton_argsort_np(info['pts_input'][:, :3])
        n = len(perm)
        for k in ('pts_input', 'pts_rect', 'pts_features', 'pts_origin_xy',
                  'rpn_cls_label', 'rpn_reg_label'):
            if k in info and len(info[k]) == n:
                info[k] = info[k][perm]
        return info

    def __getitem__(self, index):
        cfg = self.cfg
        if cfg.LI_FUSION.ENABLED and cfg.RPN.ENABLED:
            return self._maybe_morton_sort(self.get_rpn_with_li_fusion(index))
        if cfg.RPN.ENABLED:
            return self._maybe_morton_sort(self.get_rpn_sample(index))
        if cfg.RCNN.ENABLED:
            if self.mode == 'TRAIN':
                if cfg.RCNN.ROI_SAMPLE_JIT:
                    return self.get_rcnn_sample_jit(index)
                return self.get_rcnn_training_sample_batch(index)
            return self.get_proposal_from_file(index)
        raise NotImplementedError

    # ------------------------------------------------------------------
    def get_rpn_with_li_fusion(self, index):
        """(:281-409)."""
        cfg = self.cfg
        sample_id = int(self.sample_id_list[index])
        if sample_id >= 10000:
            # reference asserts here too (:294 'unable to use aug data with
            # img align'): pasted clusters have no aligned image pixels, so
            # the train_aug split is LiDAR-only by design
            raise ValueError(
                f'aug-scene sample {sample_id} cannot be used with LI fusion; '
                f'disable LI_FUSION for the train_aug split')
        calib = self.get_calib(sample_id)
        img = self.get_image_rgb_with_normal(sample_id)
        img_shape = self.get_image_shape(sample_id)
        pts_lidar = self.get_lidar(sample_id)
        pts_rect = calib.lidar_to_rect(pts_lidar[:, 0:3])
        pts_intensity = pts_lidar[:, 3]

        pts_img, pts_depth = calib.rect_to_img(pts_rect)
        valid = self.get_valid_flag(pts_rect, pts_img, pts_depth, img_shape)
        pts_rect = pts_rect[valid]
        pts_intensity = pts_intensity[valid]
        pts_origin_xy = pts_img[valid].astype(np.float32)

        choice = self._stratified_choice(pts_rect)
        ret_pts_rect = pts_rect[choice].astype(np.float32)
        ret_pts_intensity = (pts_intensity[choice] - 0.5).astype(np.float32)
        ret_pts_origin_xy = pts_origin_xy[choice]

        pts_features = ret_pts_intensity.reshape(-1, 1)
        info = {'sample_id': sample_id, 'img': img,
                'pts_origin_xy': ret_pts_origin_xy}

        if self.mode == 'TEST':
            info['pts_input'] = np.concatenate([ret_pts_rect, pts_features], axis=1) \
                if cfg.RPN.USE_INTENSITY else ret_pts_rect
            info['pts_rect'] = ret_pts_rect
            info['pts_features'] = pts_features
            return info

        gt_obj_list = self.filtrate_objects(self.get_label(sample_id))
        gt_boxes3d = objs_to_boxes3d(gt_obj_list)
        gt_alpha = np.array([o.alpha for o in gt_obj_list], np.float32)

        aug_pts = ret_pts_rect.copy()
        aug_gt = gt_boxes3d.copy()
        if cfg.AUG_DATA and self.mode == 'TRAIN':
            aug_pts, aug_gt, method = self.data_augmentation(aug_pts, aug_gt, gt_alpha)
            info['aug_method'] = method

        info['pts_input'] = np.concatenate([aug_pts, pts_features], axis=1) \
            if cfg.RPN.USE_INTENSITY else aug_pts
        info['pts_rect'] = aug_pts
        info['pts_features'] = pts_features
        info['gt_boxes3d'] = aug_gt
        if not cfg.RPN.FIXED:
            cls_label, reg_label = self.generate_rpn_training_labels(aug_pts, aug_gt)
            info['rpn_cls_label'] = cls_label
            info['rpn_reg_label'] = reg_label
        return info

    # ------------------------------------------------------------------
    def get_rpn_sample(self, index):
        """LiDAR-only path with optional per-point RGB and GT-paste
        augmentation (:411-544)."""
        cfg = self.cfg
        sample_id = int(self.sample_id_list[index])
        if sample_id < 10000:
            calib = self.get_calib(sample_id)
            img_shape = self.get_image_shape(sample_id)
            pts_lidar = self.get_lidar(sample_id)
            pts_rect = calib.lidar_to_rect(pts_lidar[:, 0:3])
            pts_intensity = pts_lidar[:, 3]
        else:
            calib = self.get_calib(sample_id % 10000)
            img_shape = self.get_image_shape(sample_id % 10000)
            pts_file = os.path.join(self.aug_pts_dir, '%06d.bin' % sample_id)
            aug_pts = np.fromfile(pts_file, dtype=np.float32).reshape(-1, 4)
            pts_rect, pts_intensity = aug_pts[:, 0:3], aug_pts[:, 3]

        if cfg.RPN.USE_RGB or cfg.RCNN.USE_RGB:
            rgb = self.get_image_rgb_with_normal(sample_id % 10000)
            pts_img, _ = calib.rect_to_img(pts_rect)
            pts_rgb = interpolate_img_by_xy(
                rgb, pts_img, np.array([PAD_H, PAD_W], np.float64))
        else:
            pts_rgb = None

        pts_img, pts_depth = calib.rect_to_img(pts_rect)
        valid = self.get_valid_flag(pts_rect, pts_img, pts_depth, img_shape)
        pts_rect = pts_rect[valid]
        pts_intensity = pts_intensity[valid]
        if pts_rgb is not None:
            pts_rgb = pts_rgb[valid]

        # GT-paste augmentation (only sensible without the image stream)
        gt_aug_flag = False
        extra_boxes = extra_objs = None
        if cfg.GT_AUG_ENABLED and self.mode == 'TRAIN' and self.gt_database is not None:
            all_gt = objs_to_boxes3d(
                [o for o in self.get_label(sample_id) if o.cls_type != 'DontCare'])
            if np.random.rand() < cfg.GT_AUG_APPLY_PROB:
                feats = pts_intensity.reshape(-1, 1) if pts_rgb is None \
                    else np.concatenate([pts_intensity.reshape(-1, 1), pts_rgb], 1)
                gt_aug_flag, pts_rect, feats, extra_boxes, extra_objs = \
                    self.apply_gt_aug_to_one_scene(sample_id, pts_rect, feats, all_gt)
                pts_intensity = feats[:, 0]
                if pts_rgb is not None:
                    pts_rgb = feats[:, 1:4]

        choice = self._stratified_choice(pts_rect)
        ret_pts_rect = pts_rect[choice].astype(np.float32)
        ret_pts_intensity = (pts_intensity[choice] - 0.5).astype(np.float32)

        feat_list = [ret_pts_intensity.reshape(-1, 1)]
        if pts_rgb is not None:
            feat_list.append(pts_rgb[choice].astype(np.float32))
        pts_features = np.concatenate(feat_list, axis=1) if len(feat_list) > 1 \
            else feat_list[0]

        info = {'sample_id': sample_id}
        if self.mode == 'TEST':
            info['pts_input'] = np.concatenate([ret_pts_rect, pts_features], 1) \
                if cfg.RPN.USE_INTENSITY else ret_pts_rect
            info['pts_rect'] = ret_pts_rect
            info['pts_features'] = pts_features
            return info

        gt_obj_list = self.filtrate_objects(self.get_label(sample_id))
        gt_boxes3d = objs_to_boxes3d(gt_obj_list)
        gt_alpha = np.array([o.alpha for o in gt_obj_list], np.float32)
        if gt_aug_flag and extra_boxes is not None:
            gt_boxes3d = np.concatenate([gt_boxes3d, extra_boxes], axis=0)
            extra_alpha = np.array(
                [o.alpha if o is not None else 0.0 for o in extra_objs], np.float32)
            gt_alpha = np.concatenate([gt_alpha, extra_alpha])

        aug_pts = ret_pts_rect.copy()
        aug_gt = gt_boxes3d.copy()
        if cfg.AUG_DATA and self.mode == 'TRAIN':
            aug_pts, aug_gt, method = self.data_augmentation(aug_pts, aug_gt, gt_alpha)
            info['aug_method'] = method

        info['pts_input'] = np.concatenate([aug_pts, pts_features], axis=1) \
            if cfg.RPN.USE_INTENSITY else aug_pts
        info['pts_rect'] = aug_pts
        info['pts_features'] = pts_features
        info['gt_boxes3d'] = aug_gt
        if not cfg.RPN.FIXED:
            cls_label, reg_label = self.generate_rpn_training_labels(aug_pts, aug_gt)
            info['rpn_cls_label'] = cls_label
            info['rpn_reg_label'] = reg_label
        return info

    # ------------------------------------------------------------------
    def get_rcnn_sample_jit(self, index):
        """RCNN-online training sample (:1266-1289): rpn features loaded from
        disk, roi sampling happens in-graph."""
        sample_id = int(self.sample_id_list[index])
        rpn_xyz, rpn_features, rpn_intensity, seg_mask = self._load_rpn_features(
            self.rcnn_training_feature_dir, sample_id)
        rois = np.load(os.path.join(self.rcnn_training_roi_dir, '%06d.npy' % sample_id))
        gt_obj_list = self.filtrate_objects(self.get_label(sample_id))
        gt_boxes3d = objs_to_boxes3d(gt_obj_list)
        return {'sample_id': sample_id, 'rpn_xyz': rpn_xyz,
                'rpn_features': rpn_features, 'rpn_intensity': rpn_intensity,
                'seg_mask': seg_mask, 'roi_boxes3d': rois,
                'gt_boxes3d': gt_boxes3d,
                'pts_depth': np.linalg.norm(rpn_xyz, ord=2, axis=1)}

    def get_rcnn_training_sample_batch(self, index):
        """Offline two-phase RCNN training sample (:1062-1209): roi fg/bg
        sampling + noise aug + pooling done on host from dumped features."""
        from .rcnn_offline import build_rcnn_training_sample

        sample_id = int(self.sample_id_list[index])
        return build_rcnn_training_sample(self, sample_id, self.cfg)

    def get_proposal_from_file(self, index):
        """Offline-RCNN eval path (:976-1060): rois from txt + dumped rpn
        features, pooled on host with the C++ roipool."""
        from . import native

        cfg = self.cfg
        sample_id = int(self.image_idx_list[index])
        proposal_file = os.path.join(self.rcnn_eval_roi_dir, '%06d.txt' % sample_id)
        from .object3d import load_label_file
        roi_obj_list = load_label_file(proposal_file)
        rpn_xyz, rpn_features, rpn_intensity, seg_mask = self._load_rpn_features(
            self.rcnn_eval_feature_dir, sample_id)
        rois = objs_to_boxes3d(roi_obj_list)
        roi_scores = np.array([o.score for o in roi_obj_list], np.float32)

        pts_extra = [rpn_intensity.reshape(-1, 1), seg_mask.reshape(-1, 1)] \
            if cfg.RCNN.USE_INTENSITY else [seg_mask.reshape(-1, 1)]
        if cfg.RCNN.USE_DEPTH:
            depth = np.linalg.norm(rpn_xyz, axis=1) / 70.0 - 0.5
            pts_extra.append(depth.reshape(-1, 1))
        feats = np.concatenate(pts_extra + [rpn_features], axis=1)
        big = box_np.enlarge_box3d(rois, cfg.RCNN.POOL_EXTRA_WIDTH)
        pooled, empty = native.roipool3d_cpu(rpn_xyz, feats, big, cfg.RCNN.NUM_POINTS)
        sampled_pts = pooled[..., 0:3]
        # canonical transform
        ctr = rois[:, None, 0:3]
        local = sampled_pts - ctr
        for k in range(rois.shape[0]):
            local[k] = box_np.rotate_pc_along_y(local[k], rois[k, 6])
        pts_input = np.concatenate([local, pooled[..., 3:]], axis=-1)

        info = {'sample_id': sample_id, 'pts_input': pts_input.astype(np.float32),
                'roi_boxes3d': rois, 'roi_scores': roi_scores}
        if self.mode == 'EVAL':
            gt_obj_list = self.filtrate_objects(self.get_label(sample_id))
            info['gt_boxes3d'] = objs_to_boxes3d(gt_obj_list)
        return info

    @staticmethod
    def _load_rpn_features(feature_dir, idx):
        """(get_rpn_features :171-184)."""
        xyz = np.load(os.path.join(feature_dir, '%06d_xyz.npy' % idx))
        feat = np.load(os.path.join(feature_dir, '%06d.npy' % idx))
        inten = np.load(os.path.join(feature_dir, '%06d_intensity.npy' % idx)).reshape(-1)
        seg = np.load(os.path.join(feature_dir, '%06d_seg.npy' % idx)).reshape(-1)
        return xyz, feat, inten, seg

    # ------------------------------------------------------------------
    def collate_batch(self, batch):
        """Fixed-shape batching: gt boxes padded to self.max_gt (the
        reference pads to the per-batch max, :1291-1325 — a recompile per
        batch on TPU)."""
        out = {}
        bs = len(batch)
        for key in batch[0].keys():
            if key in ('gt_boxes3d', 'roi_boxes3d') and \
                    isinstance(batch[0][key], np.ndarray) and batch[0][key].ndim == 2:
                shapes = {b[key].shape for b in batch}
                if key == 'roi_boxes3d' and len(shapes) == 1:
                    # fixed-size roi batches (offline rcnn) stack as-is
                    out[key] = np.stack([b[key] for b in batch], axis=0)
                    continue
                arr = np.zeros((bs, self.max_gt, 7), np.float32)
                for i, b in enumerate(batch):
                    n = min(len(b[key]), self.max_gt)
                    arr[i, :n] = b[key][:n]
                out[key] = arr
            elif isinstance(batch[0][key], np.ndarray):
                out[key] = np.stack([b[key] for b in batch], axis=0)
            else:
                vals = [b[key] for b in batch]
                if isinstance(vals[0], int):
                    out[key] = np.array(vals, np.int32)
                elif isinstance(vals[0], float):
                    out[key] = np.array(vals, np.float32)
                else:
                    out[key] = vals
        return out
