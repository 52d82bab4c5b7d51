#!/usr/bin/env python
"""Build the GT-paste augmentation database.

Rebuild of ``/root/reference/tools/generate_gt_database.py``: crops each
training object's point cluster (xyz + intensity + interpolated RGB) into a
pickle consumed by ``KittiRCNNDataset.apply_gt_aug_to_one_scene``.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data_root', type=str, default='data')
    p.add_argument('--split', type=str, default='train')
    p.add_argument('--classes', type=str, default='Car')
    p.add_argument('--save_dir', type=str, default='data/gt_database')
    args = p.parse_args()

    from epnet_tpu.config import Config
    from epnet_tpu.data import KittiRCNNDataset
    from epnet_tpu.data import box_np
    from epnet_tpu.data.kitti_dataset import PAD_H, PAD_W
    from epnet_tpu.data.kitti_rcnn_dataset import interpolate_img_by_xy

    cfg = Config()
    ds = KittiRCNNDataset(args.data_root, cfg, split=args.split,
                          classes=args.classes, mode='TRAIN')
    class_filter = {'Car': ('Car', 'Van'), 'Pedestrian': ('Pedestrian',),
                    'Cyclist': ('Cyclist',)}[args.classes]

    db = []
    for sid in ds.sample_id_list:
        calib = ds.get_calib(sid)
        pts_lidar = ds.get_lidar(sid)
        pts_rect = calib.lidar_to_rect(pts_lidar[:, 0:3])
        intensity = pts_lidar[:, 3]
        img = ds.get_image_rgb_with_normal(sid)
        pts_img, pts_depth = calib.rect_to_img(pts_rect)
        valid = ds.get_valid_flag(pts_rect, pts_img, pts_depth,
                                  ds.get_image_shape(sid))
        pts_rect, intensity = pts_rect[valid], intensity[valid]
        rgb = interpolate_img_by_xy(img, pts_img[valid],
                                    np.array([PAD_H, PAD_W], np.float64))

        for obj in ds.get_label(sid):
            if obj.cls_type not in class_filter:
                continue
            box = obj.box3d()
            mask = box_np.points_in_box3d(pts_rect, box)
            if mask.sum() == 0:
                continue
            db.append({
                'sample_id': sid,
                'cls_type': obj.cls_type,
                'gt_box3d': box,
                'points': pts_rect[mask].astype(np.float32),
                'intensity': intensity[mask].astype(np.float32),
                'rgb': rgb[mask].astype(np.float32),
                'obj': obj,
            })
        print(f'sample {sid}: database size {len(db)}')

    os.makedirs(args.save_dir, exist_ok=True)
    out = os.path.join(args.save_dir, f'{args.split}_gt_database.pkl')
    with open(out, 'wb') as f:
        pickle.dump(db, f)
    print(f'saved {len(db)} objects to {out}')


if __name__ == '__main__':
    main()
