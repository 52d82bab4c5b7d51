#!/usr/bin/env python
"""Offline scene augmentation: paste gt-database objects into training
scenes on the road plane and write rectified ``.bin`` clouds + aug labels
with sample ids >= 10000.

Rebuild of ``/root/reference/tools/generate_aug_scene.py`` (aug_one_scene
:150, generate_aug_scene :286); outputs feed the ``aug_label_dir`` /
``aug_pts_dir`` paths of ``KittiRCNNDataset`` and the ``train_aug`` split.
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
    p.add_argument('--gt_database', type=str,
                   default='data/gt_database/train_gt_database.pkl')
    p.add_argument('--save_dir', type=str, default=None)
    p.add_argument('--aug_times', type=int, default=4)
    p.add_argument('--extra_num', type=int, default=15)
    p.add_argument('--seed', type=int, default=1024)
    args = p.parse_args()
    np.random.seed(args.seed)

    from epnet_tpu.config import Config
    from epnet_tpu.data import KittiRCNNDataset
    from epnet_tpu.data import box_np

    cfg = Config().merged({'GT_AUG_ENABLED': True,
                           'GT_EXTRA_NUM': args.extra_num,
                           'GT_AUG_HARD_RATIO': 0.6})
    ds = KittiRCNNDataset(args.data_root, cfg, split=args.split,
                          classes=args.classes, mode='TRAIN',
                          gt_database_dir=args.gt_database)

    sub = {'Car': 'aug_scene', 'Pedestrian': 'aug_scene_ped',
           'Cyclist': 'aug_scene_cyclist'}[args.classes]
    root = args.save_dir or os.path.join(args.data_root, 'KITTI', sub, 'training')
    label_dir = os.path.join(root, 'aug_label')
    pts_dir = os.path.join(root, 'rectified_data')
    os.makedirs(label_dir, exist_ok=True)
    os.makedirs(pts_dir, exist_ok=True)

    new_ids = []
    for t in range(args.aug_times):
        for sid in ds.sample_id_list:
            calib = ds.get_calib(sid)
            pts_lidar = ds.get_lidar(sid)
            pts_rect = calib.lidar_to_rect(pts_lidar[:, 0:3])
            intensity = pts_lidar[:, 3]
            all_objs = [o for o in ds.get_label(sid) if o.cls_type != 'DontCare']
            all_boxes = np.stack([o.box3d() for o in all_objs], 0) \
                if all_objs else np.zeros((0, 7), np.float32)

            ok, pts_rect2, feats2, extra_boxes, extra_objs = \
                ds.apply_gt_aug_to_one_scene(sid, pts_rect,
                                             intensity.reshape(-1, 1), all_boxes)
            if not ok:
                continue
            new_id = 10000 * (t + 1) + sid
            new_ids.append(new_id)
            out = np.concatenate([pts_rect2.astype(np.float32),
                                  feats2[:, 0:1].astype(np.float32)], axis=1)
            out.tofile(os.path.join(pts_dir, '%06d.bin' % new_id))

            with open(os.path.join(label_dir, '%06d.txt' % new_id), 'w') as f:
                for o in ds.get_label(sid):
                    f.write(o.src if o.src.endswith('\n') else o.src + '\n')
                for k, box in enumerate(extra_boxes):
                    o = extra_objs[k]
                    x, z = box[0], box[2]
                    beta = np.arctan2(z, x)
                    alpha = -np.sign(beta) * np.pi / 2 + beta + box[6]
                    f.write('%s 0.00 0 %.4f %.2f %.2f %.2f %.2f '
                            '%.4f %.4f %.4f %.4f %.4f %.4f %.4f\n' % (
                                o.cls_type if o is not None else args.classes,
                                alpha, *(o.box2d if o is not None else (0, 0, 50, 50)),
                                box[3], box[4], box[5], box[0], box[1], box[2], box[6]))
        print(f'pass {t}: {len(new_ids)} augmented scenes so far')

    split_path = os.path.join(args.data_root, 'KITTI', 'ImageSets', 'train_aug.txt')
    with open(split_path, 'w') as f:
        for sid in ds.sample_id_list:
            f.write('%06d\n' % sid)
        for nid in new_ids:
            f.write('%06d\n' % nid)
    print(f'wrote {split_path} with {len(ds.sample_id_list) + len(new_ids)} samples')


if __name__ == '__main__':
    main()
