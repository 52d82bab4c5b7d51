#!/usr/bin/env python
"""Fusion projection debug tool.

Rebuild of ``/root/reference/tools/vis_img.py`` (:85-165): re-projects
LiDAR points onto the image, compares bilinearly-interpolated point RGB
against the true pixels, and writes a scatter visualization — a manual
correctness check of the projection + grid-sample path LI-Fusion depends
on.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--data_root', type=str, default='data')
    p.add_argument('--sample_id', type=int, default=0)
    p.add_argument('--out', type=str, default='output/vis')
    args = p.parse_args()

    from PIL import Image

    from epnet_tpu.config import Config
    from epnet_tpu.data import KittiRCNNDataset
    from epnet_tpu.data.kitti_dataset import PAD_H, PAD_W
    from epnet_tpu.data.kitti_rcnn_dataset import interpolate_img_by_xy

    cfg = Config()
    ds = KittiRCNNDataset(args.data_root, cfg, split='train', classes='Car',
                          mode='EVAL')
    sid = args.sample_id
    calib = ds.get_calib(sid)
    img = ds.get_image_rgb_with_normal(sid)
    img_shape = ds.get_image_shape(sid)
    pts_lidar = ds.get_lidar(sid)
    pts_rect = calib.lidar_to_rect(pts_lidar[:, 0:3])
    pts_img, depth = calib.rect_to_img(pts_rect)
    valid = ds.get_valid_flag(pts_rect, pts_img, depth, img_shape)
    pts_img = pts_img[valid]

    interp = interpolate_img_by_xy(img, pts_img, np.array([PAD_H, PAD_W], np.float64))
    true_px = img[np.clip(pts_img[:, 1].astype(int), 0, PAD_H - 1),
                  np.clip(pts_img[:, 0].astype(int), 0, PAD_W - 1)]
    err = np.abs(interp - true_px).mean()
    print(f'sample {sid}: {valid.sum()} in-image points, '
          f'mean |interp - nearest-pixel| = {err:.4f} (should be small)')

    # paint interpolated point colors back onto a blank canvas
    os.makedirs(args.out, exist_ok=True)
    canvas = np.zeros((PAD_H, PAD_W, 3), np.float32)
    ys = np.clip(pts_img[:, 1].astype(int), 0, PAD_H - 1)
    xs = np.clip(pts_img[:, 0].astype(int), 0, PAD_W - 1)
    canvas[ys, xs] = interp
    # un-normalize for viewing
    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    for name, arr in (('points', canvas), ('image', img)):
        viz = np.clip((arr * std + mean) * 255, 0, 255).astype(np.uint8)
        Image.fromarray(viz).save(os.path.join(args.out, f'{sid:06d}_{name}.png'))
    print(f'wrote visualizations to {args.out}')


if __name__ == '__main__':
    main()
