"""Raw KITTI object-detection file I/O (host-side).

Same layout/conventions as ``/root/reference/lib/datasets/kitti_dataset.py``:
velodyne ``.bin`` as (N, 4) float32 (:69-72), images RGB-normalized with
ImageNet stats and zero-padded to 384x1280 (:37-57), calib/label/plane
parsers (:74-97).
"""

from __future__ import annotations

import os

import numpy as np

from .calibration import Calibration
from .object3d import load_label_file

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
PAD_H, PAD_W = 384, 1280


class KittiDataset:
    def __init__(self, root_dir: str, split: str = 'train'):
        self.split = split
        is_test = split == 'test'
        self.imageset_dir = os.path.join(root_dir, 'KITTI', 'object',
                                         'testing' if is_test else 'training')
        split_file = os.path.join(root_dir, 'KITTI', 'ImageSets', split + '.txt')
        with open(split_file) as f:
            self.image_idx_list = [x.strip() for x in f.readlines() if x.strip()]
        self.num_sample = len(self.image_idx_list)

        self.image_dir = os.path.join(self.imageset_dir, 'image_2')
        self.lidar_dir = os.path.join(self.imageset_dir, 'velodyne')
        self.calib_dir = os.path.join(self.imageset_dir, 'calib')
        self.label_dir = os.path.join(self.imageset_dir, 'label_2')
        self.plane_dir = os.path.join(self.imageset_dir, 'planes')

    def get_lidar(self, idx: int) -> np.ndarray:
        path = os.path.join(self.lidar_dir, '%06d.bin' % idx)
        return np.fromfile(path, dtype=np.float32).reshape(-1, 4)

    def get_image_rgb_with_normal(self, idx: int) -> np.ndarray:
        """(384, 1280, 3) float32, ImageNet-normalized, zero-padded.

        PNG inflate dominates the host loader's per-sample cost (~31 of
        ~68 ms, tools/profile_loader_breakdown.py). ``EPNET_IMG_CACHE=dir``
        caches the decoded uint8 pixels as .npy after the first epoch
        (~1.5 MB/image; the KITTI train split is ~11 GB decoded) so
        steady-state epochs pay one mmap-read + the cheap normalize
        instead of the inflate. Normalization stays at f32 host-side to
        keep the model input contract unchanged."""
        import os as _os

        from PIL import Image

        path = os.path.join(self.image_dir, '%06d.png' % idx)
        cache_root = _os.environ.get('EPNET_IMG_CACHE', '')
        raw = None
        if cache_root:
            cpath = os.path.join(cache_root, '%06d.npy' % idx)
            if os.path.exists(cpath):
                raw = np.load(cpath)
        if raw is None:
            raw = np.asarray(Image.open(path).convert('RGB'), np.uint8)
            if cache_root:
                os.makedirs(cache_root, exist_ok=True)
                tmp = cpath + '.tmp.%d' % _os.getpid()
                with open(tmp, 'wb') as f:
                    np.save(f, raw)  # explicit handle: np.save would
                    # otherwise append .npy to the tmp name
                os.replace(tmp, cpath)  # atomic for concurrent workers
        im = raw.astype(np.float32) / 255.0
        im = (im - IMAGENET_MEAN) / IMAGENET_STD
        out = np.zeros((PAD_H, PAD_W, 3), np.float32)
        out[:im.shape[0], :im.shape[1]] = im[:PAD_H, :PAD_W]
        return out

    def get_image_shape(self, idx: int):
        from PIL import Image

        with Image.open(os.path.join(self.image_dir, '%06d.png' % idx)) as im:
            w, h = im.size
        return h, w, 3

    def get_calib(self, idx: int) -> Calibration:
        return Calibration(os.path.join(self.calib_dir, '%06d.txt' % idx))

    def get_label(self, idx: int):
        return load_label_file(os.path.join(self.label_dir, '%06d.txt' % idx))

    def get_road_plane(self, idx: int) -> np.ndarray:
        with open(os.path.join(self.plane_dir, '%06d.txt' % idx)) as f:
            lines = f.readlines()
        plane = np.asarray([float(v) for v in lines[3].split()])
        if plane[1] > 0:  # normal faces up in rect coords
            plane = -plane
        return plane / np.linalg.norm(plane[0:3])
