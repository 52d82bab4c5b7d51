from .kitti_dataset import KittiDataset
from .kitti_rcnn_dataset import KittiRCNNDataset
from .loader import DataLoader

__all__ = ['DataLoader', 'KittiDataset', 'KittiRCNNDataset']
