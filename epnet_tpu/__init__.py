"""EPNet-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of the EPNet two-stage
3D object detector (LiDAR + image LI-Fusion, consistency-enforcing loss).

Reference implementation studied (not copied): daxiongpro/EPNet, a
PyTorch/CUDA codebase; see SURVEY.md at the repo root for the layer map.
"""

__version__ = '0.1.0'

from .config import Config, load_config  # noqa: F401
