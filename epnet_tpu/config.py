"""Immutable, hashable configuration tree for EPNet-TPU.

The reference keeps a mutable global EasyDict (``/root/reference/lib/config.py:4-209``)
that every module imports; YAML experiment files are merged in with strict
key-existence and type checking (``lib/config.py:212-248``) and the CLI can
override dotted paths (``lib/config.py:251-270``).

Here the same three-level semantics (defaults <- YAML <- CLI overrides) are
kept, but the tree is a frozen dataclass pytree: hashable, so a ``Config`` can
be a jit-static argument, and impossible to mutate mid-run. Field names mirror
the reference's YAML keys so the reference experiment files load unchanged.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, replace
from typing import Any, Optional, Tuple


def _tup(x):
    """Recursively convert lists to tuples so the config stays hashable."""
    if isinstance(x, (list, tuple)):
        return tuple(_tup(v) for v in x)
    return x


@dataclass(frozen=True)
class LIFusionConfig:
    """LI-Fusion module config (reference ``lib/config.py:36-45``)."""

    ENABLED: bool = False
    IMG_FEATURES_CHANNEL: int = 128
    ADD_Image_Attention: bool = False
    IMG_CHANNELS: Tuple[int, ...] = (3, 64, 128, 256, 512)
    POINT_CHANNELS: Tuple[int, ...] = (96, 256, 512, 1024)
    DeConv_Reduce: Tuple[int, ...] = (16, 16, 16, 16)
    DeConv_Kernels: Tuple[int, ...] = (2, 4, 8, 16)
    DeConv_Strides: Tuple[int, ...] = (2, 4, 8, 16)


@dataclass(frozen=True)
class SAConfigRPN:
    """PointNet++ MSG set-abstraction config (reference ``lib/config.py:70-78``)."""

    NPOINTS: Tuple[int, ...] = (4096, 1024, 256, 64)
    RADIUS: Tuple[Tuple[float, ...], ...] = ((0.1, 0.5), (0.5, 1.0), (1.0, 2.0), (2.0, 4.0))
    NSAMPLE: Tuple[Tuple[int, ...], ...] = ((16, 32), (16, 32), (16, 32), (16, 32))
    MLPS: Tuple[Tuple[Tuple[int, ...], ...], ...] = (
        ((16, 16, 32), (32, 32, 64)),
        ((64, 64, 128), (64, 96, 128)),
        ((128, 196, 256), (128, 196, 256)),
        ((256, 256, 512), (256, 384, 512)),
    )


@dataclass(frozen=True)
class RPNConfig:
    """Reference ``lib/config.py:49-93``."""

    ENABLED: bool = True
    FIXED: bool = False
    USE_INTENSITY: bool = True
    USE_RGB: bool = False
    LOC_XZ_FINE: bool = False
    LOC_SCOPE: float = 3.0
    LOC_BIN_SIZE: float = 0.5
    NUM_HEAD_BIN: int = 12
    BACKBONE: str = 'pointnet2_msg'
    USE_BN: bool = True
    NUM_POINTS: int = 16384
    # TPU extension: 'fps' (reference behaviour) or 'random' (the input cloud
    # is already a shuffled random subset; skipping stage-1 FPS trades a
    # little coverage uniformity for ~25ms/step on v5e)
    SAMPLING: str = 'fps'
    # TPU extension: partitioned FPS — run FPS independently on this many
    # interleaved index-slices (uniform random subsets under the loader's
    # shuffle), dividing the sequential selection depth by the same factor.
    # 1 = exact reference FPS. Quality ablation: tools/sampling_ablation.py.
    FPS_GROUPS: int = 1
    # TPU extension: block-local SA grouping over Morton-sorted clouds
    # (ops/block_local.py). When enabled the loader sorts each scene by
    # 2-D Morton code (ops/morton.py) and the big SA stages replace the
    # (B, M, N) distance field + ~1M-row gather with contiguous candidate
    # windows + in-VMEM one-hot gathers. Approx-family policy: must be
    # train/eval-consistent like FPS_GROUPS / the approx queries.
    BLOCK_LOCAL: bool = False
    BLOCK_WINDOW: int = 1024
    BLOCK_C: int = 128
    # TPU extension (round 5): windowed-FP middle mode. Morton-sort the
    # cloud AND the FPS picks (so every level stays spatially sorted) while
    # SA grouping stays DENSE — only the FP decoder's windowed 3-NN
    # interpolation engages, with this window width (0 = off). The round-5
    # paired-seed campaign collapsed full BLOCK_LOCAL (SA windows were the
    # first cut, W=256 FP windows the second — ROADMAP.md); this mode keeps
    # the exact SA neighbourhoods and widens the FP window so each unknown
    # block of FP_UBLOCK points interpolates from FP_WINDOW consecutive
    # knowns instead of 256. Approx-family policy: train/eval-consistent.
    FP_WINDOW: int = 0
    FP_UBLOCK: int = 256
    SA_CONFIG: SAConfigRPN = field(default_factory=SAConfigRPN)
    FP_MLPS: Tuple[Tuple[int, ...], ...] = ((128, 128), (256, 256), (512, 512), (512, 512))
    CLS_FC: Tuple[int, ...] = (128,)
    REG_FC: Tuple[int, ...] = (128,)
    DP_RATIO: float = 0.5
    LOSS_CLS: str = 'DiceLoss'
    FG_WEIGHT: float = 15
    FOCAL_ALPHA: Tuple[float, ...] = (0.25, 0.75)
    FOCAL_GAMMA: float = 2.0
    REG_LOSS_WEIGHT: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    LOSS_WEIGHT: Tuple[float, ...] = (1.0, 1.0)
    NMS_TYPE: str = 'normal'  # normal | rotate
    SCORE_THRESH: float = 0.3

    @property
    def per_loc_bin_num(self) -> int:
        return int(self.LOC_SCOPE / self.LOC_BIN_SIZE) * 2

    @property
    def reg_channel(self) -> int:
        # Layout mirrors reference lib/net/rpn.py:35-40.
        n = self.per_loc_bin_num
        c = n * 4 if self.LOC_XZ_FINE else n * 2
        return c + self.NUM_HEAD_BIN * 2 + 3 + 1  # +1 = y offset


@dataclass(frozen=True)
class SAConfigRCNN:
    """Reference ``lib/config.py:130-136``."""

    NPOINTS: Tuple[int, ...] = (128, 32, -1)
    RADIUS: Tuple[float, ...] = (0.2, 0.4, 100)
    NSAMPLE: Tuple[int, ...] = (64, 64, 64)
    MLPS: Tuple[Tuple[int, ...], ...] = ((128, 128, 128), (128, 128, 256), (256, 256, 512))


@dataclass(frozen=True)
class RCNNConfig:
    """Reference ``lib/config.py:96-158``."""

    ENABLED: bool = False
    USE_RPN_FEATURES: bool = True
    USE_MASK: bool = True
    MASK_TYPE: str = 'seg'
    USE_INTENSITY: bool = False
    USE_DEPTH: bool = True
    USE_SEG_SCORE: bool = False
    ROI_SAMPLE_JIT: bool = False
    ROI_FG_AUG_TIMES: int = 10
    REG_AUG_METHOD: str = 'multiple'  # multiple | single | normal
    POOL_EXTRA_WIDTH: float = 1.0
    USE_RGB: bool = False
    LOC_SCOPE: float = 1.5
    LOC_BIN_SIZE: float = 0.5
    NUM_HEAD_BIN: int = 9
    LOC_Y_BY_BIN: bool = False
    LOC_Y_SCOPE: float = 0.5
    LOC_Y_BIN_SIZE: float = 0.25
    SIZE_RES_ON_ROI: bool = False
    USE_BN: bool = False
    DP_RATIO: float = 0.0
    BACKBONE: str = 'pointnet'
    # windowed block-local SA over the (spatially-ordered) roipool output;
    # valid only when the loader Morton-sorts clouds (RPN.BLOCK_LOCAL) so
    # the first-hit pooling preserves spatial order (ops/sa_fused.py
    # fused_point_mlp_max_win, ops/block_local.py block_local_window_query)
    BLOCK_LOCAL: bool = False
    BLOCK_WINDOW: int = 256
    BLOCK_C: int = 32
    XYZ_UP_LAYER: Tuple[int, ...] = (128, 128)
    NUM_POINTS: int = 512
    SA_CONFIG: SAConfigRCNN = field(default_factory=SAConfigRCNN)
    CLS_FC: Tuple[int, ...] = (256, 256)
    REG_FC: Tuple[int, ...] = (256, 256)
    LOSS_CLS: str = 'BinaryCrossEntropy'
    FOCAL_ALPHA: Tuple[float, ...] = (0.25, 0.75)
    FOCAL_GAMMA: float = 2.0
    CLS_WEIGHT: Tuple[float, ...] = (1.0, 1.0, 1.0)
    CLS_FG_THRESH: float = 0.6
    CLS_BG_THRESH: float = 0.45
    CLS_BG_THRESH_LO: float = 0.05
    REG_FG_THRESH: float = 0.55
    FG_RATIO: float = 0.5
    ROI_PER_IMAGE: int = 64
    HARD_BG_RATIO: float = 0.6
    IOU_LOSS_TYPE: str = 'raw'
    IOU_ANGLE_POWER: int = 1
    SCORE_THRESH: float = 0.3
    NMS_THRESH: float = 0.1

    @property
    def per_loc_bin_num(self) -> int:
        return int(self.LOC_SCOPE / self.LOC_BIN_SIZE) * 2

    @property
    def loc_y_bin_num(self) -> int:
        return int(self.LOC_Y_SCOPE / self.LOC_Y_BIN_SIZE) * 2

    @property
    def reg_channel(self) -> int:
        # Layout mirrors reference lib/net/rcnn_net.py:78-81.
        c = self.per_loc_bin_num * 4 + self.NUM_HEAD_BIN * 2 + 3
        c += 1 if not self.LOC_Y_BY_BIN else self.loc_y_bin_num * 2
        return c

    @property
    def input_channel(self) -> int:
        # xyz + mask + depth (+ intensity); reference lib/net/rcnn_net.py:22.
        return 3 + int(self.USE_INTENSITY) + int(self.USE_MASK) + int(self.USE_DEPTH)


@dataclass(frozen=True)
class TrainConfig:
    """Reference ``lib/config.py:161-199``."""

    SPLIT: str = 'train'
    VAL_SPLIT: str = 'smallval'
    LR: float = 0.002
    LR_CLIP: float = 0.00001
    LR_DECAY: float = 0.5
    DECAY_STEP_LIST: Tuple[int, ...] = (50, 100, 150, 200, 250, 300)
    LR_WARMUP: bool = False
    WARMUP_MIN: float = 0.0002
    WARMUP_EPOCH: int = 5
    BN_MOMENTUM: float = 0.9
    BN_DECAY: float = 0.5
    BNM_CLIP: float = 0.01
    BN_DECAY_STEP_LIST: Tuple[int, ...] = (50, 100, 150, 200, 250, 300)
    OPTIMIZER: str = 'adam'
    WEIGHT_DECAY: float = 0.0
    MOMENTUM: float = 0.9
    MOMS: Tuple[float, ...] = (0.95, 0.85)
    DIV_FACTOR: float = 10.0
    PCT_START: float = 0.4
    GRAD_NORM_CLIP: float = 1.0
    RPN_PRE_NMS_TOP_N: int = 12000
    RPN_POST_NMS_TOP_N: int = 2048
    RPN_NMS_THRESH: float = 0.85
    RPN_DISTANCE_BASED_PROPOSE: bool = True
    RPN_TRAIN_WEIGHT: float = 1.0
    RCNN_TRAIN_WEIGHT: float = 1.0
    CE_WEIGHT: float = 5.0
    IOU_LOSS_TYPE: str = 'cls_mask_with_bin'
    BBOX_AVG_BY_BIN: bool = True
    RY_WITH_BIN: bool = False


@dataclass(frozen=True)
class TestConfig:
    """Reference ``lib/config.py:201-209``."""

    SPLIT: str = 'val'
    RPN_PRE_NMS_TOP_N: int = 9000
    RPN_POST_NMS_TOP_N: int = 300
    RPN_NMS_THRESH: float = 0.7
    RPN_DISTANCE_BASED_PROPOSE: bool = True
    BBOX_AVG_BY_BIN: bool = True
    RY_WITH_BIN: bool = False


@dataclass(frozen=True)
class Config:
    """Top-level config. Defaults mirror reference ``lib/config.py:8-209``."""

    TAG: str = 'default'
    CLASSES: str = 'Car'
    INCLUDE_SIMILAR_TYPE: bool = False
    AUG_DATA: bool = True
    AUG_METHOD_LIST: Tuple[str, ...] = ('rotation', 'scaling', 'flip')
    AUG_METHOD_PROB: Tuple[float, ...] = (0.5, 0.5, 0.5)
    AUG_ROT_RANGE: float = 18
    GT_AUG_ENABLED: bool = False
    GT_EXTRA_NUM: int = 15
    GT_AUG_RAND_NUM: bool = False
    GT_AUG_APPLY_PROB: float = 0.75
    GT_AUG_HARD_RATIO: float = 0.6
    PC_REDUCE_BY_RANGE: bool = True
    PC_AREA_SCOPE: Tuple[Tuple[float, float], ...] = ((-40, 40), (-1, 3), (0, 70.4))
    CLS_MEAN_SIZE: Tuple[Tuple[float, ...], ...] = ((1.52, 1.63, 3.88),)
    USE_IOU_BRANCH: bool = False
    # TPU extension (not in the reference): run conv/MLP matmuls in bfloat16
    # (params + losses + geometry stay f32). ~2x MXU throughput.
    MIXED_PRECISION: bool = False
    # TPU extension: force exact (True) or approx_max_k/approx_min_k (False)
    # neighbour queries regardless of backend; None keeps the per-backend
    # default (exact off-TPU, approx on TPU). The parity recipe pins True.
    # Third level 'residual' (round 5): keep the block-local grouped SA/FP
    # paths but run every residual query op exact — the blanket approx
    # policy and block-local's Morton sort COLLAPSE together (AP campaign,
    # ROADMAP.md). Applied by the train/eval CLIs and __graft_entry__ via
    # ops.pointops.apply_query_policy(cfg) BEFORE tracing (it is module
    # state baked in at trace time, not a traced value).
    EXACT_QUERIES: Optional[bool] = None  # True | False | 'residual' | None
    LI_FUSION: LIFusionConfig = field(default_factory=LIFusionConfig)
    RPN: RPNConfig = field(default_factory=RPNConfig)
    RCNN: RCNNConfig = field(default_factory=RCNNConfig)
    TRAIN: TrainConfig = field(default_factory=TrainConfig)
    TEST: TestConfig = field(default_factory=TestConfig)

    @property
    def num_classes(self) -> int:
        """Including background (dataset classes tuple length)."""
        return 3 if self.CLASSES == 'People' else 2

    # ------------------------------------------------------------------
    def get(self, mode: str):
        """cfg['TRAIN'] / cfg['TEST'] style lookup used by the proposal layer."""
        if mode == 'TRAIN':
            return self.TRAIN
        if mode in ('TEST', 'EVAL'):
            return self.TEST
        raise KeyError(mode)

    def asdict(self) -> dict:
        return dataclasses.asdict(self)

    # ------------------------------------------------------------------
    def merged(self, updates: dict) -> 'Config':
        """Strictly merge a nested dict (e.g. parsed YAML) into this config.

        Same semantics as the reference's ``_merge_a_into_b``
        (``lib/config.py:221-248``): unknown keys raise, and scalar types must
        match (int->float promotion is allowed, like numpy casting there).
        """
        return _merge(self, updates)

    def with_overrides(self, kv_pairs) -> 'Config':
        """Dotted-path overrides: ``[('RPN.LOC_SCOPE', '3.0'), ...]``.

        Mirrors ``cfg_from_list`` (``lib/config.py:251-270``).
        """
        from ast import literal_eval

        cfg = self
        for k, v in kv_pairs:
            if isinstance(v, str):
                try:
                    v = literal_eval(v)
                except (ValueError, SyntaxError):
                    pass  # keep as string literal
            parts = k.split('.')
            nested: dict = {parts[-1]: v}
            for p in reversed(parts[:-1]):
                nested = {p: nested}
            cfg = cfg.merged(nested)
        return cfg


def _merge(node, updates: dict):
    if not dataclasses.is_dataclass(node):
        raise TypeError(f'cannot merge into non-dataclass {node!r}')
    valid = {f.name: f for f in fields(node)}
    changes = {}
    for k, v in updates.items():
        if k not in valid:
            raise KeyError(f'{k} is not a valid config key')
        old = getattr(node, k)
        if dataclasses.is_dataclass(old):
            if not isinstance(v, dict):
                raise ValueError(f'config key {k} expects a mapping, got {type(v)}')
            changes[k] = _merge(old, v)
        else:
            v = _tup(v)
            if k == 'EXACT_QUERIES' and v == 'residual':
                # tri-state key: True / False / 'residual' (block-local
                # paths on, residual ops exact — ops/pointops.py)
                changes[k] = v
                continue
            if old is not None and v is not None:
                # strict-ish type check with numeric promotion
                if isinstance(old, bool) != isinstance(v, bool):
                    raise ValueError(f'type mismatch for config key {k}: {type(old)} vs {type(v)}')
                if isinstance(old, float) and isinstance(v, int):
                    v = float(v)
                if isinstance(old, tuple) != isinstance(v, tuple):
                    raise ValueError(f'type mismatch for config key {k}: {type(old)} vs {type(v)}')
                if not isinstance(old, tuple) and type(old) is not type(v):
                    raise ValueError(f'type mismatch for config key {k}: {type(old)} vs {type(v)}')
            changes[k] = v
    return replace(node, **changes)


def load_config(yaml_file: Optional[str] = None, overrides=None) -> Config:
    """defaults <- (optional ``_BASE_`` chain) <- YAML file <- CLI overrides."""
    import os

    cfg = Config()

    def apply(path):
        nonlocal cfg
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f) or {}
        base = data.pop('_BASE_', None)
        if base:
            apply(os.path.join(os.path.dirname(path), base))
        if data:
            cfg = cfg.merged(data)

    if yaml_file is not None:
        apply(yaml_file)
    if overrides:
        cfg = cfg.with_overrides(overrides)
    return cfg


def save_config(cfg: Config, logger=None, pre: str = 'cfg') -> None:
    """Dump every key like the reference's ``save_config_to_file``."""
    emit = logger.info if logger is not None else print
    def rec(node, prefix):
        for f in fields(node):
            val = getattr(node, f.name)
            if dataclasses.is_dataclass(val):
                emit(f'\n{prefix}.{f.name} = edict()')
                rec(val, f'{prefix}.{f.name}')
            else:
                emit(f'{prefix}.{f.name}: {val}')
    rec(cfg, pre)
