"""Shim: tiny configs live in the package so non-test tools can reuse them."""
from epnet_tpu.utils.testing import IMG_H, IMG_W, synthetic_batch, tiny_config  # noqa: F401
