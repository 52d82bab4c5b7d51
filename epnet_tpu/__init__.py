"""EPNet-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of the EPNet two-stage
3D object detector (LiDAR + image LI-Fusion, consistency-enforcing loss).

Reference implementation studied (not copied): daxiongpro/EPNet, a
PyTorch/CUDA codebase; see SURVEY.md at the repo root for the layer map.
"""

__version__ = '0.1.0'

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compile cache: full-scale EPNet programs take tens of
    minutes to compile via the remote TPU compile service; cache them."""
    try:
        import jax

        cache_dir = _os.environ.get(
            'EPNET_JAX_CACHE',
            _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), '.jax_cache'))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()

from .config import Config, load_config  # noqa: F401,E402
