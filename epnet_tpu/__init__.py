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


def _select_prng_impl():
    """Dropout/sampling PRNG implementation.

    The default threefry2x32 generates random bits with long u32
    elementwise chains that XLA then CLONES into every consumer fusion —
    the optimized train-step HLO carries ~6 copies of each threefry round
    at the (B, 16384, 128) dropout-mask shapes (~12G u32 VPU ops/step).
    'rbg' uses the hardware RngBitGenerator: one op per draw, same
    distributions, different (still deterministic per-key) streams.
    EPNET_RNG_IMPL ∈ {threefry2x32, rbg, unsafe_rbg} overrides.
    """
    try:
        import jax

        impl = _os.environ.get('EPNET_RNG_IMPL')
        if impl:
            jax.config.update('jax_default_prng_impl', impl)
    except Exception:  # pragma: no cover
        pass


_enable_compilation_cache()
_select_prng_impl()

from .config import Config, load_config  # noqa: F401,E402
