"""Test config: force CPU backend with 8 virtual devices so multi-chip
sharding tests run anywhere (the reference never had a multi-device test
fixture; see SURVEY.md §4)."""

import os

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

if os.environ.get('EPNET_TEST_TPU', '0') != '1':
    # NB: the axon TPU plugin ignores the JAX_PLATFORMS env var; the config
    # knob is the reliable way to pin tests to the virtual-device CPU backend.
    jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', False)
