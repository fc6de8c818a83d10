"""Test config: force CPU with a virtual 8-device mesh.

The standard JAX substitute for a multi-chip pod in CI
(SURVEY.md §4 'multi-host tests on a CPU mesh').
"""

import os

_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()

# Force CPU: the ambient sitecustomize registers the remote-TPU (axon)
# plugin at interpreter startup and pins jax_platforms via config.update,
# so an env var is not enough — override the config after import. Set
# MARLSNAKE_TEST_PLATFORM to run the suite against real TPU hardware.
import jax  # noqa: E402

jax.config.update('jax_platforms',
                  os.environ.get('MARLSNAKE_TEST_PLATFORM', 'cpu'))

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
