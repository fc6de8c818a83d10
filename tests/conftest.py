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

# Persistent XLA compilation cache: the suite is compile-dominated on
# CPU, and most programs are identical run to run — warm runs cut the
# wall substantially (measured 2.2x on a representative env compile).
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# tests dir itself: cross-test imports (e.g. test_battle_batch reuses
# test_algo's greedy loop-form oracle) resolve under plain `pytest tests/`
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# --- slow-test gating ----------------------------------------------------
# The heavy tail (2-process gloo cluster, the 8-device dryrun's full
# sharded episodes, the pallas-kernel parity sweep, the masked-evaluator
# reference sweep) costs ~8 of the suite's ~15 minutes. Default runs skip
# it; `pytest --runslow` (CI-full) runs everything.

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        '--runslow', action='store_true', default=False,
        help='also run tests marked slow (2-process cluster, multichip '
             'dryrun, pallas parity, evaluator reference sweep)')


def pytest_configure(config):
    config.addinivalue_line(
        'markers', 'slow: long-running gate, skipped unless --runslow')


def pytest_collection_modifyitems(config, items):
    if config.getoption('--runslow'):
        return
    skip = pytest.mark.skip(reason='slow gate — run with --runslow')
    for item in items:
        if 'slow' in item.keywords:
            item.add_marker(skip)
