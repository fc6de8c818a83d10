"""Scaling-efficiency measurement on the virtual CPU mesh."""

import jax
import pytest

from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.parallel.distributed import scaling_efficiency


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason='needs 8 virtual devices')
def test_scaling_efficiency_runs():
    cfg = EnvConfig(height=10, width=10, num_snakes=2, snake_length=3)
    out = scaling_efficiency(cfg, envs_per_device=16, num_steps=8)
    assert out['devices'] == 8
    assert out['single'] > 0 and out['full'] > 0
    # on a host-CPU mesh true scaling isn't expected; just sanity bounds
    assert 0 < out['efficiency'] < 10
