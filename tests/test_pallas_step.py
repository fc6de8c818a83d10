"""Pallas step kernel vs the XLA engine: bit-exact equality (interpret
mode; the compiled kernel runs the identical jaxpr on TPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlsnake_tpu.core import engine
from marlsnake_tpu.core.spawn import (
    SpawnData, spawn_candidates, spawn_data, spawn_pool)
from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.ops.pallas_step import build_pallas_step


def _run_parity(seed, b, steps):
    cfg = EnvConfig(height=10, width=10, num_snakes=2, snake_length=3,
                    num_fruits=2)
    cand = spawn_candidates(10, 10, 3)
    poolj = jnp.asarray(spawn_pool(10, 10, 3, 2))
    sd = spawn_data(10, 10, 3, 2)
    spawn = SpawnData(jnp.asarray(sd.cells))
    reset1 = functools.partial(engine.reset, cfg, spawn)
    states, _ = jax.vmap(reset1)(
        jax.random.split(jax.random.key(seed), b))
    step_xla = jax.jit(jax.vmap(
        functools.partial(engine.step_autoreset, cfg, spawn)))
    step_pl = build_pallas_step(cfg, cand, poolj, env_block=8,
                                interpret=True)
    rng = np.random.default_rng(seed)
    sx = sp = states
    for t in range(steps):
        a = jnp.asarray(rng.integers(0, 3, size=(b, 2)))
        sx, ox = step_xla(sx, a)
        sp, op = step_pl(sp, a)
        for name in ('grid', 'direction', 'head', 'tail', 'ring',
                     'ring_head', 'ring_len', 'alive', 'alive_count',
                     'epi_scores', 'epi_steps', 'epi_fruits', 'epi_kills',
                     'episode_length'):
            np.testing.assert_allclose(
                np.asarray(getattr(sx, name)),
                np.asarray(getattr(sp, name)), atol=1e-5,
                err_msg=f'state.{name} t={t}')
        np.testing.assert_array_equal(
            np.asarray(jax.random.key_data(sx.key)),
            np.asarray(jax.random.key_data(sp.key)), err_msg=f'key t={t}')
        for name in ('obs', 'reward', 'done', 'rank', 'episode_scores',
                     'done_all'):
            np.testing.assert_allclose(
                np.asarray(getattr(ox, name)),
                np.asarray(getattr(op, name)), atol=1e-5,
                err_msg=f'out.{name} t={t}')


@pytest.mark.parametrize('seed', [0])
@pytest.mark.slow
def test_pallas_step_equals_xla_engine(seed):
    _run_parity(seed, b=8, steps=40)


def test_pallas_step_parity_smoke():
    """Short default-suite parity gate (ADVICE r4: the full sweep is
    slow-marked, so a plain ``pytest tests/`` used to skip pallas
    bit-exactness entirely — this keeps a quick cross-section on every
    run; ``--runslow`` still runs the 40-step sweep)."""
    _run_parity(seed=3, b=8, steps=6)


def test_pallas_step_rejects_unsupported_configs():
    cfg = EnvConfig(height=10, width=10, num_snakes=2, snake_length=3,
                    frame_stack=2)
    with pytest.raises(NotImplementedError):
        build_pallas_step(cfg, spawn_candidates(10, 10, 3),
                          jnp.asarray(spawn_pool(10, 10, 3, 2)))
