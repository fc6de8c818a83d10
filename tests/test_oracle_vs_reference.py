"""Golden-trajectory validation: oracle (ref-RNG mode) vs the ACTUAL
reference implementation executed under a fake-gym shim.

Both consume the same global ``np.random`` stream (spawn permutation order
+ fruit randint draws), so under a fixed seed the full trajectories —
grids, observations, rewards, dones, episodic stats — must match
bit-exactly. Combined with test_engine_vs_oracle.py this closes the chain:
reference == oracle == TPU engine.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from marlsnake_tpu.core import types as T
from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.oracle import OracleEnv


def canon_oracle_grid(grid):
    """Re-encode the oracle's bit-packed cells (type | owner<<4) into the
    reference's decimal packing (type + 10*owner) so grids compare
    bit-exactly — the packings are bijective re-encodings of the same
    (type, owner) state."""
    return T.cell_type(grid) + 10 * T.cell_owner(grid)

try:
    from ref_shim import load_reference_snake_env
    RefSnakeEnv = load_reference_snake_env()
    HAVE_REF = True
except Exception:  # reference tree not mounted
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason='reference repo not available')


CASES = [
    dict(height=10, width=10, num_snakes=2, snake_length=3, num_fruits=2),
    dict(height=20, width=20, num_snakes=4, snake_length=3, num_fruits=3),
    dict(height=20, width=20, num_snakes=4, snake_length=5, num_fruits=3,
         vision_range=5, frame_stack=2),
    dict(height=12, width=12, num_snakes=4, snake_length=3, num_fruits=2,
         observer='human'),
    dict(height=14, width=14, num_snakes=6, snake_length=3, num_fruits=5),
    dict(height=9, width=15, num_snakes=3, snake_length=4, num_fruits=1),
]


def run_reference(params, seed, steps, actions_list):
    np.random.seed(seed)
    kwargs = dict(params)
    nf = kwargs.pop('num_fruits')
    env = RefSnakeEnv(num_fruits=nf, **kwargs)
    obs = env.reset()
    traj = [dict(obs=np.array(obs), grid=env.grid.copy())]
    for t in range(steps):
        obs, rews, dones, info = env.step(list(actions_list[t]))
        traj.append(dict(obs=np.array(obs), grid=env.grid.copy(),
                         rews=list(rews), dones=list(dones),
                         info={k: np.array(v) for k, v in info.items()}))
        if all(dones):
            break
    return traj


def run_oracle(params, seed, steps, actions_list):
    cfg = EnvConfig(**params)
    oracle = OracleEnv(cfg, rng_mode='ref')
    np.random.seed(seed)
    obs = oracle.reset()
    traj = [dict(obs=np.array(obs), grid=canon_oracle_grid(oracle.grid))]
    for t in range(steps):
        obs, rews, dones, info = oracle.step(list(actions_list[t]))
        traj.append(dict(obs=np.array(obs),
                         grid=canon_oracle_grid(oracle.grid),
                         rews=list(rews), dones=list(dones),
                         info={k: np.array(v) for k, v in info.items()}))
        if all(dones):
            break
    return traj


@pytest.mark.parametrize('case', range(len(CASES)))
@pytest.mark.parametrize('seed', [0, 1, 7, 42])
def test_oracle_bit_exact_vs_reference(case, seed):
    params = CASES[case]
    steps = 80
    rng = np.random.default_rng(1000 + seed)
    num_actions = 5 if params.get('observer') == 'human' else 3
    actions = rng.integers(0, num_actions,
                           size=(steps, params['num_snakes']))

    ref = run_reference(params, seed, steps, actions)
    orc = run_oracle(params, seed, steps, actions)

    assert len(ref) == len(orc), 'trajectory length mismatch'
    for t, (a, b) in enumerate(zip(ref, orc)):
        np.testing.assert_array_equal(a['grid'], b['grid'],
                                      err_msg=f'grid mismatch t={t}')
        np.testing.assert_array_equal(a['obs'], b['obs'],
                                      err_msg=f'obs mismatch t={t}')
        if t > 0:
            np.testing.assert_allclose(a['rews'], b['rews'], atol=1e-12,
                                       err_msg=f'rews mismatch t={t}')
            assert a['dones'] == b['dones'], f'dones mismatch t={t}'
            assert set(a['info']) == set(b['info'])
            for k in a['info']:
                np.testing.assert_allclose(
                    a['info'][k], b['info'][k], atol=1e-12,
                    err_msg=f'info[{k}] mismatch t={t}')
