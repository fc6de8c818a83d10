"""Device-batched battle arena (algo/battle_batch.py): the batched
greedy policy against the reference loop-form oracle, and an end-to-end
batch battle smoke run."""

import jax
import jax.numpy as jnp
import numpy as np

from marlsnake_tpu.core import types as T
from marlsnake_tpu.core.types import EnvConfig


def test_batched_greedy_matches_loop_form():
    """greedy_step == the reference GreedyEnemy loop form per decision;
    on score ties (reference: random.choice over the argmax set) the
    batched pick must land in the tie set and both sides carry the
    direction implied by their own pick."""
    from marlsnake_tpu.algo.battle_batch import greedy_step
    from test_algo import _greedy_loop_form

    rng = np.random.default_rng(3)
    for trial in range(20):
        h, w = [int(x) for x in rng.integers(4, 12, size=2)]
        loop_dir = None
        vec_dir = jnp.zeros((1, 2), jnp.int32)
        for step in range(10):
            obs = np.zeros((h, w, 8), np.uint8)
            for ch, p in [(T.CH_WALL, 0.15), (T.CH_FRUIT, 0.08),
                          (T.CH_OTHER_BODY, 0.1), (T.CH_MY_BODY, 0.1),
                          (T.CH_MY_TAIL, 0.05)]:
                obs[:, :, ch] = rng.random((h, w)) < p
            if rng.random() > 0.1:
                obs[rng.integers(h), rng.integers(w), T.CH_MY_HEAD] = 1

            a_vec, vec_dir = greedy_step(
                jnp.asarray(obs)[None], vec_dir,
                jax.random.key(int(rng.integers(1 << 30))))
            a_vec = int(a_vec[0])

            # loop-form oracle: enumerate its random.choice tie set
            import random
            tie_set = set()
            for s in range(64):
                random.seed(s)
                a, _ = _greedy_loop_form(obs, loop_dir)
                tie_set.add(a)
            assert a_vec in tie_set, (trial, step, a_vec, tie_set)
            # advance the oracle's direction with the BATCHED pick so
            # the two stay comparable through tie divergence
            head = np.argwhere(obs[:, :, T.CH_MY_HEAD] == 1)
            if len(head) == 0:
                assert a_vec == 0
                continue  # both sides keep their direction state
            if loop_dir is None:
                hy, hx = head[0]
                cur = (-1, 0)
                for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
                    by, bx = hy + dy, hx + dx
                    if (0 <= by < h and 0 <= bx < w
                            and (obs[by, bx, T.CH_MY_BODY] == 1
                                 or obs[by, bx, T.CH_MY_TAIL] == 1)):
                        cur = (int(hy - by), int(hx - bx))
                        break
                loop_dir = cur
            dy, dx = loop_dir
            moves = {0: (dy, dx), 1: (-dx, dy), 2: (dx, -dy)}
            loop_dir = moves[a_vec]
            assert tuple(np.asarray(vec_dir)[0]) == loop_dir, (
                trial, step)


def test_battle_batch_smoke():
    """End-to-end batched battle: masked-DQN seat 0 vs greedy + random,
    16 simultaneous episodes on a small board."""
    from marlsnake_tpu.algo.battle_batch import (
        BatchedGreedy, BatchedRandom, build_battle_batch, summarize)
    from marlsnake_tpu.models.dqn import DQN

    cfg = EnvConfig(height=8, width=8, num_snakes=3, snake_length=2,
                    num_fruits=2)
    net = DQN(num_actions=3, assume_binary_obs=True)
    params = net.init(jax.random.key(0),
                      jnp.zeros((1, 8, 8, 8), jnp.uint8))
    run = build_battle_batch(net, cfg,
                             [BatchedGreedy(), BatchedRandom()],
                             num_envs=16, max_steps=48)
    rew, life = run(params, jax.random.key(1))
    assert rew.shape == (16, 3) and life.shape == (16, 3)
    life = np.asarray(life)
    assert (life >= 1).all() and (life <= 48).all()
    table = summarize(rew, life, ['DQN (Main)', 'Greedy', 'Random'])
    assert 'DQN (Main)' in table and '±' in table


def test_cli_seat_cap():
    """battle lineups never exceed num_snakes-1 opponent seats: extras
    (PPO/NEAT present simultaneously on a small table) are dropped with
    a warning instead of crashing the arena builder."""
    from marlsnake_tpu.cli import _cap_seats

    # 3 snakes, PPO + NEAT both present: only one non-Greedy seat
    opp, names, seats = _cap_seats(['ppo', 'neat'],
                                   ['DQN (Main)', 'PPO', 'Hybrid NEAT'], 3)
    assert seats == 2 and opp == ['ppo'] and names == ['DQN (Main)', 'PPO']
    # 2 snakes: Greedy takes the only seat
    opp, names, seats = _cap_seats(['ppo'], ['DQN (Main)', 'PPO'], 2)
    assert seats == 1 and opp == [] and names == ['DQN (Main)']
    # 4 snakes: both fit (plus Greedy), nothing dropped
    opp, names, seats = _cap_seats(['ppo', 'neat'],
                                   ['DQN (Main)', 'PPO', 'Hybrid NEAT'], 4)
    assert seats == 3 and opp == ['ppo', 'neat']
