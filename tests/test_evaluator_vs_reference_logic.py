"""Property test: the jitted masked evaluator must agree with an
independent numpy replica of the reference's safety-masking logic
(train_dqn.py:463-580) on randomized real env states."""

from collections import deque

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlsnake_tpu.algo.evaluator import masked_actions
from marlsnake_tpu.core import types as T
from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.envs.env import make_env

DEADLY = [T.CH_WALL, T.CH_OTHER_HEAD, T.CH_OTHER_BODY, T.CH_OTHER_TAIL,
          T.CH_MY_BODY, T.CH_MY_TAIL]


def ref_count_reachable(obs, start, limit=60):
    q = deque([tuple(start)])
    visited = {tuple(start)}
    count = 0
    h, w = obs.shape[:2]
    while q and count < limit:
        y, x = q.popleft()
        count += 1
        for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
            ny, nx = y + dy, x + dx
            if (0 <= ny < h and 0 <= nx < w and (ny, nx) not in visited
                    and not any(obs[ny, nx, c] == 1 for c in DEADLY)):
                visited.add((ny, nx))
                q.append((ny, nx))
    return count


def ref_get_action(obs_i, current_dir, occupied, q_values):
    """Numpy replica of DQN_Evaluator.get_action (train_dqn.py:463-580)."""
    h, w = obs_i.shape[:2]
    head = np.argwhere(obs_i[:, :, T.CH_MY_HEAD] == 1)
    if len(head) == 0:
        return 0, (0, 0), None
    hy, hx = head[0]

    if current_dir is None:
        current_dir = (-1, 0)
        for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
            by, bx = hy - dy, hx - dx
            if (0 <= by < h and 0 <= bx < w
                    and (obs_i[by, bx, T.CH_MY_BODY] == 1
                         or obs_i[by, bx, T.CH_MY_TAIL] == 1)):
                current_dir = (dy, dx)
                break

    dy, dx = current_dir
    moves = {0: (dy, dx), 1: (-dx, dy), 2: (dx, -dy)}
    my_len = int((obs_i[:, :, T.CH_MY_HEAD] == 1).sum()
                 + (obs_i[:, :, T.CH_MY_BODY] == 1).sum()
                 + (obs_i[:, :, T.CH_MY_TAIL] == 1).sum())
    deadly_actions = []
    for a in (0, 1, 2):
        mdy, mdx = moves[a]
        ny, nx = hy + mdy, hx + mdx
        if not (0 <= ny < h and 0 <= nx < w):
            deadly_actions.append(a)
            continue
        if (ny, nx) in occupied:
            deadly_actions.append(a)
            continue
        if any(obs_i[ny, nx, c] == 1 for c in DEADLY):
            deadly_actions.append(a)
            continue
        near = False
        for hdy, hdx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
            cy, cx = ny + hdy, nx + hdx
            if (0 <= cy < h and 0 <= cx < w
                    and obs_i[cy, cx, T.CH_OTHER_HEAD] == 1):
                near = True
                break
        if near:
            deadly_actions.append(a)
            continue
        sim = obs_i.copy()
        sim[hy, hx, T.CH_MY_HEAD] = 0
        sim[hy, hx, T.CH_MY_BODY] = 1
        sim[ny, nx, :] = 0
        sim[ny, nx, T.CH_MY_HEAD] = 1
        eating = obs_i[ny, nx, T.CH_FRUIT] == 1
        if not eating:
            tail = np.argwhere(obs_i[:, :, T.CH_MY_TAIL] == 1)
            if len(tail) > 0:
                sim[tail[0][0], tail[0][1], T.CH_MY_TAIL] = 0
        space = ref_count_reachable(sim, (ny, nx))
        if space < my_len + (1 if eating else 0):
            deadly_actions.append(a)

    q = q_values.astype(np.float64).copy()
    for a in deadly_actions:
        q[a] = -np.inf
    act = int(np.argmax(q))
    fdy, fdx = moves[act]
    return act, (fdy, fdx), (hy + fdy, hx + fdx)


@pytest.mark.parametrize('seed', range(4))
@pytest.mark.slow
def test_masked_actions_match_reference_logic(seed):
    cfg = EnvConfig(height=12, width=12, num_snakes=3, snake_length=3,
                    num_fruits=3)
    env = make_env(cfg)
    state, obs = env.reset(jax.random.key(seed))
    rng = np.random.default_rng(seed)

    cur_dirs = np.zeros((3, 2), np.int32)  # (0,0) = unknown
    for t in range(25):
        obs_np = np.asarray(obs if t == 0 else out.obs)
        q = rng.normal(size=(3, 3)).astype(np.float32)
        active = np.asarray(state.alive)

        got_acts, got_dirs = masked_actions(
            jnp.asarray(obs_np), jnp.asarray(q), jnp.asarray(cur_dirs),
            jnp.asarray(active))
        got_acts = np.asarray(got_acts)
        got_dirs_np = np.asarray(got_dirs)

        occupied = set()
        for i in range(3):
            if not active[i]:
                continue
            cd = None if tuple(cur_dirs[i]) == (0, 0) \
                else tuple(cur_dirs[i])
            act, nd, nxt = ref_get_action(obs_np[i], cd, occupied, q[i])
            if nxt is not None:
                occupied.add(nxt)
            assert int(got_acts[i]) == act, f'snake {i} t={t}'
            head_exists = (obs_np[i][:, :, T.CH_MY_HEAD] == 1).any()
            if head_exists:
                assert tuple(got_dirs_np[i]) == nd, f'dir {i} t={t}'

        cur_dirs = got_dirs_np
        state, out = env.step(state, jnp.asarray(got_acts))
        if bool(out.done_all):
            break
