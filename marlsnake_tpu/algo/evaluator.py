"""Safety-masked DQN evaluator.

Re-design of the reference's inference-time action masking
(``DQN_Evaluator.get_action``, train_dqn.py:463-580) as a jittable program:

1. mask moves into walls/bodies/enemies (deadly channels),
2. mask cells already claimed by earlier-decided snakes this step,
3. veto moves adjacent to an enemy head (head-to-head risk),
4. flood-fill the post-move board and reject moves whose reachable space
   is smaller than the snake's (post-move) length,
5. argmax over the masked Q-values.

The per-snake sequential claim set (step 2) is a ``lax.scan`` over snakes;
the flood fill is the bounded dilation in ``ops/floodfill`` (exactly
equivalent to the reference's count-capped BFS). Everything vmaps over env
batches for batched evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from marlsnake_tpu.core import types as T
from marlsnake_tpu.ops.floodfill import reachable_count

DEADLY_CHANNELS = (T.CH_WALL, T.CH_OTHER_HEAD, T.CH_OTHER_BODY,
                   T.CH_OTHER_TAIL, T.CH_MY_BODY, T.CH_MY_TAIL)
# neighbor probe order used by the reference for direction inference
# (train_dqn.py:437) — first match wins
_PROBE = np.array([(-1, 0), (1, 0), (0, -1), (0, 1)], dtype=np.int32)
_NO_DIR = np.array([0, 0], dtype=np.int32)


def _deadly_map(obs_i: jnp.ndarray) -> jnp.ndarray:
    """(H, W) bool — any deadly channel set."""
    return (obs_i[..., jnp.array(DEADLY_CHANNELS)] == 1).any(-1)


def _derive_dir(obs_i: jnp.ndarray, head: jnp.ndarray) -> jnp.ndarray:
    """Current direction from the body cell adjacent to the head
    (train_dqn.py:433-442); defaults to UP."""
    h, w = obs_i.shape[:2]
    probe = jnp.asarray(_PROBE)
    by = head[0] - probe[:, 0]
    bx = head[1] - probe[:, 1]
    inb = (by >= 0) & (by < h) & (bx >= 0) & (bx < w)
    byc, bxc = jnp.clip(by, 0, h - 1), jnp.clip(bx, 0, w - 1)
    hit = inb & ((obs_i[byc, bxc, T.CH_MY_BODY] == 1)
                 | (obs_i[byc, bxc, T.CH_MY_TAIL] == 1))
    first = jnp.argmax(hit)
    return jnp.where(hit.any(), probe[first], jnp.asarray([-1, 0]))


def masked_action_single(obs_i: jnp.ndarray, q_i: jnp.ndarray,
                         cur_dir: jnp.ndarray, claimed: jnp.ndarray,
                         flood_limit: int = 60):
    """One snake's masked action.

    Returns (action, new_dir (2,), next_pos (2,), head_exists).
    ``cur_dir = (0, 0)`` means unknown -> derived from the body.
    """
    h, w = obs_i.shape[:2]
    head_exists = (obs_i[..., T.CH_MY_HEAD] == 1).any()
    head_flat = jnp.argmax(obs_i[..., T.CH_MY_HEAD])
    head = jnp.stack([head_flat // w, head_flat % w]).astype(jnp.int32)

    cur_dir = jnp.where((cur_dir == 0).all(), _derive_dir(obs_i, head),
                        cur_dir)
    dy, dx = cur_dir[0], cur_dir[1]
    # 0: straight, 1: left (-dx, dy), 2: right (dx, -dy)
    # (train_dqn.py:489)
    moves = jnp.stack([jnp.stack([dy, dx]), jnp.stack([-dx, dy]),
                       jnp.stack([dx, -dy])])  # (3, 2)
    tgt = head[None] + moves  # (3, 2)
    inb = ((tgt[:, 0] >= 0) & (tgt[:, 0] < h)
           & (tgt[:, 1] >= 0) & (tgt[:, 1] < w))
    ty = jnp.clip(tgt[:, 0], 0, h - 1)
    tx = jnp.clip(tgt[:, 1], 0, w - 1)

    dead = ~inb
    dead |= claimed[ty, tx] & inb
    deadly_cells = _deadly_map(obs_i)
    dead |= deadly_cells[ty, tx] & inb

    # head-to-head: any 4-neighbor of the target holds an enemy head
    probe = jnp.asarray(_PROBE)
    ny = ty[:, None] + probe[None, :, 0]
    nx = tx[:, None] + probe[None, :, 1]
    ninb = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
    nyc, nxc = jnp.clip(ny, 0, h - 1), jnp.clip(nx, 0, w - 1)
    near_head = ((obs_i[nyc, nxc, T.CH_OTHER_HEAD] == 1) & ninb).any(-1)
    dead |= near_head & inb

    # flood fill on the simulated post-move board (train_dqn.py:536-557)
    my_len = ((obs_i[..., T.CH_MY_HEAD] == 1).sum()
              + (obs_i[..., T.CH_MY_BODY] == 1).sum()
              + (obs_i[..., T.CH_MY_TAIL] == 1).sum())
    tail_flat = jnp.argmax(obs_i[..., T.CH_MY_TAIL])
    tail = jnp.stack([tail_flat // w, tail_flat % w])
    tail_exists = (obs_i[..., T.CH_MY_TAIL] == 1).any()

    base = deadly_cells.at[head[0], head[1]].set(True)  # old head -> body

    def flood_one(a):
        eat = obs_i[ty[a], tx[a], T.CH_FRUIT] == 1
        m = base
        # tail retracts unless eating: clear the tail cell
        clear_tail = tail_exists & ~eat
        m = m.at[tail[0], tail[1]].set(
            jnp.where(clear_tail, False, m[tail[0], tail[1]]))
        m = m.at[ty[a], tx[a]].set(False)  # target becomes the new head
        space = reachable_count(~m, jnp.stack([ty[a], tx[a]]),
                                flood_limit)
        new_len = my_len + eat.astype(my_len.dtype)
        return space < new_len

    dead |= jax.vmap(flood_one)(jnp.arange(3))

    q = jnp.where(dead, -jnp.inf, q_i)
    act = jnp.argmax(q).astype(jnp.int32)
    new_dir = moves[act]
    next_pos = head + new_dir
    # dead snakes: action 0, no direction, no claim (train_dqn.py:478-480)
    act = jnp.where(head_exists, act, 0)
    new_dir = jnp.where(head_exists, new_dir, jnp.zeros(2, jnp.int32))
    return act, new_dir, next_pos, head_exists


def masked_actions(obs: jnp.ndarray, q: jnp.ndarray, cur_dirs: jnp.ndarray,
                   active: jnp.ndarray, flood_limit: int = 60):
    """Sequentially-claimed masked actions for all snakes of one env.

    obs (N, H, W, C8) uint8 (first 8 channels used), q (N, 3),
    cur_dirs (N, 2) with (0,0) = unknown, active (N,) bool.
    Returns (actions (N,), new_dirs (N, 2)).
    """
    n, h, w = obs.shape[:3]

    def body(claimed, i):
        act, new_dir, nxt, head_exists = masked_action_single(
            obs[i, :, :, :8], q[i], cur_dirs[i], claimed, flood_limit)
        do_claim = head_exists & active[i]
        cy = jnp.clip(nxt[0], 0, h - 1)
        cx = jnp.clip(nxt[1], 0, w - 1)
        claimed = claimed.at[cy, cx].set(
            jnp.where(do_claim, True, claimed[cy, cx]))
        act = jnp.where(active[i], act, 0)
        new_dir = jnp.where(active[i], new_dir, cur_dirs[i])
        return claimed, (act, new_dir)

    claimed0 = jnp.zeros((h, w), bool)
    _, (acts, dirs) = jax.lax.scan(body, claimed0, jnp.arange(n))
    return acts, dirs


def build_evaluate_batch(net, cfg, num_envs: int = 256,
                         max_steps: int = 512, flood_limit: int = 60):
    """Build the jitted batched-evaluation program ``run(params, key)``.

    The reference evaluates one env at a time with a Python frame loop
    (train_dqn.py:582-676); here ``num_envs`` episodes run simultaneously
    as one jitted ``lax.scan`` — masked policy, env step, and per-env
    freeze-on-done included. ``run`` returns (mean_reward, mean_timelife)
    averaged over envs and snakes. Params are a runtime argument so
    evaluating successive checkpoints never recompiles.
    """
    from marlsnake_tpu.envs.vector import build_vector_fns

    n = cfg.num_snakes
    reset_fn, step_fn = build_vector_fns(cfg, autoreset=False)

    def policy(params, obs, dirs, active):
        e = obs.shape[0]
        q = net.apply(params, obs.reshape((e * n,) + obs.shape[2:]))
        q = q.reshape(e, n, -1)
        return jax.vmap(
            lambda o, qq, d, a: masked_actions(o, qq, d, a, flood_limit)
        )(obs, q, dirs, active)

    @jax.jit
    def run(params, key):
        states, obs = reset_fn(jax.random.split(key, num_envs))

        def body(carry, _):
            states, obs, dones, dirs, rew_acc, life_acc = carry
            active = ~dones
            acts, new_dirs = policy(params, obs, dirs, active)
            new_states, out = step_fn(states, acts)
            frozen = dones.all(-1)

            def sel(new, old):
                f = frozen.reshape((-1,) + (1,) * (new.ndim - 1))
                return jnp.where(f, old, new)

            states = jax.tree.map(sel, new_states, states)
            obs = sel(out.obs, obs)
            dirs = sel(new_dirs, dirs)  # frozen envs keep their dirs
            rew_acc = rew_acc + jnp.where(active, out.reward, 0.0)
            life_acc = life_acc + active.astype(jnp.float32)
            dones = dones | out.done
            return (states, obs, dones, dirs, rew_acc, life_acc), None

        init = (states, obs, jnp.zeros((num_envs, n), bool),
                jnp.zeros((num_envs, n, 2), jnp.int32),
                jnp.zeros((num_envs, n), jnp.float32),
                jnp.zeros((num_envs, n), jnp.float32))
        (states, obs, dones, dirs, rew, life), _ = jax.lax.scan(
            init=init, f=body, xs=None, length=max_steps)
        return rew.mean(), life.mean()

    return run


# flax modules and EnvConfig are hashable -> compiled programs cached
# across evaluate_batch calls (a fresh jit per call cost 30-50s of
# recompile on every battle/eval invocation). LRU-bounded: a battle
# sweep over many configs must not pin every compiled program forever.
_EVAL_CACHE = {}
_EVAL_CACHE_MAX = 8


def evaluate_batch(net, params, cfg, num_envs: int = 256,
                   max_steps: int = 512, flood_limit: int = 60,
                   key=None):
    """Fully on-device batched evaluation with safety masking; see
    :func:`build_evaluate_batch`."""
    cache_key = (net, cfg, num_envs, max_steps, flood_limit)
    run = _EVAL_CACHE.pop(cache_key, None)
    if run is None:
        run = build_evaluate_batch(net, cfg, num_envs, max_steps,
                                   flood_limit)
    _EVAL_CACHE[cache_key] = run  # re-insert -> most-recently-used
    while len(_EVAL_CACHE) > _EVAL_CACHE_MAX:
        _EVAL_CACHE.pop(next(iter(_EVAL_CACHE)))
    if key is None:
        key = jax.random.key(0)
    r, t = run(params, key)
    return float(r), float(t)


class DQNEvaluator:
    """Episode evaluator with safety masking (train_dqn.py:582-676)."""

    def __init__(self, env, net, params, flood_limit: int = 60):
        self.env = env  # GymAdapter-style stateful env
        self.net = net
        self.params = params
        n = env.num_snakes

        @jax.jit
        def policy(params, obs, cur_dirs, active):
            q = net.apply(params, obs.reshape((n,) + obs.shape[1:]))
            return masked_actions(obs, q, cur_dirs, active, flood_limit)

        self._policy = policy

    def evaluate(self, num_episodes: int = 1, render: bool = False,
                 max_steps: int = 1000, verbose: bool = True):
        n = self.env.num_snakes
        total_rewards = 0.0
        total_steps = 0.0
        for ep in range(num_episodes):
            obs = self.env.reset()
            dones = [False] * n
            dirs = jnp.zeros((n, 2), jnp.int32)
            ep_rewards = np.zeros(n)
            timelifes = np.zeros(n)
            steps = 0
            while not all(dones) and steps < max_steps:
                if render:
                    self.env.render()
                active = jnp.asarray([not d for d in dones])
                timelifes += np.asarray(active)
                acts, dirs = self._policy(self.params, jnp.asarray(obs),
                                          dirs, active)
                obs, rews, dones, _ = self.env.step(
                    [int(a) for a in np.asarray(acts)])
                ep_rewards += np.asarray(rews)
                steps += 1
            avg_r, avg_t = ep_rewards.mean(), timelifes.mean()
            total_rewards += avg_r
            total_steps += avg_t
            if verbose:
                print(f'Ep {ep + 1:3d}: Avg Reward: {avg_r:6.2f} | '
                      f'Avg Timelife: {avg_t:5.1f} steps')
        final_r = total_rewards / num_episodes
        final_t = total_steps / num_episodes
        if verbose:
            print('-' * 50)
            print(f'FINAL RESULTS OVER {num_episodes} EPISODES:')
            print(f' >> Average Reward per Snake: {final_r:.2f}')
            print(f' >> Average Timelife per Snake: {final_t:.2f} steps')
            print('-' * 50)
        return final_r, final_t
