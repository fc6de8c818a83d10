"""Device-batched battle arena: hundreds of simultaneous episodes.

The host :class:`~marlsnake_tpu.algo.battle.BattleArena` steps ONE env
with a host round-trip per opponent per step (~2ms tunnel RPC each) —
faithful to the reference's loop (train_dqn.py:858-960) but slow and
statistically thin at 10 episodes. Here every seat's policy is batched
on device: seat 0 plays the safety-masked DQN evaluator policy and seats
1..N-1 any of the batched opponents below; B episodes run simultaneously
in one jitted ``lax.scan`` with freeze-on-done (the
``evaluate_batch`` pattern, algo/evaluator.py), so the 4-way table can
be recorded over 100+ episodes with confidence intervals.

Policy parity notes:

* ``BatchedGreedy`` reproduces the reference ``GreedyEnemy`` heuristic
  (train_dqn.py:774-856) vectorized over envs — same direction
  inference probe order, same first-nearest-fruit (row-major argmin),
  same illegal->forward fallback; score ties are broken uniformly at
  random (the reference's ``random.choice`` over the argmax set) via a
  <0.5 uniform perturbation on the integer scores.
* ``BatchedDQN`` / ``BatchedPPO`` are the greedy checkpoint policies of
  opponents.DQNAgent / PPOAgent, batched.
* ``BatchedNEAT`` runs the frozen-DQN embed + evolved head through
  :class:`~marlsnake_tpu.algo.neat_hybrid.PaddedNetBatch` (exact
  ``FeedForwardNetwork.activate`` equivalence, equivalence-tested).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from marlsnake_tpu.core import types as T
from marlsnake_tpu.algo.evaluator import masked_actions
from marlsnake_tpu.algo.opponents import DEADLY_CHANNELS


def greedy_step(obs: jnp.ndarray, cur_dir: jnp.ndarray, key):
    """One step of the reference greedy fruit-seeker for B envs.

    ``obs`` (B, H, W, C>=8) uint8 single-agent frames; ``cur_dir``
    (B, 2) int32 with (0, 0) = not yet inferred (the reference's
    ``current_direction is None``). Returns (action (B,), new_dir).
    """
    b, h, w = obs.shape[0], obs.shape[1], obs.shape[2]
    rows = jnp.arange(b)
    myhead = obs[..., T.CH_MY_HEAD] == 1
    flat_head = myhead.reshape(b, -1)
    head_exists = flat_head.any(-1)
    hidx = jnp.argmax(flat_head, -1)          # first head, row-major
    hy, hx = hidx // w, hidx % w

    # direction inference: probe UP, DOWN, LEFT, RIGHT for own
    # body/tail; FIRST hit wins; UP if none (train_dqn.py:795-803)
    body = (obs[..., T.CH_MY_BODY] == 1) | (obs[..., T.CH_MY_TAIL] == 1)
    probes = jnp.asarray([(-1, 0), (1, 0), (0, -1), (0, 1)], jnp.int32)
    hits = []
    for i in range(4):
        by, bx = hy + probes[i, 0], hx + probes[i, 1]
        inb = (by >= 0) & (by < h) & (bx >= 0) & (bx < w)
        hits.append(inb & body[rows, jnp.clip(by, 0, h - 1),
                               jnp.clip(bx, 0, w - 1)])
    hits = jnp.stack(hits, -1)                # (B, 4)
    inferred = jnp.where(hits.any(-1)[:, None],
                         -probes[jnp.argmax(hits, -1)],
                         jnp.asarray([-1, 0], jnp.int32))
    uninit = (cur_dir == 0).all(-1)
    d = jnp.where(uninit[:, None], inferred, cur_dir)
    dy, dx = d[:, 0], d[:, 1]

    # relative moves: 0 forward, 1 left, 2 right
    moves = jnp.stack([
        jnp.stack([dy, dx], -1),
        jnp.stack([-dx, dy], -1),
        jnp.stack([dx, -dy], -1)], 1)         # (B, 3, 2)
    ny = hy[:, None] + moves[..., 0]
    nx = hx[:, None] + moves[..., 1]
    inb = (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
    deadly_plane = (obs[..., jnp.asarray(DEADLY_CHANNELS)] == 1).any(-1)
    deadly = deadly_plane[rows[:, None], jnp.clip(ny, 0, h - 1),
                          jnp.clip(nx, 0, w - 1)]
    legal = inb & ~deadly

    # nearest fruit by Manhattan distance, first (row-major) on ties
    fruit = obs[..., T.CH_FRUIT] == 1
    dist = (jnp.abs(jnp.arange(h)[:, None] - hy[:, None, None])
            + jnp.abs(jnp.arange(w)[None, :] - hx[:, None, None]))
    dist = jnp.where(fruit, dist, 1 << 30)
    fidx = jnp.argmin(dist.reshape(b, -1), -1)
    any_fruit = fruit.reshape(b, -1).any(-1)
    ty, tx = fidx // w, fidx % w
    scores = -(jnp.abs(ny - ty[:, None])
               + jnp.abs(nx - tx[:, None])).astype(jnp.float32)
    scores = jnp.where(any_fruit[:, None], scores, 0.0)
    scores = jnp.where(legal, scores, -jnp.inf)
    # integer scores differ by >= 1, so +U[0, 0.5) breaks exact ties
    # uniformly without reordering distinct scores (-inf stays -inf)
    u = jax.random.uniform(key, scores.shape) * 0.5
    chosen = jnp.where(legal.any(-1),
                       jnp.argmax(scores + u, -1), 0)
    new_dir = moves[rows, chosen]
    act = jnp.where(head_exists, chosen, 0).astype(jnp.int32)
    # no head: direction state is untouched (incl. the uninit sentinel),
    # like the reference's early `return 0` before any inference
    new_dir = jnp.where(head_exists[:, None], new_dir, cur_dir)
    return act, new_dir


class BatchedGreedy:
    name = 'Greedy Bot'

    def init(self, num_envs):
        return jnp.zeros((num_envs, 2), jnp.int32)

    def apply(self, obs, aux, key):
        return greedy_step(obs, aux, key)


class BatchedRandom:
    name = 'Random'

    def init(self, num_envs):
        return ()

    def apply(self, obs, aux, key):
        b = obs.shape[0]
        return jax.random.randint(key, (b,), 0, 3, jnp.int32), aux


class BatchedDQN:
    name = 'DQN'

    def __init__(self, params, net=None):
        if net is None:
            from marlsnake_tpu.models.dqn import DQN
            net = DQN(num_actions=3, assume_binary_obs=True)
        self.net, self.params = net, params

    def init(self, num_envs):
        return ()

    def apply(self, obs, aux, key):
        q = self.net.apply(self.params, obs)
        return jnp.argmax(q, -1).astype(jnp.int32), aux


class BatchedPPO:
    name = 'PPO'

    def __init__(self, params, net=None):
        if net is None:
            from marlsnake_tpu.models.ppo import ActorCritic
            net = ActorCritic(num_actions=3, assume_binary_obs=True)
        self.net, self.params = net, params

    def init(self, num_envs):
        return ()

    def apply(self, obs, aux, key):
        logits = self.net.apply(self.params, obs)[0]
        return jnp.argmax(logits, -1).astype(jnp.int32), aux


class BatchedNEAT:
    name = 'Hybrid NEAT'

    def __init__(self, dqn_params, genome, neat_config, net=None):
        from marlsnake_tpu.algo.neat_hybrid import PaddedNetBatch
        if net is None:
            from marlsnake_tpu.models.dqn import DQN
            net = DQN(num_actions=3, assume_binary_obs=True)
        self.net, self.dqn_params = net, dqn_params
        self.batch = PaddedNetBatch([genome], neat_config)

    def init(self, num_envs):
        return ()

    def apply(self, obs, aux, key):
        feats = self.net.apply(self.dqn_params, obs,
                               method=self.net.features)
        acts = self.batch.acts(feats[None])[0]    # pop-dim of 1
        return acts.astype(jnp.int32), aux


def build_battle_batch(net, cfg, opponents: Sequence, num_envs: int = 128,
                       max_steps: int = 512, flood_limit: int = 60):
    """Jitted ``run(params, key) -> (rewards, lifetimes)`` with per-episode
    arrays of shape (num_envs, N): seat 0 = masked DQN (``params``),
    seats 1..N-1 = ``opponents`` in order."""
    from marlsnake_tpu.envs.vector import build_vector_fns

    n = cfg.num_snakes
    assert len(opponents) == n - 1, (len(opponents), n)
    reset_fn, step_fn = build_vector_fns(cfg, autoreset=False)

    def dqn_seat0(params, obs, dirs, alive0):
        e = obs.shape[0]
        q = net.apply(params, obs.reshape((e * n,) + obs.shape[2:]))
        q = q.reshape(e, n, -1)
        # single-env battle passes active=[alive0, False, ...] — only
        # seat 0 claims cells (battle.py run_battle)
        active = jnp.concatenate(
            [alive0[:, None], jnp.zeros((e, n - 1), bool)], -1)
        acts, dirs = jax.vmap(
            lambda o, qq, d, a: masked_actions(o, qq, d, a, flood_limit)
        )(obs, q, dirs, active)
        return acts[:, 0], dirs

    @jax.jit
    def run(params, key):
        kr, ks = jax.random.split(key)
        states, obs = reset_fn(jax.random.split(kr, num_envs))
        auxs = tuple(op.init(num_envs) for op in opponents)

        def body(carry, k):
            states, obs, dones, dirs, auxs, rew, life = carry
            a0, new_dirs = dqn_seat0(params, obs, dirs, ~dones[:, 0])
            acts = [jnp.where(dones[:, 0], 0, a0)]
            new_auxs = []
            for i, (op, aux) in enumerate(zip(opponents, auxs)):
                ai, aux = op.apply(obs[:, i + 1], aux,
                                   jax.random.fold_in(k, i))
                acts.append(jnp.where(dones[:, i + 1], 0, ai))
                new_auxs.append(aux)
            actions = jnp.stack(acts, 1)
            new_states, out = step_fn(states, actions)
            frozen = dones.all(-1)

            def sel(new, old):
                f = frozen.reshape((-1,) + (1,) * (new.ndim - 1))
                return jnp.where(f, old, new)

            states = jax.tree.map(sel, new_states, states)
            obs = sel(out.obs, obs)
            dirs = sel(new_dirs, dirs)
            # the host arena counts a lifetime step BEFORE acting and
            # adds the full reward vector (dead seats earn exactly 0)
            life = life + (~dones).astype(jnp.float32)
            rew = rew + jnp.where(frozen[:, None], 0.0, out.reward)
            dones = dones | out.done
            return (states, obs, dones, dirs, tuple(new_auxs),
                    rew, life), None

        init = (states, obs, jnp.zeros((num_envs, n), bool),
                jnp.zeros((num_envs, n, 2), jnp.int32), auxs,
                jnp.zeros((num_envs, n), jnp.float32),
                jnp.zeros((num_envs, n), jnp.float32))
        (states, obs, dones, dirs, auxs, rew, life), _ = jax.lax.scan(
            body, init, jax.random.split(ks, max_steps))
        return rew, life

    return run


def summarize(rewards, lifetimes, names) -> str:
    """Mean +- 95% CI table over the episode batch."""
    r = np.asarray(rewards)
    t = np.asarray(lifetimes)
    b = r.shape[0]
    lines = ['=' * 78,
             f'{"ALGORITHM":<20} | {"MEAN REWARD":>20} | '
             f'{"MEAN LIFETIME":>20} | n={b}',
             '-' * 78]
    for i, name in enumerate(names):
        ci_r = 1.96 * r[:, i].std(ddof=1) / np.sqrt(b)
        ci_t = 1.96 * t[:, i].std(ddof=1) / np.sqrt(b)
        lines.append(f'{name:<20} | {r[:, i].mean():>10.2f} ±{ci_r:>7.2f}'
                     f' | {t[:, i].mean():>10.1f} ±{ci_t:>7.1f} |')
    lines.append('=' * 78)
    return '\n'.join(lines)
