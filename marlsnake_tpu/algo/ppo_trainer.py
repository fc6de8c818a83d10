"""PPO trainer (parameter-shared, multi-agent, fully on-device).

The reference repo imports ``algorithm.ppo.PPO`` (train_dqn.py:703) but the
module was never committed (SURVEY.md C35). What survives is the
checkpoint topology (reconstructed in ``models/ppo.ActorCritic``) and the
TensorBoard tag set from the shipped event files:
``loss/actor``, ``loss/value``, ``policy/entropy``, ``policy/approx_kl``,
``env/mean_reward_per_step_per_agent``, ``env/mean_episode_return``,
``env/episodes_collected`` — all of which this trainer emits.

Design: each snake is an agent sharing one ActorCritic. Rollouts come from
the vmapped auto-reset vector env as a (T, E, N, ...) batch collected by a
jitted ``lax.scan``; GAE + clipped-surrogate updates run as a second jitted
program with minibatch epochs via ``lax.scan`` over permuted indices.
Transitions where an agent was already dead at step start are masked out of
both the policy and value losses.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.envs.vector import build_vector_fns
from marlsnake_tpu.models.ppo import ActorCritic


@dataclasses.dataclass
class PPOConfig:
    # environment
    num_snakes: int = 4
    height: int = 20
    width: int = 20
    snake_length: int = 5
    vision_range: Optional[int] = None
    frame_stack: int = 1
    reward_dict: Any = dataclasses.field(default_factory=lambda: {
        'fruit': 1.0, 'kill': 0.0, 'lose': 0.0, 'win': 0.0, 'time': 0.0})
    # rollout
    num_envs: int = 64
    rollout_steps: int = 128
    # optimization
    lr: float = 2.5e-4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    ent_coef: float = 0.01
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    update_epochs: int = 4
    num_minibatches: int = 4
    num_updates: int = 100
    # bookkeeping
    log_dir: str = 'runs/ppo'
    save_dir: str = 'checkpoints_ppo'
    # write a 'final' checkpoint into save_dir when train() completes;
    # set False to keep train() free of filesystem side effects
    save_final: bool = True
    # resume training from a previous checkpoint tag (e.g. 'final'):
    # restores params + optimizer state + update counter and continues —
    # the reference's (ghost) PPO checkpoint carries
    # {model_state_dict, optimizer_state_dict, epoch} for exactly this
    # (SURVEY.md C35, runs/ppo/20251228-155100/best_model.pt)
    resume_from: Optional[str] = None
    seed: int = 0
    compute_dtype: Any = jnp.float32
    # bit-identical for engine obs (one-hot {0,1}): skips the
    # conditional-/255 whole-batch max reduce in every rollout forward
    assume_binary_obs: bool = True
    # Opt-in bit-packed env observations (EnvConfig.obs_format): the
    # rollout batch stores (H, W, frame_stack) packed bytes (8x less
    # memory/traffic); the net ingress unpacks to the exact uint8
    # planes, so the update math is unchanged (bit-identical, tested).
    obs_format: str = 'uint8'

    def env_config(self) -> EnvConfig:
        return EnvConfig.from_reward_dict(
            self.reward_dict, height=self.height, width=self.width,
            num_snakes=self.num_snakes, snake_length=self.snake_length,
            vision_range=self.vision_range, frame_stack=self.frame_stack,
            obs_format=self.obs_format)


@struct.dataclass
class PPOTrainState:
    params: Any
    opt_state: Any
    env_states: Any
    obs: jnp.ndarray            # (E, N, H, W, C)
    agent_done: jnp.ndarray     # (E, N) — agent dead within current episode
    key: jnp.ndarray
    update: jnp.ndarray         # () int32
    episodes: jnp.ndarray       # () int32 — episodes completed so far
    # running per-episode return accumulator (for env/mean_episode_return)
    ep_return_acc: jnp.ndarray  # (E, N)
    finished_return_sum: jnp.ndarray  # () float32
    finished_count: jnp.ndarray       # () int32


@struct.dataclass
class PPOMetrics:
    loss_actor: jnp.ndarray
    loss_value: jnp.ndarray
    entropy: jnp.ndarray
    approx_kl: jnp.ndarray
    mean_reward_per_step_per_agent: jnp.ndarray
    mean_episode_return: jnp.ndarray
    episodes_collected: jnp.ndarray


class PPOTrainer:
    """Pass ``axis_name`` to make ``_update_impl`` SPMD-safe under
    ``shard_map``: per-device env/rollout streams are decorrelated,
    gradients and metrics are mesh-reduced, and counters stay replicated."""

    def __init__(self, config: PPOConfig, axis_name: Optional[str] = None):
        self.axis_name = axis_name
        self.config = config
        self.env_cfg = config.env_config()
        self.net = ActorCritic(num_actions=self.env_cfg.num_actions,
                               compute_dtype=config.compute_dtype,
                               assume_binary_obs=config.assume_binary_obs)
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(config.lr, eps=1e-5))
        self._reset_env, self._step_env = build_vector_fns(
            self.env_cfg, autoreset=True)
        self._update = jax.jit(self._update_impl)

    # ------------------------------------------------------------------
    def _prep(self, obs):
        """Net-ingress transform: unpack packed bytes to the exact uint8
        planes (obs_format='packed'); identity otherwise."""
        if self.config.obs_format == 'packed':
            from marlsnake_tpu.ops.obs_pack import unpack_obs
            return unpack_obs(obs)
        return obs

    def init_state(self, key=None) -> PPOTrainState:
        cfg = self.config
        if key is None:
            key = jax.random.key(cfg.seed)
        k_param, k_env, key = jax.random.split(key, 3)
        obs_shape = self.env_cfg.obs_shape[1:]
        params = self.net.init(
            k_param,
            self._prep(jnp.zeros((1,) + obs_shape, jnp.uint8)))
        env_states, obs = self._reset_env(
            jax.random.split(k_env, cfg.num_envs))
        e, n = cfg.num_envs, cfg.num_snakes
        return PPOTrainState(
            params=params, opt_state=self.tx.init(params),
            env_states=env_states, obs=obs,
            agent_done=jnp.zeros((e, n), bool),
            key=key, update=jnp.int32(0), episodes=jnp.int32(0),
            ep_return_acc=jnp.zeros((e, n), jnp.float32),
            finished_return_sum=jnp.float32(0.0),
            finished_count=jnp.int32(0))

    # ------------------------------------------------------------------
    def _policy(self, params, obs):
        e, n = obs.shape[:2]
        flat = obs.reshape((e * n,) + obs.shape[2:])
        logits, value = self.net.apply(params, self._prep(flat))
        return (logits.reshape(e, n, -1), value.reshape(e, n))

    def _pvary(self, x):
        if self.axis_name is None:
            return x
        aval = jax.typeof(x)
        if self.axis_name in getattr(aval, 'vma', ()):
            return x
        return jax.lax.pcast(x, (self.axis_name,), to='varying')

    def _update_impl(self, ts: PPOTrainState):
        cfg = self.config
        e, n = cfg.num_envs, cfg.num_snakes

        # --- rollout collection -------------------------------------------
        def rollout_body(carry, _):
            (env_states, obs, agent_done, key, ep_acc, fin_sum, fin_cnt,
             episodes) = carry
            key, k_act = jax.random.split(key)
            logits, value = self._policy(ts.params, obs)
            action = jax.random.categorical(k_act, logits)
            logprob = jnp.take_along_axis(
                jax.nn.log_softmax(logits), action[..., None], -1)[..., 0]
            action = jnp.where(agent_done, 0, action.astype(jnp.int32))

            new_env_states, out = self._step_env(env_states, action)
            valid = ~agent_done  # agent was alive at step start
            rew = jnp.where(valid, out.reward, 0.0)

            ep_acc = ep_acc + rew
            ep_done = out.done_all  # (E,)
            fin_sum = fin_sum + jnp.where(ep_done, ep_acc.mean(-1),
                                          0.0).sum()
            fin_cnt = fin_cnt + ep_done.sum().astype(jnp.int32)
            episodes = episodes + ep_done.sum().astype(jnp.int32)
            ep_acc = jnp.where(ep_done[:, None], 0.0, ep_acc)
            # auto-reset clears per-agent done at episode end
            agent_done_next = jnp.where(ep_done[:, None], False, out.done)

            # obs stored FLAT (E*N, H*W*C): scan-stacking the 5-D obs
            # makes XLA layout-transpose the whole (T, E, N, H, W, C)
            # trajectory twice per update (27ms/update in traces); a 2-D
            # row per step has one canonical layout and the minibatch
            # consumer reshapes after its gather
            step_data = dict(obs=obs.reshape(e * n, -1), action=action,
                             logprob=logprob,
                             value=value, reward=rew, valid=valid,
                             next_done=out.done | ep_done[:, None])
            return (new_env_states, obs_next_of(out), agent_done_next, key,
                    ep_acc, fin_sum, fin_cnt, episodes), step_data

        def obs_next_of(out):
            return out.obs

        key0, key_next = jax.random.split(ts.key)
        if self.axis_name is not None:
            key0 = jax.random.fold_in(
                key0, jax.lax.axis_index(self.axis_name))
        carry = (jax.tree.map(self._pvary, ts.env_states),
                 self._pvary(ts.obs), self._pvary(ts.agent_done), key0,
                 self._pvary(ts.ep_return_acc),
                 self._pvary(ts.finished_return_sum),
                 self._pvary(ts.finished_count), self._pvary(ts.episodes))
        carry, traj = jax.lax.scan(rollout_body, carry,
                                   length=cfg.rollout_steps)
        (env_states, obs, agent_done, key, ep_acc, fin_sum, fin_cnt,
         episodes) = carry

        # --- GAE ----------------------------------------------------------
        _, last_value = self._policy(ts.params, obs)

        def gae_body(carry, step):
            gae, next_value = carry
            # episode termination truncates bootstrapping
            nonterminal = 1.0 - step['next_done'].astype(jnp.float32)
            delta = (step['reward'] + cfg.gamma * next_value * nonterminal
                     - step['value'])
            gae = delta + cfg.gamma * cfg.gae_lambda * nonterminal * gae
            return (gae, step['value']), (gae, gae + step['value'])

        (_, _), (advantages, returns) = jax.lax.scan(
            gae_body, (self._pvary(jnp.zeros((e, n))), last_value), traj,
            reverse=True)

        # --- flatten batch ------------------------------------------------
        t = cfg.rollout_steps
        b = t * e * n

        def fl(x):
            return x.reshape((b,) + x.shape[3:])

        batch = dict(obs=traj['obs'].reshape(b, -1),
                     action=fl(traj['action']),
                     logprob=fl(traj['logprob']), value=fl(traj['value']),
                     adv=fl(advantages), ret=fl(returns),
                     valid=fl(traj['valid']))

        # --- minibatch epochs --------------------------------------------
        mb = b // cfg.num_minibatches

        def loss_fn(params, mbatch):
            mb_obs = mbatch['obs'].reshape(
                (mbatch['obs'].shape[0],) + self.env_cfg.obs_shape[1:])
            logits, value = self.net.apply(params, self._prep(mb_obs))
            logp_all = jax.nn.log_softmax(logits)
            logp = jnp.take_along_axis(logp_all, mbatch['action'][:, None],
                                       -1)[:, 0]
            v = mbatch['valid'].astype(jnp.float32)
            vsum = jnp.maximum(v.sum(), 1.0)
            ratio = jnp.exp(logp - mbatch['logprob'])
            adv = mbatch['adv']
            adv = (adv - (adv * v).sum() / vsum) / (
                jnp.sqrt(((adv - (adv * v).sum() / vsum) ** 2 * v).sum()
                         / vsum) + 1e-8)
            pg1 = -adv * ratio
            pg2 = -adv * jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps)
            loss_actor = (jnp.maximum(pg1, pg2) * v).sum() / vsum
            loss_value = (0.5 * (value - mbatch['ret']) ** 2 * v).sum() \
                / vsum
            ent = (-(jnp.exp(logp_all) * logp_all).sum(-1) * v).sum() / vsum
            kl = ((mbatch['logprob'] - logp) * v).sum() / vsum
            total = (loss_actor + cfg.vf_coef * loss_value
                     - cfg.ent_coef * ent)
            return total, (loss_actor, loss_value, ent, kl)

        def epoch_body(carry, k_epoch):
            params, opt_state = carry
            perm = jax.random.permutation(k_epoch, b)

            def mb_body(carry, idx):
                params, opt_state = carry
                mbatch = jax.tree.map(lambda x: x[idx], batch)
                (_, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, mbatch)
                if self.axis_name is not None:
                    grads = jax.lax.pmean(grads, self.axis_name)
                    aux = jax.lax.pmean(aux, self.axis_name)
                updates, opt_state = self.tx.update(grads, opt_state,
                                                    params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), aux

            idxs = perm[:mb * cfg.num_minibatches].reshape(
                cfg.num_minibatches, mb)
            (params, opt_state), auxs = jax.lax.scan(
                mb_body, (params, opt_state), idxs)
            return (params, opt_state), auxs

        key, k_perm = jax.random.split(key)
        (params, opt_state), auxs = jax.lax.scan(
            epoch_body, (ts.params, ts.opt_state),
            jax.random.split(k_perm, cfg.update_epochs))

        la, lv, ent, kl = jax.tree.map(lambda x: x.mean(), auxs)
        rew_sum = (traj['reward'] * traj['valid']).sum()
        valid_sum = traj['valid'].sum()
        if self.axis_name is not None:
            # mesh-global metrics / counters (keeps them replicated)
            rew_sum = jax.lax.psum(rew_sum, self.axis_name)
            valid_sum = jax.lax.psum(valid_sum, self.axis_name)
            fin_sum = jax.lax.psum(fin_sum, self.axis_name)
            fin_cnt = jax.lax.psum(fin_cnt, self.axis_name)
            episodes = ts.episodes + jax.lax.psum(
                episodes - ts.episodes, self.axis_name)
        metrics = PPOMetrics(
            loss_actor=la, loss_value=lv, entropy=ent, approx_kl=kl,
            mean_reward_per_step_per_agent=(
                rew_sum / jnp.maximum(valid_sum, 1)),
            mean_episode_return=jnp.where(
                fin_cnt > 0, fin_sum / jnp.maximum(fin_cnt, 1), 0.0),
            episodes_collected=fin_cnt,
        )
        ts = ts.replace(params=params, opt_state=opt_state,
                        env_states=env_states, obs=obs,
                        agent_done=agent_done, key=key_next,
                        update=ts.update + 1, episodes=episodes,
                        ep_return_acc=ep_acc,
                        finished_return_sum=jnp.float32(0.0),
                        finished_count=jnp.int32(0))
        return ts, metrics

    # ------------------------------------------------------------------
    def train(self, num_updates: Optional[int] = None, log: bool = True):
        cfg = self.config
        num_updates = num_updates or cfg.num_updates
        ts = self.init_state()
        start_u = 1
        if cfg.resume_from:
            ts = self.load_checkpoint(cfg.resume_from, ts)
            start_u = int(ts.update) + 1
        writer = None
        if log:
            from datetime import datetime
            import os
            from marlsnake_tpu.utils.metrics import MetricWriter
            writer = MetricWriter(os.path.join(
                cfg.log_dir, datetime.now().strftime('%Y%m%d-%H%M%S')))
        t0 = time.time()
        for u in range(start_u, num_updates + 1):
            ts, m = self._update(ts)
            if u % 5 == 0 or u == num_updates:
                scalars = {
                    'loss/actor': float(m.loss_actor),
                    'loss/value': float(m.loss_value),
                    'policy/entropy': float(m.entropy),
                    'policy/approx_kl': float(m.approx_kl),
                    'env/mean_reward_per_step_per_agent':
                        float(m.mean_reward_per_step_per_agent),
                    'env/mean_episode_return':
                        float(m.mean_episode_return),
                    'env/episodes_collected': int(m.episodes_collected),
                }
                if writer:
                    writer.add_scalars(scalars, u)
                steps = u * cfg.rollout_steps * cfg.num_envs
                print(f'update {u:4d} | return {scalars["env/mean_episode_return"]:8.4f} | '
                      f'entropy {scalars["policy/entropy"]:.3f} | '
                      f'kl {scalars["policy/approx_kl"]:.4f} | '
                      f'{steps / (time.time() - t0):,.0f} env-steps/s')
        if writer:
            writer.close()
        if cfg.save_final:
            self.save_checkpoint(ts, 'final')
        return ts

    # --- checkpointing (orbax; mirrors DQNTrainer) --------------------
    def _ckpt_path(self, tag) -> str:
        import os
        return os.path.abspath(
            os.path.join(self.config.save_dir, f'ppo_{tag}'))

    def _full_payload(self, ts: PPOTrainState):
        import jax.random as jrandom
        d = {f.name: getattr(ts, f.name)
             for f in dataclasses.fields(PPOTrainState)}
        d['key'] = jrandom.key_data(d['key'])
        return d

    def save_checkpoint(self, ts: PPOTrainState, tag, full: bool = False):
        import os
        from marlsnake_tpu.utils import checkpoint as ckpt
        os.makedirs(self.config.save_dir, exist_ok=True)
        # {params, opt_state, update} ≙ the reference PPO checkpoint's
        # {model_state_dict, optimizer_state_dict, epoch} (SURVEY.md C35).
        # full=True snapshots the whole PPOTrainState (live env states,
        # obs, PRNG key) so a killed run resumes bit-identically.
        if full:
            ckpt.save(self._ckpt_path(tag), self._full_payload(ts))
            return
        ckpt.save(self._ckpt_path(tag), {
            'params': ts.params, 'opt_state': ts.opt_state,
            'update': ts.update})

    def load_checkpoint(self, tag, ts: PPOTrainState,
                        full: bool = False) -> PPOTrainState:
        import jax.random as jrandom
        from marlsnake_tpu.utils import checkpoint as ckpt
        if full:
            restored = ckpt.restore(self._ckpt_path(tag),
                                    self._full_payload(ts))
            restored['key'] = jrandom.wrap_key_data(restored['key'])
            return ts.replace(**restored)
        try:
            restored = ckpt.restore(self._ckpt_path(tag), {
                'params': ts.params, 'opt_state': ts.opt_state,
                'update': ts.update})
        except (ValueError, KeyError):
            # legacy checkpoint (pre opt_state): cold optimizer moments
            restored = dict(ckpt.restore(self._ckpt_path(tag), {
                'params': ts.params, 'update': ts.update}))
            restored['opt_state'] = ts.opt_state
        return ts.replace(params=restored['params'],
                          opt_state=restored['opt_state'],
                          update=restored['update'])


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument('--updates', type=int, default=100)
    p.add_argument('--num-envs', type=int, default=64)
    p.add_argument('--no-log', action='store_true')
    args = p.parse_args()
    cfg = PPOConfig(num_updates=args.updates, num_envs=args.num_envs)
    PPOTrainer(cfg).train(log=not args.no_log)


if __name__ == '__main__':
    main()
