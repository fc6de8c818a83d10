"""Parameter-shared multi-agent DQN trainer.

Re-design of the reference trainer (``train_dqn.py:26-383``) with identical
algorithm semantics and hyperparameter defaults:

* one shared policy/target DQN serves every snake (train_dqn.py:202-217);
* per-agent epsilon-greedy actions, shared uniform replay, per-env-step
  optimization (smooth-L1 TD loss, grad-clip 10, Adam — :228-257);
* epsilon decay x0.9995 per episode, target sync every 100 episodes
  (:313-317); early-death reward shaping (:294-295);
* TensorBoard scalars Train/{Mean_Reward, Epsilon, Episode_Length, Loss}
  (:324-328); best/periodic/keep-last-N checkpoints + resume (:336-383).

TPU-native differences: the whole episode — action selection for all
(num_envs x num_snakes) agents in ONE batched forward pass (the reference
runs a separate batch-1 forward per agent per step, :280-285), env step,
replay push, and the TD update — runs as a single jitted ``lax.scan``
on-device. ``num_envs > 1`` scales the same algorithm across a batch of
envs; the replay and learner are shared.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from marlsnake_tpu.algo import replay
from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.envs.vector import build_vector_fns
from marlsnake_tpu.models.dqn import DQN
from marlsnake_tpu.utils import checkpoint as ckpt
from marlsnake_tpu.utils.metrics import MetricWriter


@dataclasses.dataclass
class DQNConfig:
    """Mirrors the reference ``Config`` (train_dqn.py:26-82)."""
    # environment
    num_snakes: int = 4
    height: int = 20
    width: int = 20
    snake_length: int = 5
    vision_range: Optional[int] = None
    frame_stack: int = 1
    # training
    num_episodes: int = 50_000
    max_steps_per_episode: int = 256
    batch_size: int = 512
    gamma: float = 0.99
    lr: float = 5e-4
    epsilon_start: float = 1.0
    epsilon_end: float = 0.05
    epsilon_decay: float = 0.9995
    buffer_size: int = 10_000
    min_buffer_size: int = 512 * 3
    target_update_freq: int = 100
    # reward shaping (train_dqn.py:53-71)
    early_death_threshold: int = 10
    early_death_penalty: float = -1.0
    reward_dict: Any = dataclasses.field(default_factory=lambda: {
        'fruit': 1.0, 'kill': 0.0, 'lose': 0.0, 'win': 0.0, 'time': 0.0})
    # checkpoints & logs
    save_freq: int = 500
    save_best_only: bool = True
    keep_last_n: int = 3
    save_dir: str = 'checkpoints'
    log_dir: str = 'runs_dqn'
    resume_from: Optional[str] = None
    # TPU scaling knobs (no reference analog)
    num_envs: int = 1
    seed: int = 0
    compute_dtype: Any = jnp.float32
    # The engine's obs are one-hot {0,1} planes, so the reference's
    # conditional /255 (train_dqn.py:123) never divides: skipping its
    # whole-obs max reduce is BIT-IDENTICAL for engine observations and
    # was ~7ms/step of the 16k-agent acting forward (NEXT_STEPS.md
    # round-3 matrix). Set False only for non-engine (0..255) inputs.
    assume_binary_obs: bool = True
    # Zero-pad obs channels before conv1 (exact math — the extra kernel
    # columns see zeros). 8->16 fills the MXU contraction: +18%
    # acting throughput measured at 4096 envs. OPT-IN because it widens
    # conv1's kernel to (3, 3, 8+pad, 32), changing checkpoint topology
    # vs the reference's exact shape. Padded-trained params are NOT
    # directly consumable by consumers that apply the net on raw
    # 8-channel obs (opponents.DQNAgent/NEATAgent, neat_hybrid embeds)
    # — the pad width is persisted next to every checkpoint
    # (save_checkpoint meta) so such consumers can re-pad to match.
    obs_pad_channels: int = 0
    # Opt-in bit-packed env observations (EnvConfig.obs_format): the env
    # emits (H, W, frame_stack) packed bytes instead of the 8x-larger
    # one-hot planes — the replay buffer shrinks 8x and the rollout's
    # obs stream leaves the HBM roofline; the net ingress unpacks to the
    # EXACT uint8 planes (ops/obs_pack.unpack_obs, bit-identical), so
    # training math is unchanged. Default stays the reference contract.
    obs_format: str = 'uint8'
    # Re-encode the acting forward's observation from the carried env
    # GRID at policy ingress instead of reading the carried obs (the
    # bench acting row's round-4 win, NEXT_STEPS.md): bit-identical for
    # full-obs frame_stack=1 uint8 configs (obs is a pure function of
    # the grid and the trainer's carry keeps them in lockstep;
    # tests/test_algo.py proves trajectory equality).
    #
    # MEASURED AND REFUTED inside the trainer (round 5, real chip,
    # bf16+pad16 acting knobs, artifacts/LEARNER_CHUNK.json): 0.98x at
    # e=32 (385.7 -> 392.8 ms/episode), 0.98x at e=256, 0.92x at
    # e=2048 — measured pre-encode-rewrite, when both programs ran the
    # same trajectories. Unlike the bench acting row — where dropping
    # obs from the scan carry DCE'd the env's own encode (268k -> 327k)
    # — the trainer MUST keep obs in the carry for the replay push, so
    # the re-encode is pure extra compute and only the pad copy could
    # have been saved. After the round-5 encode rewrite the margin is
    # within noise, but the two modes are no longer per-episode
    # comparable under bf16: the program change shifts accumulation
    # order, Q near-ties flip, and episode LENGTHS diverge (the
    # artifact's e=256 rows show 174- vs 254-step episodes). Kept
    # opt-in as the recorded experiment; default off.
    reencode_acting_obs: Optional[bool] = None
    # Opt-in learner pacing (defaults = the reference's 1-update-per-
    # env-step contract, train_dqn.py:228-257).
    #
    # update_every=K runs K env steps between optimizer updates — the
    # DQN-Nature "update frequency" knob. MEASURED on the real chip
    # (tools/bench_learner_chunk.py, 20x20x4, 256-step episodes):
    # K=4 gives 2.2x episode throughput at e=32 (412 -> 186 ms) and
    # 1.16x at e=256 (1275 -> 1095 ms, where acting/env dominate),
    # because the TD update is compute-bound per SAMPLE: batching K
    # updates into one K*batch minibatch measured FLAT-to-worse
    # (K=4/8/16 all within noise of K=1 — a bigger conv fwd+bwd costs
    # proportionally more, nothing amortizes). Fewer gradient steps is
    # the only lever that pays, so it is explicit and opt-in.
    #
    # update_batch_size sets the per-update minibatch (None = batch_size)
    # — e.g. update_every=4, update_batch_size=4*512 preserves the
    # reference's gradient-sample throughput exactly (the measured-flat
    # configuration). update_every must divide max_steps_per_episode.
    update_every: int = 1
    update_batch_size: Optional[int] = None
    # Opt-in fused acting+update (TPU translation of "overlap acting and
    # updating": the chip executes kernels sequentially, so overlap means
    # ONE batched program, not concurrent streams). The TD minibatch is
    # sampled BEFORE the step's push (one step staler than the
    # reference's sample-after-push; same per-episode update count, and
    # warmup crosses min_buffer_size one step later) — that breaks the
    # act->env->push->sample->update serial chain, so the acting forward
    # (E*N rows) and the TD loss forward (batch rows) run as a single
    # (E*N + batch)-row conv stack inside one value_and_grad (acting
    # q-values are a stop_gradient aux output). Requires update_every=1.
    #
    # MEASURED AND REFUTED on the real chip (tools/bench_learner_chunk,
    # 20x20x4, 256-step episodes, batch 512): 0.89x at e=32 (396 ->
    # 444 ms/episode) and 0.70x at e=256 (1055 -> 1510 ms). The grad
    # BACKWARD runs over the whole concatenated batch — XLA cannot skip
    # the acting rows' zero cotangents, so fusing adds (E*N)/batch extra
    # backward FLOPs (25% at e=32, 200% at e=256), which costs more than
    # the saved standalone forward. Kept as an opt-in experimental mode;
    # ``update_every`` is the knob that actually pays (2.18x at e=32).
    fused_act_update: bool = False

    def env_config(self) -> EnvConfig:
        return EnvConfig.from_reward_dict(
            self.reward_dict, height=self.height, width=self.width,
            num_snakes=self.num_snakes, snake_length=self.snake_length,
            vision_range=self.vision_range, frame_stack=self.frame_stack,
            obs_format=self.obs_format)


@struct.dataclass
class TrainState:
    params: Any
    target_params: Any
    opt_state: Any
    buffer: replay.ReplayBuffer
    epsilon: jnp.ndarray       # () float32
    episode: jnp.ndarray       # () int32
    global_step: jnp.ndarray   # () int32 — optimizer updates performed
    key: jnp.ndarray


@struct.dataclass
class EpisodeMetrics:
    mean_reward: jnp.ndarray     # () float32 — mean total shaped reward
    mean_loss: jnp.ndarray       # () float32
    episode_length: jnp.ndarray  # () float32 — steps until all done
    updates: jnp.ndarray         # () int32


class DQNTrainer:
    """Single-device trainer; pass ``axis_name`` to make the episode body
    SPMD-safe for use under ``shard_map`` (gradients are ``pmean``-reduced
    over the mesh axis, per-device RNG is decorrelated by folding in the
    axis index, and the buffer-ready predicate is all-reduced so every
    device takes the optimizer-update branch in lockstep)."""

    def __init__(self, config: DQNConfig, axis_name: Optional[str] = None):
        self.axis_name = axis_name
        self.config = config
        if config.max_steps_per_episode % config.update_every != 0:
            raise ValueError(
                f'update_every={config.update_every} must divide '
                f'max_steps_per_episode={config.max_steps_per_episode}')
        if config.fused_act_update and config.update_every != 1:
            raise ValueError(
                'fused_act_update requires update_every=1 (it fuses the '
                'per-step update into the acting forward)')
        self.env_cfg = config.env_config()
        self.net = DQN(num_actions=self.env_cfg.num_actions,
                       compute_dtype=config.compute_dtype,
                       assume_binary_obs=config.assume_binary_obs)
        self.tx = optax.chain(
            optax.clip_by_global_norm(10.0),  # train_dqn.py:254
            optax.adam(config.lr))
        self._reset_env, self._step_env = build_vector_fns(
            self.env_cfg, autoreset=False)
        self._train_episode = jax.jit(self._episode_impl)
        self.best_mean_reward = float('-inf')
        self.writer = None

    # ------------------------------------------------------------------
    def init_state(self, key=None) -> TrainState:
        cfg = self.config
        if key is None:
            key = jax.random.key(cfg.seed)
        k_param, key = jax.random.split(key)
        obs_shape = self.env_cfg.obs_shape[1:]  # per-agent (H, W, C)
        # init through _prep so the param shapes match the prepped obs
        # (unpack for packed format, channel pad) exactly
        dummy = self._prep(jnp.zeros((1,) + obs_shape, jnp.uint8))
        params = self.net.init(k_param, dummy)
        return TrainState(
            params=params,
            target_params=params,
            opt_state=self.tx.init(params),
            buffer=replay.create(cfg.buffer_size, obs_shape),
            epsilon=jnp.float32(cfg.epsilon_start),
            episode=jnp.int32(0),
            global_step=jnp.int32(0),
            key=key,
        )

    # ------------------------------------------------------------------
    def _prep(self, flat_obs):
        """Net-ingress obs transform: unpack packed bytes to the exact
        uint8 planes (obs_format='packed'), then zero-pad obs channels
        (cfg.obs_pad_channels; exact math — the widened conv1 kernel
        sees zeros)."""
        if self.config.obs_format == 'packed':
            from marlsnake_tpu.ops.obs_pack import unpack_obs
            flat_obs = unpack_obs(flat_obs)
        pad = self.config.obs_pad_channels
        if not pad:
            return flat_obs
        return jnp.pad(flat_obs,
                       [(0, 0)] * (flat_obs.ndim - 1) + [(0, pad)])

    def _acting_exact(self) -> bool:
        """True when re-encoding the acting obs from the grid is
        bit-identical to the carried obs (see reencode_acting_obs)."""
        cfg = self.config
        return (cfg.frame_stack == 1 and not cfg.vision_range
                and cfg.obs_format == 'uint8')

    def _acting_obs(self, env_states, obs):
        on = self.config.reencode_acting_obs
        if not on:  # None (auto) = off: measured a loss at every scale
            return obs
        if not self._acting_exact():
            raise ValueError(
                'reencode_acting_obs requires full-obs frame_stack=1 '
                "uint8 configs (obs must be a pure function of the grid)")
        from marlsnake_tpu.core import engine
        return jax.vmap(
            lambda g: engine.encode_frame(self.env_cfg, g))(
                env_states.grid)

    def _select_actions(self, params, obs, dones, eps, key):
        """Batched epsilon-greedy for (E, N) agents in one forward pass."""
        e, n = obs.shape[:2]
        flat = obs.reshape((e * n,) + obs.shape[2:])
        q = self.net.apply(params, self._prep(flat))  # (E*N, A)
        greedy = jnp.argmax(q, axis=-1).astype(jnp.int32).reshape(e, n)
        k1, k2 = jax.random.split(key)
        rand = jax.random.randint(k1, (e, n), 0, self.env_cfg.num_actions)
        explore = jax.random.uniform(k2, (e, n)) < eps
        acts = jnp.where(explore, rand, greedy)
        # dead agents act 0 (train_dqn.py:281-283)
        return jnp.where(dones, 0, acts)

    def _td_update(self, params, target_params, opt_state, batch):
        obs, action, rew, next_obs, done = batch
        cfg = self.config

        def loss_fn(p):
            q = self.net.apply(p, self._prep(obs))
            q_sa = jnp.take_along_axis(q, action[:, None], axis=-1)[:, 0]
            next_q = self.net.apply(target_params,
                                    self._prep(next_obs)).max(axis=-1)
            target = rew + (1.0 - done.astype(jnp.float32)) * cfg.gamma \
                * jax.lax.stop_gradient(next_q)
            return optax.huber_loss(q_sa, target, delta=1.0).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        if self.axis_name is not None:
            grads = jax.lax.pmean(grads, self.axis_name)
            loss = jax.lax.pmean(loss, self.axis_name)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # ------------------------------------------------------------------
    def _episode_impl(self, ts: TrainState
                      ) -> Tuple[TrainState, EpisodeMetrics]:
        cfg = self.config
        e, n = cfg.num_envs, cfg.num_snakes

        key, k_reset, key_next = jax.random.split(ts.key, 3)
        if self.axis_name is not None:
            # decorrelate per-device streams; ts.key itself advances via
            # key_next, which stays replicated across the mesh
            idx = jax.lax.axis_index(self.axis_name)
            k_reset = jax.random.fold_in(k_reset, idx)
            key = jax.random.fold_in(key, idx + 1_000_003)
        reset_keys = jax.random.split(
            jax.random.fold_in(k_reset, ts.episode), e)
        env_states, obs = self._reset_env(reset_keys)

        def advance(carry, actions):
            """Env step, reward shaping, replay push, env freeze — the
            post-acting part of one step, shared by the default and
            fused bodies."""
            (env_states, obs, dones, buffer, params, opt_state, key,
             ep_rew, loss_sum, loss_cnt, step, frozen) = carry
            new_env_states, out = self._step_env(env_states, actions)

            # early-death shaping (train_dqn.py:294-297)
            shaped = out.reward + jnp.where(
                out.done & (step < cfg.early_death_threshold),
                cfg.early_death_penalty, 0.0)
            push_mask = ~dones & ~frozen[:, None]  # agents alive at step
            flat = lambda x: x.reshape((e * n,) + x.shape[2:])
            buffer = replay.push(
                buffer, flat(obs), flat(actions), flat(shaped),
                flat(out.obs), flat(out.done), mask=flat(push_mask))
            ep_rew = ep_rew + jnp.where(push_mask, shaped, 0.0)

            # freeze finished envs (reference: while not all(dones))
            new_frozen = frozen | out.done.all(axis=-1)
            sel = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(
                    frozen.reshape((-1,) + (1,) * (a.ndim - 1)), b, a),
                new, old)
            env_states = sel(new_env_states, env_states)
            obs = sel(out.obs, obs)
            dones = sel(out.done, dones)
            step = step + jnp.where(frozen.all(), 0, 1)
            return (env_states, obs, dones, buffer, params, opt_state,
                    key, ep_rew, loss_sum, loss_cnt, step,
                    new_frozen)

        def env_step(carry):
            """One env step: act, step, shape, push — no learner work.
            Returns (carry, k_sample) with the same per-step key-split
            pattern whatever the update mode, so the K=1 default path's
            RNG stream is byte-identical to the reference semantics."""
            (env_states, obs, dones, buffer, params, opt_state, key,
             ep_rew, loss_sum, loss_cnt, step, frozen) = carry
            key, k_act, k_sample = jax.random.split(key, 3)
            actions = self._select_actions(
                params, self._acting_obs(env_states, obs), dones,
                ts.epsilon, k_act)
            carry = (env_states, obs, dones, buffer, params, opt_state,
                     key, ep_rew, loss_sum, loss_cnt, step, frozen)
            return advance(carry, actions), k_sample

        def fused_step(carry):
            """Fused acting+update (cfg.fused_act_update): the TD
            minibatch is sampled from the PRE-push buffer, so the acting
            forward and the TD loss forward share one (E*N + batch)-row
            conv stack inside a single value_and_grad (acting q-values
            are a stop_gradient aux). Same key-split pattern as
            env_step; the sample key is consumed one step earlier."""
            (env_states, obs, dones, buffer, params, opt_state, key,
             ep_rew, loss_sum, loss_cnt, step, frozen) = carry
            key, k_act, k_sample = jax.random.split(key, 3)
            can_update = (buffer.size >= cfg.min_buffer_size) \
                & ~frozen.all()
            if self.axis_name is not None:
                can_update = jax.lax.pmin(
                    can_update.astype(jnp.int32), self.axis_name) > 0
            flat_obs = self._prep(
                obs.reshape((e * n,) + obs.shape[2:]))
            batch = replay.sample(buffer, k_sample, upd_batch)

            def with_update(args):
                params, opt_state = args
                b_obs, b_act, b_rew, b_next, b_done = batch

                def loss_fn(p):
                    q_all = self.net.apply(p, jnp.concatenate(
                        [flat_obs,
                         self._prep(b_obs.astype(flat_obs.dtype))], 0))
                    q_act = jax.lax.stop_gradient(q_all[:e * n])
                    q_sa = jnp.take_along_axis(
                        q_all[e * n:], b_act[:, None], axis=-1)[:, 0]
                    next_q = self.net.apply(
                        ts.target_params, self._prep(b_next)).max(axis=-1)
                    target = b_rew + (1.0 - b_done.astype(jnp.float32)) \
                        * cfg.gamma * jax.lax.stop_gradient(next_q)
                    loss = optax.huber_loss(q_sa, target,
                                            delta=1.0).mean()
                    return loss, q_act

                (loss, q_act), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                if self.axis_name is not None:
                    grads = jax.lax.pmean(grads, self.axis_name)
                    loss = jax.lax.pmean(loss, self.axis_name)
                updates, opt_state = self.tx.update(grads, opt_state,
                                                    params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss, jnp.float32(1.0), q_act

            def no_update(args):
                params, opt_state = args
                q_act = self.net.apply(params, flat_obs)
                return (params, opt_state, jnp.float32(0.0),
                        jnp.float32(0.0), q_act)

            params, opt_state, loss, cnt, q_act = jax.lax.cond(
                can_update, with_update, no_update, (params, opt_state))

            greedy = jnp.argmax(q_act, axis=-1).astype(
                jnp.int32).reshape(e, n)
            k1, k2 = jax.random.split(k_act)
            rand = jax.random.randint(k1, (e, n), 0,
                                      self.env_cfg.num_actions)
            explore = jax.random.uniform(k2, (e, n)) < ts.epsilon
            actions = jnp.where(explore, rand, greedy)
            actions = jnp.where(dones, 0, actions)

            carry = (env_states, obs, dones, buffer, params, opt_state,
                     key, ep_rew, loss_sum + loss, loss_cnt + cnt, step,
                     frozen)
            return advance(carry, actions)

        def update_once(carry, k_sample, batch_size):
            """One cond'd optimizer step over a ``batch_size`` minibatch
            while the episode is live and the buffer is warm."""
            (env_states, obs, dones, buffer, params, opt_state, key,
             ep_rew, loss_sum, loss_cnt, step, frozen) = carry
            can_update = (buffer.size >= cfg.min_buffer_size) \
                & ~frozen.all()
            if self.axis_name is not None:
                # uniform predicate across the mesh so every device enters
                # the (collective-containing) update branch together
                can_update = jax.lax.pmin(
                    can_update.astype(jnp.int32), self.axis_name) > 0

            def do_update(args):
                params, opt_state = args
                batch = replay.sample(buffer, k_sample, batch_size)
                p2, o2, loss = self._td_update(
                    params, ts.target_params, opt_state, batch)
                return p2, o2, loss, jnp.float32(1.0)

            params, opt_state, loss, cnt = jax.lax.cond(
                can_update, do_update,
                lambda args: (args[0], args[1], jnp.float32(0.0),
                              jnp.float32(0.0)),
                (params, opt_state))
            return (env_states, obs, dones, buffer, params, opt_state,
                    key, ep_rew, loss_sum + loss, loss_cnt + cnt, step,
                    frozen)

        k_every = cfg.update_every
        upd_batch = cfg.update_batch_size or cfg.batch_size

        if cfg.fused_act_update:
            def body(carry, _):
                return fused_step(carry), None
        elif k_every == 1:
            # reference contract: one optimizer step per env step
            def body(carry, _):
                carry, k_sample = env_step(carry)
                return update_once(carry, k_sample, upd_batch), None
        else:
            # opt-in paced mode: K env steps, then one update
            def body(carry, _):
                def inner(c, _):
                    c, k_sample = env_step(c)
                    return c, k_sample

                carry, k_samples = jax.lax.scan(inner, carry,
                                                length=k_every)
                return update_once(carry, k_samples[-1], upd_batch), None

        dones0 = jnp.zeros((e, n), bool)
        ep_rew0 = jnp.zeros((e, n), jnp.float32)
        step0 = jnp.int32(0)
        frozen0 = jnp.zeros((e,), bool)
        if self.axis_name is not None:
            # these carries transition to device-varying inside the scan;
            # mark them varying up front for shard_map's vma checker
            # (constant-initialized env-state leaves like epi stats too)
            def cast(x):
                aval = jax.typeof(x)
                if self.axis_name in getattr(aval, 'vma', ()):
                    return x  # already device-varying
                return jax.lax.pcast(x, (self.axis_name,), to='varying')

            dones0, ep_rew0, step0, frozen0 = map(
                cast, (dones0, ep_rew0, step0, frozen0))
            env_states = jax.tree.map(cast, env_states)
            obs = cast(obs)
        init = (env_states, obs, dones0, ts.buffer,
                ts.params, ts.opt_state, key,
                ep_rew0, jnp.float32(0.0),
                jnp.float32(0.0), step0, frozen0)
        carry, _ = jax.lax.scan(
            body, init, length=cfg.max_steps_per_episode // k_every)
        (env_states, obs, dones, buffer, params, opt_state, key,
         ep_rew, loss_sum, loss_cnt, step, frozen) = carry

        episode = ts.episode + 1
        epsilon = jnp.maximum(cfg.epsilon_end,
                              ts.epsilon * cfg.epsilon_decay)
        target_params = jax.tree.map(
            lambda p, t: jnp.where(episode % cfg.target_update_freq == 0,
                                   p, t),
            params, ts.target_params)

        metrics = EpisodeMetrics(
            mean_reward=ep_rew.mean(),
            mean_loss=jnp.where(loss_cnt > 0, loss_sum / loss_cnt, 0.0),
            episode_length=step.astype(jnp.float32),
            updates=loss_cnt.astype(jnp.int32),
        )
        if self.axis_name is not None:
            metrics = metrics.replace(
                mean_reward=jax.lax.pmean(metrics.mean_reward,
                                          self.axis_name),
                mean_loss=jax.lax.pmean(metrics.mean_loss, self.axis_name),
                episode_length=jax.lax.pmean(metrics.episode_length,
                                             self.axis_name),
                updates=jax.lax.pmax(metrics.updates, self.axis_name))
        ts = ts.replace(params=params, target_params=target_params,
                        opt_state=opt_state, buffer=buffer,
                        epsilon=epsilon, episode=episode,
                        global_step=ts.global_step + metrics.updates,
                        key=key_next)
        return ts, metrics

    # ------------------------------------------------------------------
    def train(self, num_episodes: Optional[int] = None,
              log: bool = True) -> TrainState:
        cfg = self.config
        num_episodes = num_episodes or cfg.num_episodes
        ts = self.init_state()
        start_ep = 1
        if cfg.resume_from:
            ts, extra = self.load_checkpoint(cfg.resume_from, ts)
            start_ep = int(ts.episode) + 1
            self.best_mean_reward = extra.get('best_mean_reward',
                                             float('-inf'))

        if log:
            from datetime import datetime
            run_dir = os.path.join(
                cfg.log_dir, datetime.now().strftime('%Y%m%d-%H%M%S'))
            self.writer = MetricWriter(run_dir)
        os.makedirs(cfg.save_dir, exist_ok=True)
        history = []

        t0 = time.time()
        for ep in range(start_ep, num_episodes + 1):
            ts, m = self._train_episode(ts)
            if ep % 10 == 0 or ep == num_episodes:
                mr = float(m.mean_reward)
                ml = float(m.mean_loss)
                if self.writer:
                    self.writer.add_scalar('Train/Mean_Reward', mr, ep)
                    self.writer.add_scalar('Train/Epsilon',
                                           float(ts.epsilon), ep)
                    self.writer.add_scalar('Train/Episode_Length',
                                           float(m.episode_length), ep)
                    if ml > 0:
                        self.writer.add_scalar('Train/Loss', ml, ep)
                print(f'Ep {ep:5d} | Mean Reward: {mr:6.2f} | '
                      f'Loss: {ml:.4f} | eps: {float(ts.epsilon):.3f} | '
                      f'Steps: {float(m.episode_length):.0f} | '
                      f'{(time.time() - t0):.1f}s')
            if cfg.save_best_only and ep >= 50:
                mr = float(m.mean_reward)
                if mr > self.best_mean_reward:
                    self.best_mean_reward = mr
                    self.save_checkpoint(ts, 'best')
            if cfg.save_freq and ep % cfg.save_freq == 0:
                self.save_checkpoint(ts, ep)
                history.append(ep)
                if len(history) > cfg.keep_last_n:
                    self.delete_checkpoint(history.pop(0))
        self.save_checkpoint(ts, 'final')
        if self.writer:
            self.writer.close()
        return ts

    # --- checkpointing (orbax) ----------------------------------------
    def _ckpt_path(self, tag) -> str:
        return os.path.abspath(
            os.path.join(self.config.save_dir, f'shared_model_{tag}'))

    def save_checkpoint(self, ts: TrainState, tag, full: bool = False):
        # opt_state rides along so a resumed run continues with warm Adam
        # moments, matching the reference's optimizer.state_dict() in
        # every checkpoint (train_dqn.py:357-365, restore :369-377).
        # full=True additionally snapshots the replay buffer and PRNG key
        # (the whole TrainState), so a killed run resumes with a loss
        # trajectory BIT-IDENTICAL to the uninterrupted one — something
        # the reference cannot do (its buffer dies with the process).
        payload = {
            'params': ts.params, 'target_params': ts.target_params,
            'opt_state': ts.opt_state, 'global_step': ts.global_step,
            'epsilon': ts.epsilon, 'episode': ts.episode,
            'best_mean_reward': jnp.float32(self.best_mean_reward),
        }
        if full:
            payload['buffer'] = ts.buffer
            payload['key'] = jax.random.key_data(ts.key)
        path = self._ckpt_path(tag)
        ckpt.save(path, payload)
        # sidecar (not in the orbax tree: stays loadable by templates
        # that predate it): topology knobs a consumer needs to apply
        # these params on raw engine obs (see obs_pad_channels)
        import json
        with open(path + '.meta.json', 'w') as f:
            json.dump({'obs_pad_channels': self.config.obs_pad_channels,
                       'obs_format': self.config.obs_format}, f)

    def load_checkpoint(self, tag, ts: TrainState, full: bool = False):
        template = {
            'params': ts.params, 'target_params': ts.target_params,
            'opt_state': ts.opt_state, 'global_step': ts.global_step,
            'epsilon': ts.epsilon, 'episode': ts.episode,
            'best_mean_reward': jnp.float32(0.0),
        }
        if full:
            template['buffer'] = ts.buffer
            template['key'] = jax.random.key_data(ts.key)
            restored = ckpt.restore(self._ckpt_path(tag), template)
            ts = ts.replace(
                params=restored['params'],
                target_params=restored['target_params'],
                opt_state=restored['opt_state'],
                global_step=restored['global_step'],
                epsilon=restored['epsilon'], episode=restored['episode'],
                buffer=restored['buffer'],
                key=jax.random.wrap_key_data(restored['key']))
            return ts, {'best_mean_reward':
                        float(restored['best_mean_reward'])}
        try:
            restored = ckpt.restore(self._ckpt_path(tag), template)
        except (ValueError, KeyError):
            # legacy checkpoint (pre opt_state): restore what it has and
            # keep the fresh optimizer state (cold Adam moments)
            legacy = {k: template[k] for k in
                      ('params', 'target_params', 'epsilon', 'episode',
                       'best_mean_reward')}
            restored = dict(ckpt.restore(self._ckpt_path(tag), legacy))
            restored['opt_state'] = ts.opt_state
            restored['global_step'] = ts.global_step
        ts = ts.replace(params=restored['params'],
                        target_params=restored['target_params'],
                        opt_state=restored['opt_state'],
                        global_step=restored['global_step'],
                        epsilon=restored['epsilon'],
                        episode=restored['episode'])
        return ts, {'best_mean_reward':
                    float(restored['best_mean_reward'])}

    def delete_checkpoint(self, tag):
        import shutil
        path = self._ckpt_path(tag)
        if os.path.exists(path):
            shutil.rmtree(path, ignore_errors=True)


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument('--episodes', type=int, default=200)
    p.add_argument('--num-envs', type=int, default=1)
    p.add_argument('--height', type=int, default=20)
    p.add_argument('--width', type=int, default=20)
    p.add_argument('--num-snakes', type=int, default=4)
    p.add_argument('--resume', type=str, default=None)
    p.add_argument('--no-log', action='store_true')
    args = p.parse_args()
    cfg = DQNConfig(num_episodes=args.episodes, num_envs=args.num_envs,
                    height=args.height, width=args.width,
                    num_snakes=args.num_snakes, resume_from=args.resume)
    DQNTrainer(cfg).train(log=not args.no_log)


if __name__ == '__main__':
    main()
