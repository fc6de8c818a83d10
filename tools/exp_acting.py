"""Acting-path (policy-in-the-loop) variant matrix on the real TPU.

The policy-in-the-loop rollout (greedy DQN actions for all E*N agents,
one batched forward per env step — bench_table.measure_acting) runs at
~134k env-steps/s at 4096 envs vs 10.4M bare-engine: the 16,384-agent
forward is ~98.7%% of the step. This tool measures forward variants under
the SAME one-jitted-scan harness (CLAUDE.md: never trust per-call timeit
over the tunnel) so wins can be attributed and wired into
bench_table/dqn_trainer.

Variants:
  f32          today's row (DQN compute_dtype=f32, conditional /255)
  f32_nonorm   f32, assume_binary_obs (skip the whole-obs max reduce)
  bf16         bf16 convs/matmuls on the MXU (f32 params, casts at use)
  bf16_nonorm  bf16 + assume_binary_obs
  bf16_pad16   bf16_nonorm with obs zero-padded 8->16 channels before
               conv1 (identical math — extra kernel columns see zeros;
               probes whether the 3*3*8=72-deep contraction is starving
               the 128-lane MXU)

Usage: python tools/exp_acting.py [--envs 4096] [--steps 64] [--iters 3]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.envs.vector import build_vector_fns
from marlsnake_tpu.models.dqn import DQN


def measure(cfg, num_envs, num_steps, iters, net, pad_channels=0):
    reset_fn, step_fn = build_vector_fns(cfg, autoreset=True)
    e, n = num_envs, cfg.num_snakes

    def prep(obs):
        flat = obs.reshape((e * n,) + obs.shape[2:])
        if pad_channels:
            pad = [(0, 0)] * (flat.ndim - 1) + [(0, pad_channels)]
            flat = jnp.pad(flat, pad)
        return flat

    @jax.jit
    def init(key):
        keys = jax.random.split(key, e)
        states, obs = reset_fn(keys)
        params = net.init(jax.random.key(7), prep(obs)[:1])
        return states, obs, params

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def rollout(states, obs, params):
        def body(carry, _):
            states, obs = carry
            q = net.apply(params, prep(obs))
            actions = q.argmax(-1).astype(jnp.int32).reshape(e, n)
            states, out = step_fn(states, actions)
            return (states, out.obs), out.reward.sum()

        (states, obs), rews = jax.lax.scan(body, (states, obs),
                                           length=num_steps)
        return states, obs, rews.sum()

    states, obs, params = init(jax.random.key(0))
    states, obs, r = rollout(states, obs, params)
    r.block_until_ready()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        states, obs, r = rollout(states, obs, params)
        r.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    return (e * num_steps / best,
            sorted(times)[len(times) // 2] and e * num_steps
            / sorted(times)[len(times) // 2])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--envs', type=int, default=4096)
    ap.add_argument('--steps', type=int, default=64)
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--variants', type=str, default='')
    args = ap.parse_args()

    cfg = EnvConfig(height=20, width=20, num_snakes=4, snake_length=3)
    A = cfg.num_actions
    variants = {
        'f32': (DQN(num_actions=A), 0),
        'f32_nonorm': (DQN(num_actions=A, assume_binary_obs=True), 0),
        'bf16': (DQN(num_actions=A, compute_dtype=jnp.bfloat16), 0),
        'bf16_nonorm': (DQN(num_actions=A, compute_dtype=jnp.bfloat16,
                            assume_binary_obs=True), 0),
        'bf16_pad16': (DQN(num_actions=A, compute_dtype=jnp.bfloat16,
                           assume_binary_obs=True), 8),
    }
    sel = [v for v in args.variants.split(',') if v] or list(variants)
    for name in sel:
        net, pad = variants[name]
        best, med = measure(cfg, args.envs, args.steps, args.iters,
                            net, pad_channels=pad)
        print(json.dumps({'variant': name, 'env_steps_per_sec': round(best),
                          'median': round(med)}), flush=True)


if __name__ == '__main__':
    main()
