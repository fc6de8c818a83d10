"""Capability demo: thousands of snake games in one jitted device program.

The reference's smoke script (test_env.py:1-25) drives ONE env from a
Python loop at ~783 steps/s. This demo runs a whole BATCH of envs as a
single ``lax.scan`` — random policy, fused auto-reset, obs/reward/done all
on device — then ASCII-renders one env from the batch and prints the
aggregate throughput. Nothing in the reference can execute this program.

Usage::

    python examples/demo.py                 # 1024 envs, 256 steps
    python examples/demo.py --envs 4096 --steps 512
    python examples/demo.py --cpu           # force CPU (e.g. no TPU)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

parser = argparse.ArgumentParser()
parser.add_argument('--envs', type=int, default=1024)
parser.add_argument('--steps', type=int, default=256)
parser.add_argument('--height', type=int, default=20)
parser.add_argument('--width', type=int, default=20)
parser.add_argument('--snakes', type=int, default=4)
parser.add_argument('--cpu', action='store_true')
args = parser.parse_args()

import jax

if args.cpu:
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp

from marlsnake_tpu.core.render import render_ascii
from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.envs.vector import build_vector_fns

cfg = EnvConfig(height=args.height, width=args.width,
                num_snakes=args.snakes, snake_length=5)
reset_fn, step_fn = build_vector_fns(cfg, autoreset=True)


@jax.jit
def rollout(key):
    """args.steps random-policy steps over the whole batch, one program."""
    k_reset, k_act = jax.random.split(key)
    states, obs = reset_fn(jax.random.split(k_reset, args.envs))

    def body(carry, k):
        states, fruit_count, done_count = carry
        acts = jax.random.randint(
            k, (args.envs, cfg.num_snakes), 0, cfg.num_actions)
        states, out = step_fn(states, acts)
        # a fruit step earns reward_fruit plus small time/lose terms
        fruit_count += (out.reward > 0.5 * cfg.reward('fruit')).sum()
        done_count += out.done.sum()
        return (states, fruit_count, done_count), None

    init = (states, jnp.int32(0), jnp.int32(0))
    (states, fruits, deaths), _ = jax.lax.scan(
        body, init, jax.random.split(k_act, args.steps))
    return states, fruits, deaths


print(f'{args.envs} envs x {args.steps} steps, '
      f'{args.height}x{args.width}, {args.snakes} snakes '
      f'on {jax.devices()[0].platform}...')
t0 = time.perf_counter()
states, fruits, deaths = jax.block_until_ready(rollout(jax.random.key(0)))
compile_and_run = time.perf_counter() - t0
t0 = time.perf_counter()
states, fruits, deaths = jax.block_until_ready(rollout(jax.random.key(1)))
run = time.perf_counter() - t0

total = args.envs * args.steps
print(f'first call (incl. compile): {compile_and_run:.2f}s; '
      f'steady state: {run:.3f}s = {total / run:,.0f} env-steps/s')
print(f'batch totals: {int(fruits)} fruits eaten, {int(deaths)} deaths '
      f'(envs auto-reset on episode end)')

print('\nenv 0 of the batch after the rollout:')
print(render_ascii(jax.device_get(states.grid[0])))
