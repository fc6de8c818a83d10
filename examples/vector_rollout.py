"""Scale demo: thousands of envs stepped by one jitted program.

This is what replaces the reference's fork-worker vectorization
(wrappers.py:126-194): the env batch lives on-device as a single PyTree
and the whole rollout is one XLA program.
"""

import sys
import time

sys.path.insert(0, '..')

import jax
import jax.numpy as jnp

from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.envs.vector import build_vector_fns

NUM_ENVS = 4096
STEPS = 256

cfg = EnvConfig(height=20, width=20, num_snakes=4, snake_length=3)
reset_fn, step_fn = build_vector_fns(cfg, autoreset=True)


@jax.jit
def rollout(key):
    keys = jax.random.split(key, NUM_ENVS)
    states, _ = reset_fn(keys)

    def body(carry, _):
        states, key = carry
        key, k = jax.random.split(key)
        actions = jax.random.randint(k, (NUM_ENVS, cfg.num_snakes), 0, 3)
        states, out = step_fn(states, actions)
        return (states, key), out.reward.mean()

    (states, _), rews = jax.lax.scan(body, (states, key), length=STEPS)
    return rews.mean()


if __name__ == '__main__':
    r = rollout(jax.random.key(0))  # compile
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = rollout(jax.random.key(1))
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    print(f'{NUM_ENVS * STEPS / dt:,.0f} env-steps/s '
          f'({NUM_ENVS} envs x {STEPS} steps in {dt:.2f}s), '
          f'mean reward {float(r):.4f}')
