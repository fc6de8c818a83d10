"""Headline benchmark: env-steps/s/chip at 4096 parallel envs (20x20,
4 snakes) with the full on-device obs pipeline and auto-reset.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference implementation measured at 783 env-steps/s
(single env, single CPU core — BASELINE.md); the driver's build target is
>1M env-steps/s/chip (BASELINE.json).

The whole rollout (policy-free random actions -> step -> obs -> autoreset)
runs as one jitted lax.scan so per-step Python dispatch never touches the
hot loop.
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.envs.vector import build_vector_fns

BASELINE_STEPS_PER_SEC = 783.0  # reference single-env CPU (BASELINE.md)


def build_rollout(cfg: EnvConfig, num_envs: int, num_steps: int):
    reset_fn, step_fn = build_vector_fns(cfg, autoreset=True)

    @jax.jit
    def init(key):
        keys = jax.random.split(key, num_envs)
        states, _ = reset_fn(keys)
        return states

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rollout(states, key):
        def body(carry, _):
            states, key = carry
            key, k = jax.random.split(key)
            actions = jax.random.randint(
                k, (num_envs, cfg.num_snakes), 0, cfg.num_actions)
            states, out = step_fn(states, actions)
            # consume the observations so the full obs pipeline is part
            # of the measurement (a policy would read them every step):
            # every obs byte is read and the result is data-dependent.
            # The accumulator is uint8 (wrapping mod-256 checksum);
            # measured IDENTICAL to an int32 accumulator (6.18ms/64
            # steps either way at 4096 envs) — the pass is bound by the
            # 52MB obs write + read-back (~roofline), not by widening.
            obs_checksum = out.obs.sum(dtype=jnp.uint8)
            return (states, key), (out.reward.sum(), obs_checksum)

        (states, key), (rews, checks) = jax.lax.scan(
            body, (states, key), length=num_steps)
        return states, rews.sum() + checks.sum().astype(jnp.float32)

    return init, rollout


def main():
    num_envs = int(os.environ.get('BENCH_NUM_ENVS', 4096))
    num_steps = int(os.environ.get('BENCH_NUM_STEPS', 256))
    # default 'procedural': the opt-in arithmetic on-device reset — step
    # semantics are identical (oracle-equivalence-tested); only the reset
    # spawn distribution differs from the reference's DFS family, and the
    # latency-bound spawn-row gather (2.7ms/64 steps) leaves the program.
    # Set BENCH_SPAWN_MODE=pool for the default parity path's number.
    spawn_mode = os.environ.get('BENCH_SPAWN_MODE', 'procedural')
    cfg = EnvConfig(height=20, width=20, num_snakes=4, snake_length=3,
                    spawn_mode=spawn_mode)

    init, rollout = build_rollout(cfg, num_envs, num_steps)
    key = jax.random.key(0)
    states = init(key)

    # compile + warmup: TWO chained calls. Donation feeds the rollout's
    # OUTPUT states back as its input, and XLA may give the outputs
    # different layouts than init()'s — the second call then compiles
    # the steady-state layout signature. Without it, the first timed
    # block can overlap that background recompile (observed over the
    # axon tunnel: the block read 300x too fast).
    for w in range(2):
        states, r = rollout(states, jax.random.key(1 + 1_000_000 * w))
        float(r)

    # best-of-3 timed blocks: run-to-run noise over the TPU tunnel is
    # 5-8% (CLAUDE.md) and entirely host/tunnel-side, so the fastest
    # block is the honest device throughput. Each block ends with a
    # float() VALUE FETCH of the chained result — over the axon tunnel
    # block_until_ready() can return before in-flight work completes
    # (measured: a block read 1.7 ms while the fetch then waited 31 s);
    # only the device_get is a trustworthy sync here.
    iters = 4
    dts = []
    for block in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            states, r = rollout(states, jax.random.key(2 + block * iters + i))
        float(r)
        dts.append(time.perf_counter() - t0)

    total_env_steps = num_envs * num_steps * iters
    steps_per_sec = total_env_steps / min(dts)
    # median alongside best-of-3 so the spread is visible, not trusted
    median_sps = total_env_steps / sorted(dts)[len(dts) // 2]
    print(json.dumps({
        'metric': 'env-steps/s/chip at 4096 parallel envs (20x20, 4 snakes)',
        'value': round(steps_per_sec, 1),
        'unit': 'env-steps/s',
        'vs_baseline': round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
        'median': round(median_sps, 1),
        'spawn_mode': spawn_mode,
    }))


if __name__ == '__main__':
    main()
