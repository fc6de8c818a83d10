"""Device-trace attribution for the policy-in-the-loop acting rollout.

Usage: python tools/trace_acting.py [variant] [num_envs] [num_steps]
(variant from tools/exp_acting.py; default bf16_nonorm). Prints the
top-k XLA ops by total device time. Trace ONLY for attribution — the
profiler inflates wall ~30x over the tunnel (NEXT_STEPS.md).
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.models.dqn import DQN
from tools.exp_acting import measure


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else 'bf16_nonorm'
    num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    num_steps = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    cfg = EnvConfig(height=20, width=20, num_snakes=4, snake_length=3)
    A = cfg.num_actions
    nets = {
        'f32': (DQN(num_actions=A), 0),
        'f32_nonorm': (DQN(num_actions=A, assume_binary_obs=True), 0),
        'bf16': (DQN(num_actions=A, compute_dtype=jnp.bfloat16), 0),
        'bf16_nonorm': (DQN(num_actions=A, compute_dtype=jnp.bfloat16,
                            assume_binary_obs=True), 0),
        'bf16_pad16': (DQN(num_actions=A, compute_dtype=jnp.bfloat16,
                           assume_binary_obs=True), 8),
    }
    net, pad = nets[variant]

    # reuse the exp harness; trace wraps ONE extra rollout call
    import functools
    import tools.exp_acting as X

    log_dir = '/tmp/snake_trace_acting'
    os.system(f'rm -rf {log_dir}')

    orig_measure = X.measure

    # run warmup + one traced block by instrumenting measure's loop via
    # a tiny iters count and tracing around the timed section
    from marlsnake_tpu.envs.vector import build_vector_fns
    reset_fn, step_fn = build_vector_fns(cfg, autoreset=True)
    e, n = num_envs, cfg.num_snakes

    def prep(obs):
        flat = obs.reshape((e * n,) + obs.shape[2:])
        if pad:
            flat = jnp.pad(flat, [(0, 0)] * (flat.ndim - 1) + [(0, pad)])
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

    jax.profiler.start_trace(log_dir)
    states, obs, r = rollout(states, obs, params)
    r.block_until_ready()
    jax.profiler.stop_trace()

    paths = glob.glob(f'{log_dir}/**/*.trace.json.gz', recursive=True)
    assert paths, f'no trace under {log_dir}'
    with gzip.open(paths[0], 'rt') as f:
        trace = json.load(f)
    events = [ev for ev in trace['traceEvents']
              if ev.get('ph') == 'X' and 'dur' in ev and ev.get('args')]
    by_op = collections.Counter()
    meta = {}
    for ev in events:
        args = ev['args']
        if 'long_name' in args or 'hlo_op' in args or 'hlo_module' in args:
            by_op[ev['name']] += ev['dur']
            if ev['dur'] >= meta.get(ev['name'], (-1,))[0]:
                meta[ev['name']] = (ev['dur'], args.get('source', ''),
                                    args.get('tf_op', ''))
    total = sum(by_op.values())
    print(f'[{variant}] total attributed device time: {total/1e3:.2f} ms '
          f'({num_envs}x{num_steps} env-steps)')
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, dur in by_op.most_common(int(os.environ.get('TRACE_TOP', 25))):
        _, src, tf_op = meta[name]
        src = src.replace(repo_root + '/', '')
        print(f'{dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  {name:<32}'
              f' {src}  {tf_op.split("/")[-1]}')


if __name__ == '__main__':
    main()
