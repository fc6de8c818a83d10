"""Capture and summarize a device trace of the LEARNER path.

Usage: python tools/trace_learner.py [dqn|ppo] [num_envs]

Times one jitted training episode/update (DQN: full 256-step episode scan
with per-step TD updates, train_dqn semantics; PPO: rollout + minibatch
epochs) and prints the top XLA ops by total device time, parsed from the
trace.json.gz (per CLAUDE.md: the only reliable attribution over the TPU
tunnel).
"""

import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def summarize(log_dir, label, wall_s):
    paths = glob.glob(f'{log_dir}/**/*.trace.json.gz', recursive=True)
    assert paths, f'no trace under {log_dir}'
    with gzip.open(paths[0], 'rt') as f:
        trace = json.load(f)
    events = [e for e in trace['traceEvents']
              if e.get('ph') == 'X' and 'dur' in e and e.get('args')]
    by_op = collections.Counter()
    for e in events:
        args = e['args']
        if 'long_name' in args or 'hlo_op' in args or 'hlo_module' in args:
            by_op[e['name']] += e['dur']
    total = sum(by_op.values())
    print(f'[{label}] wall {wall_s*1e3:.1f} ms; '
          f'attributed device time: {total/1e3:.2f} ms')
    for name, dur in by_op.most_common(30):
        print(f'  {dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  {name}')


def trace_dqn(num_envs):
    from marlsnake_tpu.algo.dqn_trainer import DQNConfig, DQNTrainer
    cfg = DQNConfig(num_envs=num_envs,
                    max_steps_per_episode=int(
                        os.environ.get('TRACE_EPISODE_STEPS', '256')))
    tr = DQNTrainer(cfg)
    ts = tr.init_state()
    # warm the buffer past min_buffer_size and compile
    for _ in range(4):
        ts, m = tr._train_episode(ts)
    jax.block_until_ready(ts)

    log_dir = '/tmp/snake_trace_dqn'
    os.system(f'rm -rf {log_dir}')
    t0 = time.perf_counter()
    jax.profiler.start_trace(log_dir)
    ts, m = tr._train_episode(ts)
    jax.block_until_ready(ts)
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0
    n_up = int(m.updates)
    print(f'updates this episode: {n_up} '
          f'({n_up / wall:.1f} updates/s incl. env)')
    summarize(log_dir, f'dqn episode e={num_envs}', wall)


def trace_ppo(num_envs):
    from marlsnake_tpu.algo.ppo_trainer import PPOConfig, PPOTrainer
    cfg = PPOConfig(num_envs=num_envs)
    tr = PPOTrainer(cfg)
    ts = tr.init_state()
    for _ in range(2):
        ts, m = tr._update(ts)
    jax.block_until_ready(ts)

    log_dir = '/tmp/snake_trace_ppo'
    os.system(f'rm -rf {log_dir}')
    t0 = time.perf_counter()
    jax.profiler.start_trace(log_dir)
    ts, m = tr._update(ts)
    jax.block_until_ready(ts)
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0
    summarize(log_dir, f'ppo iter e={num_envs}', wall)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else 'dqn'
    num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    if which == 'dqn':
        trace_dqn(num_envs)
    else:
        trace_ppo(num_envs)


if __name__ == '__main__':
    main()
