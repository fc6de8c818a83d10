"""Capture and summarize a device trace of the headline rollout.

Usage: python tools/trace_bench.py [num_envs] [num_steps]
Prints the top-k XLA ops by total device time (parsed from the
trace.json.gz, per CLAUDE.md: the only reliable attribution over the
TPU tunnel).
"""

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench import build_rollout
from marlsnake_tpu.core.types import EnvConfig


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    num_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    vision = int(os.environ.get('TRACE_VISION', '0'))
    fs = int(os.environ.get('TRACE_FRAME_STACK', '1'))
    ns = int(os.environ.get('TRACE_NUM_SNAKES', '4'))
    layout = None
    if os.environ.get('TRACE_MAP'):
        from marlsnake_tpu.core.maps import load_layout
        layout = load_layout(os.environ['TRACE_MAP'])
    cfg = EnvConfig(height=20, width=20, num_snakes=ns, snake_length=3,
                    vision_range=vision or None, frame_stack=fs,
                    map_layout=layout,
                    spawn_mode=os.environ.get('TRACE_SPAWN_MODE', 'pool'))
    init, rollout = build_rollout(cfg, num_envs, num_steps)
    states = init(jax.random.key(0))
    states, r = rollout(states, jax.random.key(1))
    r.block_until_ready()

    log_dir = '/tmp/snake_trace'
    os.system(f'rm -rf {log_dir}')
    jax.profiler.start_trace(log_dir)
    states, r = rollout(states, jax.random.key(2))
    r.block_until_ready()
    jax.profiler.stop_trace()

    paths = glob.glob(f'{log_dir}/**/*.trace.json.gz', recursive=True)
    assert paths, f'no trace under {log_dir}'
    with gzip.open(paths[0], 'rt') as f:
        trace = json.load(f)

    # device-thread complete events only (TensorCore pid)
    events = [e for e in trace['traceEvents']
              if e.get('ph') == 'X' and 'dur' in e and e.get('args')]
    by_op = collections.Counter()
    meta = {}    # op name -> (dur of longest event, source, tf_op)
    for e in events:
        args = e['args']
        # XLA op events carry 'long_name'/'run_id'; host events don't
        if 'long_name' in args or 'hlo_op' in args or 'hlo_module' in args:
            by_op[e['name']] += e['dur']
            # durations are summed across all events of a name, so keep
            # the attribution of the LONGEST event (not last-write-wins)
            if e['dur'] >= meta.get(e['name'], (-1,))[0]:
                meta[e['name']] = (e['dur'], args.get('source', ''),
                                   args.get('tf_op', ''))
    total = sum(by_op.values())
    print(f'total attributed device time: {total/1e3:.2f} ms '
          f'({num_envs}x{num_steps} env-steps)')
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, dur in by_op.most_common(int(os.environ.get("TRACE_TOP", 30))):
        _, src, tf_op = meta[name]
        src = src.replace(repo_root + '/', '')
        print(f'{dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  {name:<28}'
              f' {src}  {tf_op.split("/")[-1]}')


if __name__ == '__main__':
    main()
