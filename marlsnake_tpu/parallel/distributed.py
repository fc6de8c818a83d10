"""Multi-host bootstrap and scaling measurement.

The reference's only cross-process machinery is fork workers + pipes
(wrappers.py:126-194) with fail-stop error propagation and no recovery
(SURVEY.md §5). The TPU-native model: ``jax.distributed`` per host, one
global mesh whose ``data`` axis spans all chips, ICI collectives inside a
slice and DCN between slices — all inserted by XLA from the sharding
annotations. Failure model is the standard JAX fail-stop + checkpoint
restart (utils/checkpoint restores full state incl. env states and PRNG
keys, so restart resumes mid-episode).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for a multi-host run. No-ops on a
    single host with no coordinator configured."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def launch_local_cluster(num_processes: int = 2,
                         devices_per_process: int = 4,
                         timeout: float = 300.0) -> list:
    """Spawn a REAL multi-process jax.distributed cluster on localhost
    (CPU backend, gloo collectives) and run one sharded DQN episode per
    :mod:`marlsnake_tpu.parallel.mp_worker` in every process.

    Returns the per-process result dicts; raises if any process fails or
    the processes disagree on the final (replicated) learner params —
    i.e. this is the multi-process bootstrap + collective-correctness
    check that single-process ``shard_map`` on a virtual mesh cannot
    provide. The reference's only cross-process analog is fork workers
    with pipes (wrappers.py:126-194).
    """
    import json
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free localhost port for the coordinator
        s.bind(('127.0.0.1', 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    flags = env.get('XLA_FLAGS', '')
    flags = ' '.join(f for f in flags.split()
                     if not f.startswith(
                         '--xla_force_host_platform_device_count'))
    env['XLA_FLAGS'] = (
        f'{flags} '
        f'--xla_force_host_platform_device_count={devices_per_process}'
    ).strip()

    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    procs = [subprocess.Popen(
        [sys.executable, '-m', 'marlsnake_tpu.parallel.mp_worker',
         str(pid), str(num_processes), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        cwd=repo_root, text=True) for pid in range(num_processes)]
    results = []
    for pid, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError(f'worker {pid} timed out after {timeout}s')
        if p.returncode != 0:
            raise RuntimeError(
                f'worker {pid} failed rc={p.returncode}:\n{err[-2000:]}')
        payload = [ln for ln in out.splitlines() if ln.startswith('{')]
        results.append(json.loads(payload[-1]))

    digests = {r['param_digest'] for r in results}
    if len(digests) != 1:
        raise RuntimeError(
            f'replicated params diverged across processes: {results}')
    return results


_COLLECTIVE_RE = None


def hlo_collective_counts(compiled_text: str) -> dict:
    """Count collective instructions in compiled HLO text.

    The reviewable dryrun signal for a data-parallel program: the env
    rollout should insert NO collectives and the learner exactly its
    pmean all-reduces — anything else means XLA resharded behind our
    back. (Wall-clock 'scaling efficiency' on a single-process virtual
    mesh is emulation noise and is deliberately NOT reported there; the
    real-ICI harness is :func:`scaling_efficiency`, for hardware.)
    """
    import re
    global _COLLECTIVE_RE
    if _COLLECTIVE_RE is None:
        ops = ('all-reduce', 'all-gather', 'reduce-scatter',
               'collective-permute', 'all-to-all', 'collective-broadcast')
        # opcode position: "%name = shape OPCODE(" (also -start variants)
        _COLLECTIVE_RE = re.compile(
            r'=\s*\S+\s+(' + '|'.join(ops) + r')(?:-start)?\(')
    counts: dict = {}
    for m in _COLLECTIVE_RE.finditer(compiled_text):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def per_device_step_time(cfg, envs_per_device: int = 64,
                         num_steps: int = 32) -> dict:
    """Per-device env-step wall time at EQUAL per-device env count:
    unsharded single-device vs sharded over the full mesh.

    Returns {'devices', 'unsharded_ms_per_step', 'sharded_ms_per_step',
    'emulated'}. On real chips sharded ~= unsharded is the >80% gate;
    on a single-process virtual CPU mesh ('emulated': True) the sharded
    number includes host-core emulation overhead, so compare shapes and
    trends, never read it as ICI efficiency.
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import numpy as np
    from marlsnake_tpu.envs.vector import build_vector_fns

    devices = jax.devices()
    n = len(devices)
    reset_fn, step_fn = build_vector_fns(cfg, autoreset=True)

    def bench(num_envs, sharding=None):
        keys = jax.random.split(jax.random.key(0), num_envs)
        states, _ = jax.jit(reset_fn)(keys)
        if sharding is not None:
            states = jax.tree.map(
                lambda x: jax.device_put(x, sharding), states)
        acts = jnp.zeros((num_envs, cfg.num_snakes), jnp.int32)
        step = jax.jit(lambda s, a: step_fn(s, a)[0])
        s = step(states, acts)
        jax.block_until_ready(s.grid)
        t0 = time.perf_counter()
        s = states
        for _ in range(num_steps):
            s = step(s, acts)
        jax.block_until_ready(s.grid)
        return (time.perf_counter() - t0) / num_steps * 1e3

    single_ms = bench(envs_per_device)
    mesh = Mesh(np.array(devices), ('data',))
    full_ms = bench(envs_per_device * n, NamedSharding(mesh, P('data')))
    return {'devices': n,
            'unsharded_ms_per_step': single_ms,
            'sharded_ms_per_step': full_ms,
            'emulated': devices[0].platform == 'cpu'}


def scaling_efficiency(cfg, envs_per_device: int = 512,
                       num_steps: int = 64) -> dict:
    """Measure env-step throughput at 1 device vs the full mesh.

    Returns {'single': steps/s, 'full': steps/s, 'devices': n,
    'efficiency': full / (n * single)} — the >80% scaling gate from
    BASELINE.json. Meaningful ONLY on real multi-chip hardware: on a
    single-process virtual CPU mesh every "device" shares the host
    cores, so the quotient reads as a catastrophic failure regardless
    of program quality — dryruns report :func:`hlo_collective_counts`
    and :func:`per_device_step_time` instead.
    """
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    import numpy as np
    from marlsnake_tpu.envs.vector import build_vector_fns

    devices = jax.devices()
    n = len(devices)
    reset_fn, step_fn = build_vector_fns(cfg, autoreset=True)

    def bench(num_envs, sharding=None):
        keys = jax.random.split(jax.random.key(0), num_envs)
        states, _ = jax.jit(reset_fn)(keys)
        if sharding is not None:
            states = jax.tree.map(
                lambda x: jax.device_put(x, sharding), states)
        acts = jnp.zeros((num_envs, cfg.num_snakes), jnp.int32)
        step = jax.jit(lambda s, a: step_fn(s, a)[0])
        out = step(states, acts)
        jax.block_until_ready(out.grid)
        t0 = time.perf_counter()
        iters = 0
        s = states
        for _ in range(num_steps):
            s = step(s, acts)
            iters += 1
        jax.block_until_ready(s.grid)
        dt = time.perf_counter() - t0
        return num_envs * iters / dt

    single = bench(envs_per_device)
    mesh = Mesh(np.array(devices), ('data',))
    full = bench(envs_per_device * n, NamedSharding(mesh, P('data')))
    return {'single': single, 'full': full, 'devices': n,
            'efficiency': full / (n * single) if n else 1.0}
