"""Multi-process worker: one process of a local jax.distributed cluster.

Launched by :func:`marlsnake_tpu.parallel.distributed.launch_local_cluster`
(and exercised by ``tests/test_distributed.py`` / ``dryrun_multichip``).
Each process owns ``--xla_force_host_platform_device_count`` CPU devices;
the global mesh spans all processes, gradients ``pmean`` over gloo, and
the worker reports a digest of its (replicated) params so the launcher can
assert every process ended the episode with identical learner state —
the multi-PROCESS proof the single-process shard_map dryrun can't give.
"""

import json
import sys


def main() -> None:
    import jax
    # the ambient sitecustomize pins jax_platforms; env vars are ignored
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_cpu_collectives_implementation', 'gloo')

    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    from marlsnake_tpu.parallel import distributed
    distributed.initialize(coordinator_address=f'127.0.0.1:{port}',
                           num_processes=nproc, process_id=pid)

    import jax.numpy as jnp
    from marlsnake_tpu.algo.dqn_trainer import DQNConfig
    from marlsnake_tpu.parallel.dqn_dp import DistributedDQN
    from marlsnake_tpu.parallel.mesh import make_mesh

    ndev = len(jax.devices())
    mesh = make_mesh(ndev)
    # min_buffer_size low enough that the pmean'd TD-update branch (the
    # cross-process collective under test) actually fires within the
    # short episode: 2 envs x 2 snakes per device push 4 transitions/step
    cfg = DQNConfig(height=8, width=8, num_snakes=2, snake_length=2,
                    num_envs=2 * ndev, max_steps_per_episode=8,
                    batch_size=4, min_buffer_size=4, buffer_size=64)
    ddqn = DistributedDQN(cfg, mesh)
    ts = ddqn.init_state()
    ts, metrics = ddqn.train_episode(ts)
    jax.block_until_ready(ts.params)

    # params/opt_state are replicated (P()): fully addressable everywhere
    digest = float(sum(jnp.sum(jnp.abs(leaf))
                       for leaf in jax.tree.leaves(ts.params)))
    print(json.dumps({
        'process_id': pid,
        'num_processes': jax.process_count(),
        'global_devices': ndev,
        'local_devices': len(jax.local_devices()),
        'param_digest': digest,
        'mean_reward': float(metrics.mean_reward),
        'updates': int(metrics.updates),
    }), flush=True)


if __name__ == '__main__':
    main()
