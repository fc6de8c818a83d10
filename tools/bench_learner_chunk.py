"""Measure end-to-end DQN episode wall time over the learner-pacing
knobs (VERDICT r1 item 3): the reference 1-update-per-env-step contract
(update_every=1) vs paced updates (update_every=K) vs the
sample-throughput-preserving chunked variant (update_every=K with
update_batch_size=K*batch).

Real-TPU timing rules per CLAUDE.md: each episode is ONE jitted program;
time multiple calls, never per-op timeit. Writes
artifacts/LEARNER_CHUNK.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

from marlsnake_tpu.algo.dqn_trainer import DQNConfig, DQNTrainer


def measure(num_envs, update_every=1, update_batch_size=None, episodes=3,
            fused=False, pad=0, reencode=None):
    import jax.numpy as jnp
    cfg = DQNConfig(height=20, width=20, num_snakes=4, snake_length=3,
                    num_envs=num_envs, max_steps_per_episode=256,
                    batch_size=512, min_buffer_size=512 * 3,
                    buffer_size=10_000, update_every=update_every,
                    update_batch_size=update_batch_size,
                    fused_act_update=fused,
                    obs_pad_channels=pad,
                    compute_dtype=jnp.bfloat16 if pad else jnp.float32,
                    reencode_acting_obs=reencode)
    tr = DQNTrainer(cfg)
    ts = tr.init_state()
    ts, m = tr._train_episode(ts)   # compile + buffer warm
    jax.block_until_ready(ts.params)
    t0 = time.perf_counter()
    for _ in range(episodes):
        ts, m = tr._train_episode(ts)
    jax.block_until_ready(ts.params)
    dt = (time.perf_counter() - t0) / episodes
    return dict(num_envs=num_envs, update_every=update_every,
                update_batch_size=update_batch_size or cfg.batch_size,
                episode_ms=round(dt * 1e3, 1),
                env_steps_per_s=round(num_envs
                                      * cfg.max_steps_per_episode / dt),
                updates=int(m.updates), fused=fused,
                obs_pad_channels=pad, reencode_acting_obs=reencode)


if __name__ == '__main__':
    rows = []
    for e in (32, 256):
        base = None
        for every, ubs, fused in ((1, None, False), (1, None, True),
                                  (4, None, False), (4, 2048, False)):
            r = measure(e, every, ubs, fused=fused)
            if base is None:
                base = r['episode_ms']
            r['speedup_vs_reference_contract'] = round(
                base / r['episode_ms'], 2)
            rows.append(r)
            print(json.dumps(r), flush=True)
        # acting-path re-encode (VERDICT r4 item 8): bf16 + pad16 acting
        # knobs, carried-obs pad copy vs grid re-encode at ingress
        # (bit-identical; tests/test_algo.py)
        for reenc in (False, True):
            r = measure(e, 1, None, pad=8, reencode=reenc)
            r['speedup_vs_reference_contract'] = round(
                base / r['episode_ms'], 2)
            rows.append(r)
            print(json.dumps(r), flush=True)
    os.makedirs('artifacts', exist_ok=True)
    with open('artifacts/LEARNER_CHUNK.json', 'w') as f:
        json.dump(rows, f, indent=1)
