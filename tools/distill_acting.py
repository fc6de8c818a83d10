"""Distill the flagship DQN into a small acting net (round-4 item 7).

DAgger-style: roll the env under the STUDENT's greedy policy (the
distribution the acting row actually visits), label every observation
with the frozen teacher's greedy action, and train the student with
cross-entropy + a soft logit-matching term. Entirely on device: each
outer iteration is one jitted (rollout -> minibatch SGD) program.

Reports greedy-argmax agreement on held-out student-policy states and
writes the student params + metadata to
artifacts/distilled_acting.msgpack. The acting-throughput comparison is
a separate exp_acting/bench_table row (the student must NOT be timed in
the same process as training).

Usage: python tools/distill_acting.py [iters] [envs]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.envs.vector import build_vector_fns
from marlsnake_tpu.models.dqn import DQN, DistilledDQN


def main():
    outer_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    conv = tuple(int(c) for c in
                 (sys.argv[3].split(',') if len(sys.argv) > 3
                  else (16, 32)))
    fc = tuple(int(c) for c in
               (sys.argv[4].split(',') if len(sys.argv) > 4 else (64,)))
    rollout_steps = 32
    sgd_steps = 64
    batch = 4096
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    from marlsnake_tpu.algo.dqn_trainer import DQNConfig, DQNTrainer
    cfg = EnvConfig(height=20, width=20, num_snakes=4, snake_length=3)
    tr = DQNTrainer(DQNConfig(
        height=20, width=20, num_snakes=4, snake_length=3,
        save_dir=os.path.join(root, 'artifacts/dqn20_ckpt')))
    ts = tr.init_state()
    ts, _ = tr.load_checkpoint('showcase20', ts)
    teacher = DQN(num_actions=3, assume_binary_obs=True)
    t_params = ts.params

    student = DistilledDQN(num_actions=3, conv_channels=conv,
                           fc_features=fc)
    reset_fn, step_fn = build_vector_fns(cfg, autoreset=True)
    e, n = num_envs, cfg.num_snakes

    def flat(obs):
        return obs.reshape((e * n,) + obs.shape[2:])

    opt = optax.adam(3e-4)

    @jax.jit
    def init(key):
        states, obs = reset_fn(jax.random.split(key, e))
        s_params = student.init(jax.random.key(11), flat(obs)[:1])
        return states, obs, s_params, opt.init(s_params)

    @jax.jit
    def outer(states, obs, s_params, opt_state, key):
        # 1) student-policy rollout, stacking the visited obs
        def roll(carry, _):
            states, obs = carry
            acts = student.apply(s_params, flat(obs)).argmax(-1)
            states, out = step_fn(
                states, acts.astype(jnp.int32).reshape(e, n))
            return (states, out.obs), obs

        (states, obs), traj = jax.lax.scan(roll, (states, obs),
                                           length=rollout_steps)
        data = traj.reshape((-1,) + traj.shape[3:])  # (T*E*N, H, W, C)

        # 2) teacher labels + soft targets for the whole buffer
        t_q = teacher.apply(t_params, data)
        t_act = t_q.argmax(-1)

        # 3) minibatch SGD on CE + soft-logit MSE
        def sgd(carry, k):
            s_params, opt_state = carry
            idx = jax.random.randint(k, (batch,), 0, data.shape[0])
            x, y, q = data[idx], t_act[idx], t_q[idx]

            def loss_fn(p):
                logits = student.apply(p, x)
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()
                soft = ((logits - q) ** 2).mean()
                return ce + 0.1 * soft

            loss, g = jax.value_and_grad(loss_fn)(s_params)
            upd, opt_state = opt.update(g, opt_state)
            return (optax.apply_updates(s_params, upd), opt_state), loss

        (s_params, opt_state), losses = jax.lax.scan(
            sgd, (s_params, opt_state),
            jax.random.split(key, sgd_steps))

        # 4) agreement on this (pre-update-policy) visitation batch
        s_act = student.apply(s_params, data).argmax(-1)
        agree = (s_act == t_act).mean()
        return states, obs, s_params, opt_state, losses.mean(), agree

    states, obs, s_params, opt_state = init(jax.random.key(0))
    t0 = time.time()
    agree = 0.0
    for it in range(outer_iters):
        states, obs, s_params, opt_state, loss, agree = outer(
            states, obs, s_params, opt_state, jax.random.key(100 + it))
        if it % 5 == 0 or it == outer_iters - 1:
            print(f'iter {it:3d} | loss {float(loss):.4f} | '
                  f'agreement {float(agree) * 100:.2f}% | '
                  f'{time.time() - t0:.0f}s')

    out_path = os.path.join(root, 'artifacts/distilled_acting.msgpack')
    with open(out_path, 'wb') as f:
        f.write(serialization.to_bytes(jax.device_get(s_params)))
    meta = {'agreement_pct': round(float(agree) * 100, 2),
            'conv_channels': list(student.conv_channels),
            'fc_features': list(student.fc_features),
            'teacher': 'artifacts/dqn20_ckpt showcase20',
            'outer_iters': outer_iters, 'num_envs': num_envs}
    with open(out_path + '.meta.json', 'w') as f:
        json.dump(meta, f)
    print('wrote', out_path, json.dumps(meta))


if __name__ == '__main__':
    main()
