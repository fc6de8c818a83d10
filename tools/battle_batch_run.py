"""Record the 4-way battle table over 100+ device-batched episodes.

Same lineup as artifacts/battle_results_20x20.txt (reference default,
train_dqn.py:986-1003): masked DQN (artifacts/dqn20_ckpt showcase20) vs
the ACTUAL reference PPO checkpoint (torch interop) vs Hybrid NEAT
(artifacts/hybrid_neat_20x20.pkl) vs Greedy — but every seat batched on
device (algo/battle_batch.py), so the table gets means with 95% CIs
instead of 10 host-stepped episodes.

Usage: python tools/battle_batch_run.py [episodes]
Writes artifacts/battle_results_20x20_batched.txt.
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from marlsnake_tpu.core.types import EnvConfig


def main():
    episodes = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    from marlsnake_tpu.algo.battle_batch import (
        BatchedGreedy, BatchedNEAT, BatchedPPO, build_battle_batch,
        summarize)
    from marlsnake_tpu.algo.dqn_trainer import DQNConfig, DQNTrainer

    cfg = EnvConfig(height=20, width=20, num_snakes=4, snake_length=3)
    tr = DQNTrainer(DQNConfig(
        height=20, width=20, num_snakes=4, snake_length=3,
        save_dir=os.path.join(root, 'artifacts/dqn20_ckpt')))
    ts = tr.init_state()
    ts, _ = tr.load_checkpoint('showcase20', ts)

    import torch
    from marlsnake_tpu.models.torch_interop import ppo_params_from_torch
    ppo_path = ('/root/reference/marlenv/runs/ppo/20251228-155100/'
                'best_model.pt')
    ckpt = torch.load(ppo_path, map_location='cpu', weights_only=False)
    ppo = BatchedPPO(ppo_params_from_torch(
        ckpt.get('model_state_dict', ckpt)))

    with open(os.path.join(root, 'artifacts/hybrid_neat_20x20.pkl'),
              'rb') as f:
        data = pickle.load(f)
    neat = BatchedNEAT(data['dqn_params'], data['neat_genome'],
                       data['neat_config'])

    names = ['DQN (Main)', 'PPO', 'Hybrid NEAT', 'Greedy Bot']
    run = build_battle_batch(tr.net, cfg, [ppo, neat, BatchedGreedy()],
                             num_envs=episodes, max_steps=512)
    t0 = time.time()
    rew, life = run(ts.params, jax.random.key(0))
    jax.block_until_ready(rew)
    wall = time.time() - t0
    table = summarize(rew, life, names)
    header = (f'{episodes} simultaneous device-batched episodes '
              f'(20x20, 4 snakes, length 3, max 512 steps, seed 0) in '
              f'{wall:.1f}s wall (incl. compile).\n'
              f'Lineup + checkpoints identical to '
              f'battle_results_20x20.txt; the host arena took ~10 '
              f'episodes in that budget.\n\n')
    out = header + table + '\n'
    print(out)
    path = os.path.join(root,
                        'artifacts/battle_results_20x20_batched.txt')
    with open(path, 'w') as f:
        f.write(out)
    print(f'wrote {path}')


if __name__ == '__main__':
    main()
