"""Training showcase: short DQN and PPO runs that produce real learning
curves (metrics JSONL + checkpoints) — a smoke-scale version of the
reference's 50k-episode training (train_dqn.py) and the lost PPO run whose
TensorBoard curves ship with the reference repo."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..'))

OUT_DIR = os.environ.get('SHOWCASE_DIR', 'artifacts')


def run_dqn(episodes=400):
    from marlsnake_tpu.algo.dqn_trainer import DQNConfig, DQNTrainer
    cfg = DQNConfig(height=10, width=10, num_snakes=2, snake_length=3,
                    num_envs=32, max_steps_per_episode=128,
                    batch_size=256, min_buffer_size=1024,
                    buffer_size=50_000, epsilon_decay=0.99,
                    target_update_freq=20, save_freq=0,
                    save_best_only=False,
                    save_dir=os.path.join(OUT_DIR, 'dqn_ckpt'))
    tr = DQNTrainer(cfg)
    ts = tr.init_state()
    rows = []
    t0 = time.time()
    for ep in range(1, episodes + 1):
        ts, m = tr._train_episode(ts)
        if ep % 10 == 0:
            row = dict(episode=ep, mean_reward=float(m.mean_reward),
                       loss=float(m.mean_loss),
                       epsilon=float(ts.epsilon),
                       episode_length=float(m.episode_length),
                       elapsed=round(time.time() - t0, 1))
            rows.append(row)
            print('dqn', row, flush=True)
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, 'dqn_learning_curve.jsonl'), 'w') as f:
        for r in rows:
            f.write(json.dumps(r) + '\n')
    tr.save_checkpoint(ts, 'showcase')
    first = sum(r['mean_reward'] for r in rows[:5]) / 5
    last = sum(r['mean_reward'] for r in rows[-5:]) / 5
    print(f'DQN: mean reward {first:.3f} -> {last:.3f} over '
          f'{episodes} episodes', flush=True)
    return first, last


def run_ppo(updates=150):
    from marlsnake_tpu.algo.ppo_trainer import PPOConfig, PPOTrainer
    cfg = PPOConfig(height=10, width=10, num_snakes=2, snake_length=3,
                    num_envs=128, rollout_steps=64, num_updates=updates)
    tr = PPOTrainer(cfg)
    ts = tr.init_state()
    rows = []
    t0 = time.time()
    for u in range(1, updates + 1):
        ts, m = tr._update(ts)
        if u % 5 == 0:
            row = dict(update=u,
                       mean_episode_return=float(m.mean_episode_return),
                       reward_per_step=float(
                           m.mean_reward_per_step_per_agent),
                       entropy=float(m.entropy),
                       approx_kl=float(m.approx_kl),
                       episodes=int(m.episodes_collected),
                       elapsed=round(time.time() - t0, 1))
            rows.append(row)
            print('ppo', row, flush=True)
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR, 'ppo_learning_curve.jsonl'), 'w') as f:
        for r in rows:
            f.write(json.dumps(r) + '\n')
    first = sum(r['mean_episode_return'] for r in rows[:5]) / 5
    last = sum(r['mean_episode_return'] for r in rows[-5:]) / 5
    print(f'PPO: mean episode return {first:.4f} -> {last:.4f} over '
          f'{updates} updates', flush=True)
    return first, last


def run_ppo20(updates=400):
    """PPO flagship at the reference's canonical 20x20 4-snake config
    (the shipped reference TB curves plateau at ~0.006 reward/step/agent;
    reference PPO source itself is lost — SURVEY.md C35)."""
    from marlsnake_tpu.algo.ppo_trainer import PPOConfig, PPOTrainer
    cfg = PPOConfig(height=20, width=20, num_snakes=4, snake_length=5,
                    num_envs=256, rollout_steps=128, num_updates=updates,
                    ent_coef=0.01, save_dir=os.path.join(
                        OUT_DIR, 'ppo20_ckpt'))
    tr = PPOTrainer(cfg)
    ts = tr.init_state()
    rows = []
    t0 = time.time()
    for u in range(1, updates + 1):
        ts, m = tr._update(ts)
        if u % 5 == 0:
            row = dict(update=u,
                       mean_episode_return=float(m.mean_episode_return),
                       reward_per_step=float(
                           m.mean_reward_per_step_per_agent),
                       entropy=float(m.entropy),
                       approx_kl=float(m.approx_kl),
                       episodes=int(m.episodes_collected),
                       elapsed=round(time.time() - t0, 1))
            rows.append(row)
            print('ppo20', row, flush=True)
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(os.path.join(OUT_DIR,
                           'ppo20_learning_curve.jsonl'), 'w') as f:
        for r in rows:
            f.write(json.dumps(r) + '\n')
    tr.save_checkpoint(ts, 'showcase')
    first = sum(r['reward_per_step'] for r in rows[:5]) / 5
    last = sum(r['reward_per_step'] for r in rows[-5:]) / 5
    print(f'PPO20: reward/step/agent {first:.4f} -> {last:.4f} over '
          f'{updates} updates (reference plateau ~0.006)', flush=True)
    return first, last


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'both'
    if which in ('dqn', 'both'):
        run_dqn()
    if which in ('ppo', 'both'):
        run_ppo()
    if which == 'ppo20':
        run_ppo20(int(sys.argv[2]) if len(sys.argv) > 2 else 400)
