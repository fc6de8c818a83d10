"""Head-ES flagship: evolve the hybrid decision head PAST the fc3 seed.

The NEAT flagship's honest negative (rounds 4-5) is that its champion
never moves off the fc3 seed — NEAT's mutation operator is ~100x too
coarse for local search around a gradient-trained head. This run uses
the same frozen-DQN + relu-head evaluation contract with OpenAI-style
antithetic ES (HeadESTrainer) and reports:

  * per-generation theta fitness / perturbation stats / |theta - seed|
    to artifacts/es_flagship_curve.jsonl,
  * a HELD-OUT paired comparison (seed vs champion on fresh episode
    draws never used in training) — the "beats the seed" claim is made
    only on that, with the paired std alongside.

The champion saves as a standard fc3-topology hybrid checkpoint
(artifacts/hybrid_es_20x20.msgpack) loadable by render_winner/battle.

Usage: python tools/es_flagship.py [generations] [pop_size] [sigma] [lr]
       [val_episodes]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    generations = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    pop_size = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    sigma = float(sys.argv[3]) if len(sys.argv) > 3 else 0.02
    lr = float(sys.argv[4]) if len(sys.argv) > 4 else 0.01
    val_episodes = int(sys.argv[5]) if len(sys.argv) > 5 else 8
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    from marlsnake_tpu.algo.dqn_trainer import DQNConfig, DQNTrainer
    from marlsnake_tpu.algo.neat import NeatConfig
    from marlsnake_tpu.algo.neat_hybrid import HeadESTrainer

    tr = DQNTrainer(DQNConfig(
        height=20, width=20, num_snakes=4, snake_length=3,
        save_dir=os.path.join(root, 'artifacts/dqn20_ckpt')))
    ts = tr.init_state()
    ts, _ = tr.load_checkpoint('showcase20', ts)

    es = HeadESTrainer(
        ts.params, neat_cfg=NeatConfig(num_inputs=128, num_outputs=3),
        episode_steps=512, pop_size=pop_size, sigma=sigma, lr=lr,
        fitness_episodes=4, seed=0,
        result_file=os.path.join(root, 'artifacts/hybrid_es_20x20.msgpack'))

    curve_path = os.path.join(root, 'artifacts/es_flagship_curve.jsonl')
    curve = open(curve_path, 'w')
    curve.write(json.dumps({'config': {
        'generations': generations, 'pop_size': pop_size,
        'sigma': sigma, 'lr': lr, 'val_episodes': val_episodes,
        'fitness_episodes': 4, 'episode_steps': 512}}) + '\n')
    curve.flush()
    t_gen = [time.time()]

    def record(rec):
        now = time.time()
        rec = dict(rec, wall_sec=round(now - t_gen[0], 2))
        t_gen[0] = now
        curve.write(json.dumps(rec) + '\n')
        curve.flush()

    t0 = time.time()
    best_theta, best_val, hist = es.run(
        num_generations=generations, on_generation=record,
        val_episodes=val_episodes)
    total = time.time() - t0

    # held-out paired comparison: seed vs champion on fresh draws
    n = int(os.environ.get('ES_HOLDOUT_EPISODES', '256'))
    ma, mb, dmean, dstd = es.holdout_compare(
        es._seed_theta, best_theta, episodes=n)
    sem = dstd / n ** 0.5
    verdict = {
        'holdout_episodes': n,
        'seed_mean': round(ma, 4), 'champion_mean': round(mb, 4),
        'paired_diff_mean': round(dmean, 4),
        'paired_diff_sem': round(sem, 4),
        'champion_beats_seed': bool(dmean > 2 * sem),
        'champion_val_score': round(best_val, 4),
        'seed_val_score': round(hist[0]['seed_val'], 4) if hist else None,
        'total_min': round(total / 60, 2),
    }
    curve.write(json.dumps({'holdout': verdict}) + '\n')
    curve.close()
    print('HOLDOUT:', json.dumps(verdict))
    print(f'DONE: {generations} gens x pop {pop_size} '
          f'(sigma={sigma}, lr={lr}) in {total / 60:.1f} min; '
          f'champion -> artifacts/hybrid_es_20x20.msgpack, '
          f'curve -> {curve_path}')


if __name__ == '__main__':
    main()
