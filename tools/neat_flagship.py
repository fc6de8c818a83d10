"""Reference-scale hybrid-NEAT flagship run.

Matches the reference's actual configuration (train_ga.py: pop_size 100
at :118, 50 generations at :307, 20x20 4-snake snake_length-5 env with
the GA reward dict at :266-273) over the frozen trained showcase DQN,
using the population-batched device rollout path (PaddedNetBatch).

Records per-generation best/mean fitness, wall seconds, and topology
stats to artifacts/neat_flagship_curve.jsonl — the per-generation wall
time staying flat as topologies mutate is the claim neat_hybrid.py
makes for the padded dense-sweep batch.

Usage: python tools/neat_flagship.py [generations] [pop_size]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    generations = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    pop_size = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    # K fitness episodes with common random numbers (round 5): paired
    # comparisons shrink selection noise ~sqrt(K) AND remove the
    # env-draw luck term entirely (all genomes play the same K draws)
    fit_eps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    from marlsnake_tpu.algo.dqn_trainer import DQNConfig, DQNTrainer
    from marlsnake_tpu.algo.neat import NeatConfig
    from marlsnake_tpu.algo.neat_hybrid import HybridNEATTrainer

    tr = DQNTrainer(DQNConfig(
        height=20, width=20, num_snakes=4, snake_length=3,
        save_dir=os.path.join(root, 'artifacts/dqn20_ckpt')))
    ts = tr.init_state()
    ts, _ = tr.load_checkpoint('showcase20', ts)

    neat_cfg = NeatConfig(num_inputs=128, num_outputs=3,
                          pop_size=pop_size)
    trainer = HybridNEATTrainer(
        ts.params, neat_cfg=neat_cfg, episode_steps=512,
        fitness_episodes=fit_eps,
        result_file=os.path.join(root,
                                 'artifacts/hybrid_neat_20x20_full.pkl'))

    curve_path = os.path.join(root, 'artifacts/neat_flagship_curve.jsonl')
    curve = open(curve_path, 'w')
    orig_eval = trainer.eval_genomes
    gen_idx = [0]

    def timed_eval(genomes, cfg):
        t0 = time.time()
        orig_eval(genomes, cfg)
        dt = time.time() - t0
        fits = [g.fitness for _, g in genomes]
        hidden = [sum(1 for nk in g.nodes
                      if nk not in cfg.output_keys)
                  for _, g in genomes]
        rec = {'gen': gen_idx[0], 'best': max(fits),
               'mean': sum(fits) / len(fits), 'wall_sec': round(dt, 2),
               'max_hidden_nodes': max(hidden),
               'mean_hidden_nodes': round(sum(hidden) / len(hidden), 2)}
        gen_idx[0] += 1
        curve.write(json.dumps(rec) + '\n')
        curve.flush()
        print(json.dumps(rec))

    trainer.eval_genomes = timed_eval
    t0 = time.time()
    best = trainer.run(num_generations=generations, verbose=True)
    total = time.time() - t0
    print(f'DONE: {generations} generations x pop {pop_size} in '
          f'{total / 60:.1f} min; best fitness '
          f'{best.fitness:.3f}; winner -> '
          f'artifacts/hybrid_neat_20x20_full.pkl, curve -> '
          f'{curve_path}')
    curve.close()


if __name__ == '__main__':
    main()
