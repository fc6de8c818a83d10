"""Trainer / replay / evaluator / NEAT tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlsnake_tpu.algo import replay
from marlsnake_tpu.core import types as T


def test_replay_push_sample_wraparound():
    buf = replay.create(8, (2, 2, 1))
    obs = jnp.arange(6 * 4, dtype=jnp.uint8).reshape(6, 2, 2, 1)
    buf = replay.push(buf, obs, jnp.arange(6), jnp.arange(6.0),
                      obs, jnp.zeros(6, bool))
    assert int(buf.size) == 6 and int(buf.ptr) == 6
    buf = replay.push(buf, obs, jnp.arange(6), jnp.arange(6.0),
                      obs, jnp.zeros(6, bool))
    assert int(buf.size) == 8 and int(buf.ptr) == 4
    s = replay.sample(buf, jax.random.key(0), 16)
    assert s[0].shape == (16, 2, 2, 1)


def test_replay_masked_push():
    buf = replay.create(8, (1,))
    obs = jnp.arange(4, dtype=jnp.uint8).reshape(4, 1)
    mask = jnp.asarray([True, False, True, False])
    buf = replay.push(buf, obs, jnp.arange(4), jnp.arange(4.0),
                      obs, jnp.zeros(4, bool), mask=mask)
    assert int(buf.size) == 2
    np.testing.assert_array_equal(np.asarray(buf.obs[:2, 0]), [0, 2])
    np.testing.assert_array_equal(np.asarray(buf.reward[:2]), [0.0, 2.0])


def test_dqn_trainer_learns_something():
    from marlsnake_tpu.algo.dqn_trainer import DQNConfig, DQNTrainer
    cfg = DQNConfig(height=8, width=8, num_snakes=2, snake_length=2,
                    num_envs=2, max_steps_per_episode=16, batch_size=32,
                    min_buffer_size=32, buffer_size=256,
                    save_freq=0, save_best_only=False)
    tr = DQNTrainer(cfg)
    ts = tr.init_state()
    p0 = jax.tree.leaves(ts.params)[0]
    losses = []
    for _ in range(6):
        ts, m = tr._train_episode(ts)
        losses.append(float(m.mean_loss))
    assert int(ts.episode) == 6
    assert float(ts.epsilon) < cfg.epsilon_start
    # params must have changed once updates started
    p1 = jax.tree.leaves(ts.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_ppo_trainer_update_runs():
    from marlsnake_tpu.algo.ppo_trainer import PPOConfig, PPOTrainer
    cfg = PPOConfig(height=8, width=8, num_snakes=2, snake_length=2,
                    num_envs=4, rollout_steps=8, num_minibatches=2,
                    update_epochs=2)
    tr = PPOTrainer(cfg)
    ts = tr.init_state()
    ts, m = tr._update(ts)
    assert np.isfinite(float(m.loss_actor))
    assert np.isfinite(float(m.loss_value))
    # fresh policy over 3 actions: entropy near ln 3 (reference PPO logged
    # ~1.09 at the start, BASELINE.md)
    assert abs(float(m.entropy) - np.log(3)) < 0.1


def test_ppo_checkpoint_roundtrip(tmp_path):
    from marlsnake_tpu.algo.ppo_trainer import PPOConfig, PPOTrainer
    cfg = PPOConfig(height=8, width=8, num_snakes=2, snake_length=2,
                    num_envs=4, rollout_steps=8, num_minibatches=2,
                    update_epochs=2, save_dir=str(tmp_path))
    tr = PPOTrainer(cfg)
    ts = tr.init_state()
    ts, _ = tr._update(ts)
    tr.save_checkpoint(ts, 'roundtrip')
    restored = tr.load_checkpoint('roundtrip', tr.init_state())
    assert int(restored.update) == int(ts.update) == 1
    for a, b in zip(jax.tree.leaves(ts.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_evaluator_avoids_certain_death():
    """Straight into a wall with a free left turn: the mask must veto
    straight."""
    from marlsnake_tpu.algo.evaluator import masked_action_single
    h = w = 7
    obs = np.zeros((h, w, 8), np.uint8)
    obs[0, :, T.CH_WALL] = 1
    obs[-1, :, T.CH_WALL] = 1
    obs[:, 0, T.CH_WALL] = 1
    obs[:, -1, T.CH_WALL] = 1
    # snake heading UP with head just under the top wall
    obs[1, 3, T.CH_MY_HEAD] = 1
    obs[2, 3, T.CH_MY_BODY] = 1
    obs[3, 3, T.CH_MY_TAIL] = 1
    q = jnp.asarray([10.0, 0.0, -1.0])  # Q prefers straight (death)
    act, new_dir, nxt, exists = masked_action_single(
        jnp.asarray(obs), q, jnp.asarray([-1, 0]),
        jnp.zeros((h, w), bool))
    assert bool(exists)
    assert int(act) in (1, 2)  # left or right, never straight


def test_evaluator_claim_prevents_collision():
    from marlsnake_tpu.algo.evaluator import masked_action_single
    h = w = 7
    obs = np.zeros((h, w, 8), np.uint8)
    obs[3, 3, T.CH_MY_HEAD] = 1
    obs[4, 3, T.CH_MY_BODY] = 1
    obs[5, 3, T.CH_MY_TAIL] = 1
    q = jnp.asarray([5.0, 1.0, 0.0])
    claimed = jnp.zeros((h, w), bool).at[2, 3].set(True)  # straight claimed
    act, *_ = masked_action_single(jnp.asarray(obs), q,
                                   jnp.asarray([-1, 0]), claimed)
    assert int(act) in (1, 2)


def test_neat_seed_genome_matches_linear_head():
    """fc3_to_genome must reproduce the DQN head exactly."""
    from marlsnake_tpu.algo.neat import FeedForwardNetwork, NeatConfig
    from marlsnake_tpu.algo.neat_hybrid import fc3_to_genome
    rng = np.random.default_rng(0)
    kernel = rng.normal(size=(16, 3)).astype(np.float32)
    bias = rng.normal(size=(3,)).astype(np.float32)
    params = {'params': {'fc3': {'kernel': kernel, 'bias': bias}}}
    cfg = NeatConfig(num_inputs=16, num_outputs=3)
    genome = fc3_to_genome(params, cfg)
    net = FeedForwardNetwork.create(genome, cfg)
    x = rng.normal(size=(16,)).astype(np.float32)
    got = np.asarray(net.activate(x))
    want = np.maximum(x @ kernel + bias, 0.0)  # relu output nodes
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_neat_evolution_improves_xor():
    from marlsnake_tpu.algo.neat import (FeedForwardNetwork, NeatConfig,
                                         Population)
    cfg = NeatConfig(num_inputs=2, num_outputs=1, pop_size=60,
                     activation_default='sigmoid',
                     activation_options=('sigmoid',),
                     compatibility_threshold=3.0)
    cases = [((0, 0), 0), ((0, 1), 1), ((1, 0), 1), ((1, 1), 0)]

    def eval_fn(genomes, c):
        for _, g in genomes:
            net = FeedForwardNetwork.create(g, c)
            err = sum((net.activate(x)[0] - y) ** 2 for x, y in cases)
            g.fitness = 4.0 - err

    pop = Population(cfg, seed=1)
    best = pop.run(eval_fn, 12, verbose=False)
    first_gen = Population(cfg, seed=1)
    eval_fn([(g.key, g) for g in first_gen.genomes], cfg)
    best0 = max(g.fitness for g in first_gen.genomes)
    assert best.fitness >= best0  # evolution never regresses the champion


def test_evaluate_batch_runs():
    from marlsnake_tpu.algo.evaluator import evaluate_batch
    from marlsnake_tpu.models.dqn import DQN
    from marlsnake_tpu.core.types import EnvConfig
    import jax.numpy as jnp
    cfg = EnvConfig(height=8, width=8, num_snakes=2, snake_length=2)
    net = DQN(num_actions=3)
    params = net.init(jax.random.key(0),
                      jnp.zeros((1, 8, 8, 8), jnp.uint8))
    r, t = evaluate_batch(net, params, cfg, num_envs=4, max_steps=16)
    assert np.isfinite(r) and 0 < t <= 16


def test_neat_padded_batch_matches_python_net():
    """PaddedNetBatch (the all-on-device population evaluator) must
    reproduce FeedForwardNetwork.activate for EVERY topology: the
    full_direct seed head AND structurally-mutated genomes (add-node /
    add-connection / activation flips) — the round-2 python fallback
    these sweeps replaced."""
    import random as _r
    from marlsnake_tpu.algo.neat import FeedForwardNetwork, NeatConfig
    from marlsnake_tpu.algo.neat_hybrid import (PaddedNetBatch,
                                                fc3_to_genome)
    rng = np.random.default_rng(0)
    cfg = NeatConfig(num_inputs=16, num_outputs=3)
    params = {'params': {'fc3': {
        'kernel': rng.normal(size=(16, 3)).astype(np.float32),
        'bias': rng.normal(size=(3,)).astype(np.float32)}}}
    seed_genome = fc3_to_genome(params, cfg)

    # population: the pristine seed + heavily-mutated descendants
    genomes = [seed_genome]
    next_key = [cfg.num_outputs + 1000]
    pyr = _r.Random(3)
    for gi in range(1, 8):
        g = seed_genome.copy(gi)
        for _ in range(1 + gi):  # escalating structural mutation
            g._mutate_add_node(cfg, pyr, next_key)
            g._mutate_add_conn(cfg, pyr)
        for nk in list(g.nodes):
            if pyr.random() < 0.4:
                g.nodes[nk].activation = pyr.choice(
                    ('relu', 'sigmoid', 'tanh'))
        genomes.append(g)
    assert any(len(g.nodes) > cfg.num_outputs for g in genomes), \
        'mutations produced no hidden nodes — test is vacuous'

    batch = PaddedNetBatch(genomes, cfg)
    nets = [FeedForwardNetwork.create(g, cfg) for g in genomes]
    n_agents = 4
    emb = rng.normal(size=(len(genomes), n_agents, 16)).astype(np.float32)
    got = batch.logits(emb)
    acts = np.asarray(batch.acts(emb))
    for p, net in enumerate(nets):
        for a in range(n_agents):
            want = np.asarray(net.activate(emb[p, a]), np.float64)
            np.testing.assert_allclose(got[p, a], want, rtol=1e-4,
                                       atol=1e-4,
                                       err_msg=f'genome {p} agent {a}')
            assert acts[p, a] == int(np.argmax(want)), \
                f'action mismatch genome {p} agent {a}'


def test_replay_sample_without_replacement_distinct():
    buf = replay.create(64, (1,))
    obs = jnp.arange(40, dtype=jnp.uint8).reshape(40, 1)
    buf = replay.push(buf, obs, jnp.arange(40), jnp.arange(40.0),
                      obs, jnp.zeros(40, bool))
    s = replay.sample(buf, jax.random.key(0), 32, replace=False)
    rewards = np.asarray(s[2])
    assert len(np.unique(rewards)) == 32  # distinct transitions
    assert rewards.max() < 40  # never samples unfilled slots


def _greedy_loop_form(obs, current_direction):
    """The reference GreedyEnemy heuristic in its original loop form
    (train_dqn.py:774-856) — the oracle for the vectorized GreedyAgent.
    Returns (action, new_direction); consumes `random` exactly like the
    agent (one choice() when any legal move exists)."""
    import random
    from marlsnake_tpu.algo.opponents import DEADLY_CHANNELS
    obs = np.asarray(obs)
    head = np.argwhere(obs[:, :, T.CH_MY_HEAD] == 1)
    if len(head) == 0:
        return 0, current_direction
    hy, hx = head[0]
    fruits = np.argwhere(obs[:, :, T.CH_FRUIT] == 1)
    target = None
    if len(fruits) > 0:
        dists = [abs(hy - fy) + abs(hx - fx) for fy, fx in fruits]
        target = fruits[int(np.argmin(dists))]
    if current_direction is None:
        cur = (-1, 0)
        for dy, dx in [(-1, 0), (1, 0), (0, -1), (0, 1)]:
            by, bx = hy + dy, hx + dx
            if (0 <= by < obs.shape[0] and 0 <= bx < obs.shape[1]
                    and (obs[by, bx, T.CH_MY_BODY] == 1
                         or obs[by, bx, T.CH_MY_TAIL] == 1)):
                cur = (hy - by, hx - bx)
                break
        current_direction = cur
    dy, dx = current_direction
    moves = {0: (dy, dx), 1: (-dx, dy), 2: (dx, -dy)}
    scores = []
    for a in (0, 1, 2):
        mdy, mdx = moves[a]
        ny, nx = hy + mdy, hx + mdx
        if not (0 <= ny < obs.shape[0] and 0 <= nx < obs.shape[1]):
            scores.append(-float('inf'))
            continue
        if any(obs[ny, nx, ch] == 1 for ch in DEADLY_CHANNELS):
            scores.append(-float('inf'))
            continue
        score = 0.0
        if target is not None:
            score = -(abs(ny - target[0]) + abs(nx - target[1]))
        scores.append(score)
    if all(s == -float('inf') for s in scores):
        chosen = 0
    else:
        best = max(scores)
        chosen = random.choice(
            [i for i, s in enumerate(scores) if s == best])
    return chosen, moves[chosen]


def test_greedy_agent_matches_loop_form():
    """Vectorized GreedyAgent == the reference loop-form heuristic,
    decision for decision, over synthetic obs trajectories (incl. no-head,
    no-fruit, all-blocked, and tie-break cases)."""
    import random
    from marlsnake_tpu.algo.opponents import GreedyAgent
    rng = np.random.default_rng(7)
    for trial in range(30):
        h, w = rng.integers(4, 12, size=2)
        agent = GreedyAgent(0)
        loop_dir = None
        for step in range(12):
            obs = np.zeros((h, w, 8), np.uint8)
            # sparse random channel content
            for ch, p in [(T.CH_WALL, 0.15), (T.CH_FRUIT, 0.08),
                          (T.CH_OTHER_BODY, 0.1), (T.CH_MY_BODY, 0.1),
                          (T.CH_MY_TAIL, 0.05)]:
                obs[:, :, ch] = rng.random((h, w)) < p
            if rng.random() > 0.1:  # usually a head exists
                obs[rng.integers(h), rng.integers(w), T.CH_MY_HEAD] = 1
            seed = int(rng.integers(1 << 30))
            random.seed(seed)
            a_vec = agent.get_action(obs)
            random.seed(seed)
            a_loop, loop_dir = _greedy_loop_form(obs, loop_dir)
            assert a_vec == a_loop, (trial, step)
            assert tuple(agent.current_direction or (None,)) == \
                tuple(loop_dir or (None,)), (trial, step)


def test_dqn_update_pacing_modes():
    """Opt-in update_every=K (env steps per optimizer step; the
    DQN-Nature update-frequency knob, measured 2.2x episode throughput
    at e=32 on TPU) and update_batch_size (e.g. K*batch to preserve the
    reference's gradient-sample throughput). Default K=1 keeps the
    reference's 1-update-per-env-step contract."""
    from marlsnake_tpu.algo.dqn_trainer import DQNConfig, DQNTrainer
    cfg = DQNConfig(height=8, width=8, num_snakes=2, snake_length=2,
                    num_envs=4, max_steps_per_episode=16,
                    batch_size=8, min_buffer_size=8, buffer_size=512,
                    update_every=4, update_batch_size=32)
    tr = DQNTrainer(cfg)
    ts = tr.init_state()
    ts, m = tr._train_episode(ts)
    assert int(m.updates) <= 16 // 4
    assert np.isfinite(float(m.mean_loss))
    # a second episode with a warm buffer must fire every paced update
    ts, m2 = tr._train_episode(ts)
    assert int(m2.updates) >= 1
    # invalid pacing is rejected up front
    import pytest
    with pytest.raises(ValueError):
        DQNTrainer(DQNConfig(max_steps_per_episode=10, update_every=3))


@pytest.mark.slow
def test_dqn_fused_act_update_mode():
    """Opt-in fused acting+update (the TPU 'overlap' translation: one
    (E*N + batch)-row forward per step, minibatch sampled pre-push).
    Must fire the same number of per-step updates as the reference
    contract once the buffer is warm, and actually learn (params
    change, finite loss)."""
    from marlsnake_tpu.algo.dqn_trainer import DQNConfig, DQNTrainer
    base = dict(height=8, width=8, num_snakes=2, snake_length=2,
                num_envs=4, max_steps_per_episode=16, batch_size=8,
                min_buffer_size=8, buffer_size=512, save_freq=0)
    trs = {f: DQNTrainer(DQNConfig(fused_act_update=f, **base))
           for f in (False, True)}
    sts = {f: tr.init_state() for f, tr in trs.items()}
    for _ in range(3):
        ms = {}
        for f in (False, True):
            sts[f], ms[f] = trs[f]._train_episode(sts[f])
    # warm-buffer episodes fire one update per live env step both ways
    # (+-1: fused evaluates the live predicate pre-step, so an episode
    # that freezes at step k fires k updates instead of k-1)
    assert abs(int(ms[True].updates) - int(ms[False].updates)) <= 1
    assert np.isfinite(float(ms[True].mean_loss))
    assert float(ms[True].mean_loss) > 0
    p0 = jax.tree.leaves(trs[True].init_state().params)[0]
    p1 = jax.tree.leaves(sts[True].params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    # fused requires the 1-update-per-step contract
    import pytest
    with pytest.raises(ValueError):
        DQNTrainer(DQNConfig(fused_act_update=True, update_every=4,
                             max_steps_per_episode=16))


def test_dqn_training_identical_under_packed_obs(tmp_path):
    """obs_format='packed' changes storage format only: the whole
    training trajectory (episode metrics, final params) is bit-identical
    to uint8 mode — the net ingress unpacks to the exact planes."""
    import dataclasses
    import jax
    import numpy as np
    from marlsnake_tpu.algo.dqn_trainer import DQNConfig, DQNTrainer

    base = DQNConfig(height=10, width=10, num_snakes=2, snake_length=2,
                     num_envs=2, max_steps_per_episode=8, batch_size=8,
                     min_buffer_size=8, buffer_size=64,
                     save_dir=str(tmp_path))
    results = {}
    for fmt in ('uint8', 'packed'):
        tr = DQNTrainer(dataclasses.replace(base, obs_format=fmt))
        ts = tr.init_state()
        ms = []
        for _ in range(3):
            ts, m = tr._train_episode(ts)
            ms.append((float(m.mean_loss), float(m.mean_reward),
                       float(m.episode_length)))
        results[fmt] = (ms, ts)
    assert results['uint8'][0] == results['packed'][0]
    for a, b in zip(jax.tree.leaves(results['uint8'][1].params),
                    jax.tree.leaves(results['packed'][1].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the packed replay buffer really is 8x narrower
    assert (results['packed'][1].buffer.obs.shape[1] * 8
            == results['uint8'][1].buffer.obs.shape[1])


def test_dqn_reencode_acting_obs_bit_identical(tmp_path):
    """reencode_acting_obs derives the acting forward's input from the
    carried grid — bit-identical trajectories (obs is a pure function of
    the grid for full-obs fs=1, and the trainer keeps grid/obs in
    lockstep through freezes)."""
    import dataclasses
    import jax
    import numpy as np
    from marlsnake_tpu.algo.dqn_trainer import DQNConfig, DQNTrainer

    base = DQNConfig(height=10, width=10, num_snakes=2, snake_length=2,
                     num_envs=4, max_steps_per_episode=12, batch_size=8,
                     min_buffer_size=8, buffer_size=128,
                     obs_pad_channels=8, save_dir=str(tmp_path))
    outs = {}
    for on in (False, True):
        tr = DQNTrainer(dataclasses.replace(
            base, reencode_acting_obs=on))
        ts = tr.init_state()
        ms = []
        for _ in range(3):
            ts, m = tr._train_episode(ts)
            ms.append((float(m.mean_loss), float(m.mean_reward),
                       float(m.episode_length)))
        outs[on] = (ms, ts)
    assert outs[False][0] == outs[True][0]
    for a, b in zip(jax.tree.leaves(outs[False][1].params),
                    jax.tree.leaves(outs[True][1].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_neat_fitness_common_random_numbers():
    """fitness_episodes=K evaluates every genome on the SAME K env keys
    (paired comparisons): two trainers differing only in K produce
    fitness; identical genomes (clones) must score identically within a
    generation (they play identical draws)."""
    import jax
    from marlsnake_tpu.algo.dqn_trainer import DQNConfig, DQNTrainer
    from marlsnake_tpu.algo.neat import NeatConfig
    from marlsnake_tpu.algo.neat_hybrid import (HybridNEATTrainer,
                                                fc3_to_genome)
    from marlsnake_tpu.core.types import EnvConfig

    env_cfg = EnvConfig(height=10, width=10, num_snakes=2,
                        snake_length=3)
    dtr = DQNTrainer(DQNConfig(height=10, width=10, num_snakes=2,
                               snake_length=3))
    params = dtr.init_state(jax.random.key(1)).params
    neat_cfg = NeatConfig(num_inputs=128, num_outputs=3, pop_size=4)
    tr = HybridNEATTrainer(params, env_cfg=env_cfg, neat_cfg=neat_cfg,
                           episode_steps=32, fitness_episodes=3,
                           result_file='/tmp/neat_crn_test.pkl')
    g = fc3_to_genome(params, neat_cfg)
    import copy
    genomes = [(i, copy.deepcopy(g)) for i in range(4)]
    tr.eval_genomes(genomes, neat_cfg)
    fits = [gn.fitness for _, gn in genomes]
    # identical genomes + common random numbers -> identical fitness
    assert len(set(fits)) == 1, fits


def test_hybrid_checkpoint_msgpack_roundtrip(tmp_path):
    """The pickle-free hybrid checkpoint format (.msgpack) round-trips
    genome + NeatConfig + params and produces the same network outputs
    as the pickle format (ADVICE r4: shareable checkpoints should not
    require unsafe pickle.load)."""
    import jax
    import numpy as np
    from marlsnake_tpu.algo.dqn_trainer import DQNConfig, DQNTrainer
    from marlsnake_tpu.algo.neat import NeatConfig, FeedForwardNetwork
    from marlsnake_tpu.algo.neat_hybrid import (fc3_to_genome,
                                                load_hybrid_raw,
                                                save_checkpoint_safe)

    dtr = DQNTrainer(DQNConfig(height=10, width=10, num_snakes=2,
                               snake_length=3))
    params = jax.device_get(dtr.init_state(jax.random.key(2)).params)
    cfg = NeatConfig(num_inputs=128, num_outputs=3, pop_size=7)
    genome = fc3_to_genome(params, cfg)
    genome.fitness = 1.25
    payload = {'dqn_params': params, 'neat_genome': genome,
               'neat_config': cfg}
    for name in ('h.msgpack', 'h.pkl'):
        save_checkpoint_safe(payload, str(tmp_path / name))
    a = load_hybrid_raw(str(tmp_path / 'h.msgpack'))
    b = load_hybrid_raw(str(tmp_path / 'h.pkl'))
    assert a['neat_config'] == b['neat_config']
    assert a['neat_genome'].fitness == 1.25
    x = np.random.default_rng(0).normal(size=128)
    na = FeedForwardNetwork.create(a['neat_genome'], a['neat_config'])
    nb = FeedForwardNetwork.create(b['neat_genome'], b['neat_config'])
    np.testing.assert_allclose(na.activate(x), nb.activate(x),
                               rtol=1e-12)
    for pa, pb in zip(jax.tree.leaves(a['dqn_params']),
                      jax.tree.leaves(b['dqn_params'])):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_ppo_training_identical_under_packed_obs():
    """PPO with obs_format='packed' stores packed rollouts and unpacks
    at net ingress — updates are bit-identical to uint8 mode."""
    import dataclasses
    import jax
    import numpy as np
    from marlsnake_tpu.algo.ppo_trainer import PPOConfig, PPOTrainer

    base = PPOConfig(height=10, width=10, num_snakes=2, snake_length=2,
                     num_envs=4, rollout_steps=8, num_minibatches=2,
                     update_epochs=1, save_final=False, frame_stack=2)
    outs = {}
    for fmt in ('uint8', 'packed'):
        tr = PPOTrainer(dataclasses.replace(base, obs_format=fmt))
        ts = tr.init_state()
        ts, m = tr._update(ts)
        ts, m = tr._update(ts)
        outs[fmt] = (float(m.loss_actor), float(m.loss_value), ts)
    assert outs['uint8'][:2] == outs['packed'][:2]
    for a, b in zip(jax.tree.leaves(outs['uint8'][2].params),
                    jax.tree.leaves(outs['packed'][2].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_es_head_trainer_runs_and_matches_seed_semantics(tmp_path):
    """HeadESTrainer: (a) one generation runs end-to-end and saves a
    loadable fc3-topology hybrid checkpoint; (b) the relu-head device
    batch reproduces the fc3-seeded NEAT genome's FeedForwardNetwork
    logits (same evaluation contract as the NEAT hybrid path); (c) CRN
    pairing — the unperturbed member's fitness is deterministic in
    (seed, generation)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from marlsnake_tpu.algo.dqn_trainer import DQNConfig, DQNTrainer
    from marlsnake_tpu.algo.neat import FeedForwardNetwork, NeatConfig
    from marlsnake_tpu.algo.neat_hybrid import (HeadESTrainer,
                                                load_hybrid)
    from marlsnake_tpu.core.types import EnvConfig

    env_cfg = EnvConfig(height=10, width=10, num_snakes=2,
                        snake_length=3)
    dtr = DQNTrainer(DQNConfig(height=10, width=10, num_snakes=2,
                               snake_length=3))
    params = dtr.init_state(jax.random.key(3)).params
    out = str(tmp_path / 'es.msgpack')
    tr = HeadESTrainer(params, env_cfg=env_cfg,
                       neat_cfg=NeatConfig(num_inputs=128, num_outputs=3),
                       episode_steps=16, pop_size=4, sigma=0.05,
                       fitness_episodes=2, seed=0, result_file=out)

    # (b) head semantics == fc3-seeded genome's FeedForwardNetwork
    genome = tr.theta_to_genome(tr._seed_theta)
    net = FeedForwardNetwork.create(genome, tr.neat_cfg)
    emb = np.random.default_rng(0).normal(size=(1, 2, 128)) \
        .astype(np.float32)
    logits = np.maximum(
        np.einsum('pni,pij->pnj', emb,
                  np.asarray(tr._seed_theta[0])[None])
        + np.asarray(tr._seed_theta[1]), 0.0)
    for i in range(2):
        np.testing.assert_allclose(
            net.activate(emb[0, i]), logits[0, i], rtol=1e-5, atol=1e-5)

    best_theta, best_score, hist = tr.run(num_generations=1,
                                          verbose=False)
    assert len(hist) == 1 and np.isfinite(hist[0]['theta_fitness'])
    dqn_params, loaded_net = load_hybrid(out)  # (a) consumers load it
    np.testing.assert_allclose(
        loaded_net.activate(emb[0, 0]),
        np.maximum(emb[0, 0] @ np.asarray(best_theta[0])
                   + np.asarray(best_theta[1]), 0.0),
        rtol=1e-5, atol=1e-5)

    # (c) determinism of the unperturbed member's CRN fitness
    tr2 = HeadESTrainer(params, env_cfg=env_cfg,
                        neat_cfg=NeatConfig(num_inputs=128,
                                            num_outputs=3),
                        episode_steps=16, pop_size=4, sigma=0.05,
                        fitness_episodes=2, seed=0,
                        result_file=str(tmp_path / 'es2.msgpack'))
    _, _, hist2 = tr2.run(num_generations=1, verbose=False)
    assert hist[0]['theta_fitness'] == hist2[0]['theta_fitness']


def test_es_holdout_compare_paired():
    """holdout_compare plays both heads on the SAME fresh draws: a head
    compared against itself must have exactly zero paired difference."""
    import jax
    from marlsnake_tpu.algo.dqn_trainer import DQNConfig, DQNTrainer
    from marlsnake_tpu.algo.neat import NeatConfig
    from marlsnake_tpu.algo.neat_hybrid import HeadESTrainer
    from marlsnake_tpu.core.types import EnvConfig

    env_cfg = EnvConfig(height=10, width=10, num_snakes=2,
                        snake_length=3)
    dtr = DQNTrainer(DQNConfig(height=10, width=10, num_snakes=2,
                               snake_length=3))
    params = dtr.init_state(jax.random.key(4)).params
    tr = HeadESTrainer(params, env_cfg=env_cfg,
                       neat_cfg=NeatConfig(num_inputs=128, num_outputs=3),
                       episode_steps=16, pop_size=4,
                       fitness_episodes=1,
                       result_file='/tmp/es_holdout_test.msgpack')
    ma, mb, dmean, dstd = tr.holdout_compare(
        tr._seed_theta, tr._seed_theta, episodes=3)
    assert ma == mb and dmean == 0.0 and dstd == 0.0
