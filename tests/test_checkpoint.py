"""Full-state checkpoint/restore, including mid-episode env state —
a capability the reference lacks (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np

from marlsnake_tpu.utils import checkpoint as ckpt


def test_mid_episode_resume_bit_exact(tmp_path):
    from marlsnake_tpu.algo.ppo_trainer import PPOConfig, PPOTrainer
    cfg = PPOConfig(height=8, width=8, num_snakes=2, snake_length=2,
                    num_envs=4, rollout_steps=8, num_minibatches=2,
                    update_epochs=1)
    tr = PPOTrainer(cfg)
    ts = tr.init_state()
    ts, _ = tr._update(ts)  # envs now mid-episode

    path = str(tmp_path / 'full_state')
    ckpt.save(path, ts)
    restored = ckpt.restore(path, ts)

    # restored state (params + env states + PRNG key) must continue
    # bit-identically to the uninterrupted run
    ts_a, m_a = tr._update(ts)
    ts_b, m_b = tr._update(jax.tree.map(jnp.asarray, restored))
    np.testing.assert_array_equal(np.asarray(ts_a.obs),
                                  np.asarray(ts_b.obs))
    np.testing.assert_allclose(float(m_a.loss_actor),
                               float(m_b.loss_actor), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ts_a.params),
                    jax.tree.leaves(ts_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6)


def test_async_checkpointer(tmp_path):
    payload = {'a': jnp.arange(10), 'b': {'c': jnp.ones((3, 3))}}
    ac = ckpt.AsyncCheckpointer()
    path = str(tmp_path / 'async_state')
    ac.save(path, payload)
    ac.wait()
    restored = ckpt.restore(path, payload)
    np.testing.assert_array_equal(np.asarray(restored['a']),
                                  np.arange(10))
    ac.close()


def test_bf16_models():
    from marlsnake_tpu.models.dqn import DQN
    net = DQN(num_actions=3, compute_dtype=jnp.bfloat16)
    x = jnp.zeros((4, 12, 12, 8), jnp.uint8)
    params = net.init(jax.random.key(0), x)
    q = net.apply(params, x)
    assert q.dtype == jnp.float32 and q.shape == (4, 3)
    # params stay f32 (mixed precision: bf16 compute, f32 storage)
    assert jax.tree.leaves(params)[0].dtype == jnp.float32


def _tiny_dqn_cfg(tmp_path):
    from marlsnake_tpu.algo.dqn_trainer import DQNConfig
    return DQNConfig(height=8, width=8, num_snakes=2, snake_length=2,
                     num_envs=2, max_steps_per_episode=8, batch_size=8,
                     min_buffer_size=8, buffer_size=64,
                     save_dir=str(tmp_path))


def test_dqn_kill_and_resume_matches_uninterrupted(tmp_path):
    """Kill-and-resume via a FULL trainer checkpoint (params + target +
    optimizer state + replay buffer + PRNG key): the resumed run's
    loss/reward trajectory is bit-identical to the uninterrupted one.
    Reference parity target: train_dqn.py:357-377 saves/restores
    optimizer.state_dict(); we additionally carry the buffer + key, which
    is what makes exact trajectory continuation possible at all."""
    from marlsnake_tpu.algo.dqn_trainer import DQNTrainer
    cfg = _tiny_dqn_cfg(tmp_path)
    tr = DQNTrainer(cfg)
    ts = tr.init_state()
    for _ in range(2):
        ts, _ = tr._train_episode(ts)
    tr.save_checkpoint(ts, 'mid', full=True)

    # uninterrupted continuation
    cont = []
    ts_a = ts
    for _ in range(2):
        ts_a, m = tr._train_episode(ts_a)
        cont.append((float(m.mean_loss), float(m.mean_reward)))

    # "killed" process: fresh trainer, restore, continue
    tr2 = DQNTrainer(cfg)
    ts_b, _ = tr2.load_checkpoint('mid', tr2.init_state(), full=True)
    resumed = []
    for _ in range(2):
        ts_b, m = tr2._train_episode(ts_b)
        resumed.append((float(m.mean_loss), float(m.mean_reward)))
    assert resumed == cont


def test_dqn_checkpoint_carries_opt_state(tmp_path):
    """The reference-shaped checkpoint now includes optimizer state
    (train_dqn.py:357-365): restored Adam moments equal the saved ones
    (warm), not a fresh init."""
    from marlsnake_tpu.algo.dqn_trainer import DQNTrainer
    cfg = _tiny_dqn_cfg(tmp_path)
    tr = DQNTrainer(cfg)
    ts = tr.init_state()
    for _ in range(2):
        ts, _ = tr._train_episode(ts)
    assert int(ts.global_step) > 0  # updates actually ran
    tr.save_checkpoint(ts, 'warm')

    ts2, _ = tr.load_checkpoint('warm', tr.init_state())
    for a, b in zip(jax.tree.leaves(ts.opt_state),
                    jax.tree.leaves(ts2.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(ts2.global_step) == int(ts.global_step)
    # and the moments are genuinely non-trivial (training happened)
    assert any(np.abs(np.asarray(x)).sum() > 0
               for x in jax.tree.leaves(ts.opt_state))


def test_dqn_legacy_checkpoint_loads_without_opt_state(tmp_path):
    """Checkpoints written before opt_state was added still load (fresh
    optimizer state, warned-about cold moments)."""
    from marlsnake_tpu.algo.dqn_trainer import DQNTrainer
    cfg = _tiny_dqn_cfg(tmp_path)
    tr = DQNTrainer(cfg)
    ts = tr.init_state()
    legacy = {
        'params': ts.params, 'target_params': ts.target_params,
        'epsilon': ts.epsilon, 'episode': ts.episode,
        'best_mean_reward': jnp.float32(1.5),
    }
    ckpt.save(tr._ckpt_path('old'), legacy)
    ts2, extra = tr.load_checkpoint('old', tr.init_state())
    assert extra['best_mean_reward'] == 1.5


def test_ppo_kill_and_resume_matches_uninterrupted(tmp_path):
    """Same contract for PPO (reference ghost checkpoint carries
    optimizer_state_dict + epoch, SURVEY.md C35)."""
    from marlsnake_tpu.algo.ppo_trainer import PPOConfig, PPOTrainer
    cfg = PPOConfig(height=8, width=8, num_snakes=2, snake_length=2,
                    num_envs=4, rollout_steps=8, num_minibatches=2,
                    update_epochs=1, save_dir=str(tmp_path),
                    save_final=False)
    tr = PPOTrainer(cfg)
    ts = tr.init_state()
    ts, _ = tr._update(ts)
    tr.save_checkpoint(ts, 'mid', full=True)

    ts_a, m_a = tr._update(ts)
    tr2 = PPOTrainer(cfg)
    ts_b = tr2.load_checkpoint('mid', tr2.init_state(), full=True)
    ts_b, m_b = tr2._update(ts_b)
    assert float(m_a.loss_actor) == float(m_b.loss_actor)
    assert float(m_a.loss_value) == float(m_b.loss_value)
    for a, b in zip(jax.tree.leaves(ts_a.params),
                    jax.tree.leaves(ts_b.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ppo_resume_from_config_routes(tmp_path):
    """PPOConfig.resume_from continues training from a saved tag with
    warm optimizer state and the update counter advanced."""
    import dataclasses as dc
    from marlsnake_tpu.algo.ppo_trainer import PPOConfig, PPOTrainer
    cfg = PPOConfig(height=8, width=8, num_snakes=2, snake_length=2,
                    num_envs=2, rollout_steps=4, num_minibatches=2,
                    update_epochs=1, num_updates=2,
                    save_dir=str(tmp_path), save_final=True)
    tr = PPOTrainer(cfg)
    ts = tr.train(log=False)
    assert int(ts.update) == 2

    cfg2 = dc.replace(cfg, resume_from='final', num_updates=3)
    tr2 = PPOTrainer(cfg2)
    ts2 = tr2.train(log=False)
    assert int(ts2.update) == 3  # resumed at 3, ran exactly one update
    # opt_state came back warm from the checkpoint
    counts = [np.asarray(x) for x in jax.tree.leaves(ts2.opt_state)
              if np.asarray(x).ndim == 0]
    assert any(c > 0 for c in counts)


def test_dqn_checkpoint_writes_topology_sidecar(tmp_path):
    """save_checkpoint persists obs_pad_channels next to the orbax tree
    (consumers applying padded-trained params on raw 8-channel obs need
    it; the orbax payload itself stays template-compatible)."""
    import json
    import os
    from marlsnake_tpu.algo.dqn_trainer import DQNConfig, DQNTrainer

    cfg = DQNConfig(height=8, width=8, num_snakes=2, snake_length=2,
                    obs_pad_channels=8, save_dir=str(tmp_path))
    tr = DQNTrainer(cfg)
    ts = tr.init_state()
    tr.save_checkpoint(ts, 'probe')
    meta_path = tr._ckpt_path('probe') + '.meta.json'
    assert os.path.exists(meta_path)
    assert json.load(open(meta_path))['obs_pad_channels'] == 8
    # and the payload restores through the unchanged template
    ts2, _ = tr.load_checkpoint('probe', tr.init_state())
    assert jax.tree.all(jax.tree.map(
        lambda a, b: (np.asarray(a) == np.asarray(b)).all(),
        ts.params, ts2.params))
