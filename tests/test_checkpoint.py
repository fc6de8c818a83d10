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
