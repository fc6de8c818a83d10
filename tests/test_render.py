"""Headless render smoke tests (C17 RenderGUI, C31 render_winner).

The reference exercises these only via manual drives (test_env.py,
train_ga.py __main__); here they run headless in CI: mp4 artifacts must be
written and non-empty, fancy frames must have the right shape/dtype.
"""

import os

import numpy as np
import pytest

from marlsnake_tpu.core.types import EnvConfig


def _make_env(**kw):
    from marlsnake_tpu.envs.env import SnakeEnv
    from marlsnake_tpu.envs.wrappers import GymAdapter
    params = dict(height=10, width=10, num_snakes=2, snake_length=3)
    params.update(kw)
    cfg = EnvConfig(**params)
    return GymAdapter(SnakeEnv(cfg), seed=0), cfg


def test_render_fancy_frame_shape_dtype():
    env, cfg = _make_env()
    env.reset()
    frame = env.render_fancy(cell_size=12)
    assert frame.shape == (cfg.height * 12, cfg.width * 12, 3)
    assert frame.dtype == np.uint8
    assert frame.max() > 0  # not a blank canvas


def test_render_gui_headless_writes_mp4(tmp_path):
    cv2 = pytest.importorskip('cv2')
    from marlsnake_tpu.envs.wrappers import RenderGUI
    env, cfg = _make_env()
    path = str(tmp_path / 'out.mp4')
    gui = RenderGUI(env, save_video=True, video_path=path, fps=10,
                    headless=True)
    gui.reset()
    rng = np.random.default_rng(0)
    for _ in range(8):
        frame = gui.render()
        assert frame is not None and frame.dtype == np.uint8
        _, _, dones, _ = gui.step(list(rng.integers(0, 3, 2)))
        if all(dones):
            break
    gui.close()
    assert os.path.exists(path) and os.path.getsize(path) > 0
    cap = cv2.VideoCapture(path)
    ok, first = cap.read()
    cap.release()
    assert ok and first is not None  # the mp4 decodes


def test_render_winner_headless(tmp_path):
    pytest.importorskip('cv2')
    import jax
    from marlsnake_tpu.algo.neat import NeatConfig
    from marlsnake_tpu.algo.neat_hybrid import (fc3_to_genome,
                                                render_winner,
                                                save_checkpoint_safe)
    from marlsnake_tpu.models.dqn import DQN

    cfg = EnvConfig(height=10, width=10, num_snakes=2, snake_length=3)
    net = DQN(num_actions=cfg.num_actions)
    import jax.numpy as jnp
    params = net.init(jax.random.key(0),
                      jnp.zeros((1,) + cfg.obs_shape[1:], jnp.uint8))
    neat_cfg = NeatConfig(num_inputs=128, num_outputs=3)
    genome = fc3_to_genome(params, neat_cfg)
    pickle_path = str(tmp_path / 'winner.pkl')
    save_checkpoint_safe({'dqn_params': jax.device_get(params),
                          'neat_genome': genome,
                          'neat_config': neat_cfg}, pickle_path)

    video = str(tmp_path / 'winner.mp4')
    rew, life = render_winner(pickle_path, env_cfg=cfg, episodes=1,
                              render=True, max_steps=12, video_path=video,
                              seed=0)
    assert np.isfinite(rew) and life > 0
    assert os.path.exists(video) and os.path.getsize(video) > 0
