"""Reference-compatible wrapper / factory layer.

Re-creates the public API surface of the reference ``marlenv.wrappers``
(wrappers.py:84-223) on top of the functional engine:

* ``make_snake(num_envs, num_snakes, env_id, **kwargs)`` — same signature
  and return arity as wrappers.py:203-223, but the obs/action shape slots
  carry real values instead of the reference's literal ``None``s.
* ``SingleAgent`` / ``SingleMultiAgent`` — per-agent space views
  (wrappers.py:84-124).
* Stateful adapters expose the classic ``reset()/step(actions)`` protocol so
  reference-style training loops port unchanged; internally everything is a
  jitted pure function over device state. The ``num_envs > 1`` path maps to
  the vmapped auto-reset vector env instead of fork workers + shared memory
  (wrappers.py:126-194).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from marlsnake_tpu.core import render as R
from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.envs.env import SnakeEnv
from marlsnake_tpu.envs.graph import GraphSnakeEnv
from marlsnake_tpu.envs.vector import VectorSnakeEnv
from marlsnake_tpu.utils import spaces

ENV_IDS = {
    'Snake-v1': dict(done_mode='all', graph=False),
    'SnakeCoop-v1': dict(done_mode='any', graph=False),
    'SnakeGraph-v1': dict(done_mode='all', graph=True),
}


def make(env_id: str = 'Snake-v1', **kwargs) -> 'GymAdapter':
    """Registry-style constructor mirroring the reference's gym IDs
    (envs/__init__.py:1-16)."""
    if env_id not in ENV_IDS:
        raise KeyError(f'unknown env id {env_id!r}; '
                       f'choose from {sorted(ENV_IDS)}')
    spec = ENV_IDS[env_id]
    kwargs.pop('disable_env_checker', None)
    seed = kwargs.pop('seed', 0)
    reward_dict = kwargs.pop('reward_dict', None)
    kwargs.setdefault('num_fruits', -1)
    if 'map' in kwargs:
        from marlsnake_tpu.core.maps import load_layout
        kwargs['map_layout'] = load_layout(kwargs.pop('map'))
    cfg = EnvConfig.from_reward_dict(reward_dict,
                                     done_mode=spec['done_mode'], **kwargs)
    env = GraphSnakeEnv(cfg) if spec['graph'] else SnakeEnv(cfg)
    return GymAdapter(env, seed=seed)


class GymAdapter:
    """Stateful single-env adapter with the reference step protocol.

    ``step`` returns ``(obs ndarray, rews list, dones list, info dict)``
    exactly like ``SnakeEnv.step`` (snake_env.py:414).
    """

    def __init__(self, env: SnakeEnv, seed: int = 0):
        self.env = env
        self.cfg = env.cfg
        self.num_snakes = self.cfg.num_snakes
        self._base_key = jax.random.key(seed)
        self._episode = 0
        self._state = None
        self._recorder = R.GifRecorder()
        self.action_space = spaces.Discrete(
            self.cfg.num_actions * self.num_snakes, seed=seed)
        self.observation_space = spaces.Box(
            0, 1, shape=env.obs_shape, dtype=env.obs_dtype, seed=seed)

    # --- protocol ---------------------------------------------------------
    def seed(self, seed: int = 42):
        self._base_key = jax.random.key(seed)
        self._episode = 0
        return [seed]

    def reset(self, **kwargs) -> np.ndarray:
        key = jax.random.fold_in(self._base_key, self._episode)
        self._episode += 1
        self._state, obs = self.env.reset(key)
        return np.asarray(obs)

    def step(self, actions):
        if isinstance(actions, (int, np.integer)):
            actions = [actions]
        assert len(actions) == self.num_snakes
        acts = np.asarray([int(a) for a in actions])
        self._state, out = self.env.step(self._state, acts)
        info = {}
        if bool(out.done_all):
            info['rank'] = [int(x) for x in np.asarray(out.rank)]
            info['episode_scores'] = np.asarray(out.episode_scores)
            info['episode_steps'] = np.asarray(out.episode_steps)
            info['episode_fruits'] = np.asarray(out.episode_fruits)
            info['episode_kills'] = np.asarray(out.episode_kills)
        return (np.asarray(out.obs),
                [float(r) for r in np.asarray(out.reward)],
                [bool(d) for d in np.asarray(out.done)],
                info)

    def close(self):
        pass

    # --- state access -----------------------------------------------------
    @property
    def state(self):
        return self._state

    @property
    def grid(self) -> np.ndarray:
        return np.asarray(self._state.grid)

    # --- rendering (host-side; reference snake_env.py:165-299) ------------
    def render(self, mode: str = 'ascii', **kwargs):
        if mode == 'ascii':
            print(R.render_ascii(self.grid))
        elif mode == 'gif':
            self._recorder.capture(self.grid)
        elif mode == 'rgb_array':
            return R.rgb_from_grid(self.grid)
        elif mode == 'human':
            pass

    def render_fancy(self, cell_size: int = 40, save_path=None):
        return R.render_fancy(
            self.grid, directions=np.asarray(self._state.direction),
            alive=np.asarray(self._state.alive),
            cell_size=cell_size, save_path=save_path)

    def save_gif(self, fp=None):
        return self._recorder.save(fp)

    # attribute passthrough sugar for wrapper stacking
    @property
    def unwrapped(self):
        return self


class Wrapper:
    def __init__(self, env):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self, **kwargs):
        return self.env.reset(**kwargs)

    def step(self, actions, **kwargs):
        return self.env.step(actions, **kwargs)

    def close(self):
        return self.env.close()


class SingleAgent(Wrapper):
    """Unwraps the snake dim for 1-snake envs (wrappers.py:84-105)."""

    def __init__(self, env):
        super().__init__(env)
        assert env.num_snakes == 1, 'Number of player must be one'
        self.action_space = spaces.Discrete(env.cfg.num_actions)
        self.observation_space = spaces.Box(
            0, 255, shape=env.observation_space.shape[1:],
            dtype=env.observation_space.dtype)

    def reset(self, **kwargs):
        return self.env.reset(**kwargs)[0]

    def step(self, action, **kwargs):
        obs, rews, dones, infos = self.env.step([action], **kwargs)
        return obs[0], rews[0], dones[0], {}


class SingleMultiAgent(Wrapper):
    """Per-agent space declaration (wrappers.py:107-124); passthrough step."""

    def __init__(self, env):
        super().__init__(env)
        self.action_space = spaces.Discrete(env.cfg.num_actions)
        self.observation_space = spaces.Box(
            0, 255, shape=env.observation_space.shape,
            dtype=env.observation_space.dtype)


class VectorAdapter:
    """Stateful batched adapter over the vmapped auto-reset vector env.

    Replaces ``AsyncVectorMultiEnv`` (wrappers.py:161-194): obs arrive as a
    (num_envs, num_snakes, ...) device-backed batch with no worker pipes or
    shared-memory transport.
    """

    def __init__(self, cfg: EnvConfig, num_envs: int, seed: int = 0,
                 graph: bool = False):
        self.cfg = cfg
        self.num_envs = num_envs
        self.num_snakes = cfg.num_snakes
        self.venv = VectorSnakeEnv(cfg, num_envs, autoreset=True,
                                   graph=graph)
        self._key = jax.random.key(seed)
        self._states = None
        self.action_space = spaces.Discrete(cfg.num_actions)
        self.observation_space = spaces.Box(
            0, 255, shape=self.venv.obs_shape,
            dtype=np.float32 if graph else np.uint8)

    def reset(self, **kwargs) -> np.ndarray:
        self._key, sub = jax.random.split(self._key)
        self._states, obs = self.venv.reset(sub)
        return np.asarray(obs)

    def step(self, actions):
        acts = np.asarray(actions).reshape(self.num_envs, self.num_snakes)
        self._states, out = self.venv.step(self._states, acts)
        return (np.asarray(out.obs), np.asarray(out.reward),
                np.asarray(out.done),
                {'done_all': np.asarray(out.done_all)})

    # --- gym.vector-shaped split-call protocol ------------------------
    # API parity with AsyncVectorEnv's step_async/step_wait
    # (reference wrappers.py:126-194). Dispatch IS asynchronous here:
    # the jitted step is enqueued on the device at step_async and JAX
    # only blocks when step_wait converts the results to numpy — the
    # same overlap the reference bought with fork workers, without the
    # process pipes.
    def reset_async(self, **kwargs):
        self._key, sub = jax.random.split(self._key)
        self._states, self._pending_obs = self.venv.reset(sub)

    def reset_wait(self, **kwargs) -> np.ndarray:
        obs = np.asarray(self._pending_obs)
        self._pending_obs = None
        return obs

    def step_async(self, actions):
        acts = np.asarray(actions).reshape(self.num_envs,
                                           self.num_snakes)
        self._states, self._pending_out = self.venv.step(
            self._states, acts)

    def step_wait(self, **kwargs):
        out = self._pending_out
        self._pending_out = None
        return (np.asarray(out.obs), np.asarray(out.reward),
                np.asarray(out.done),
                {'done_all': np.asarray(out.done_all)})

    def render(self, mode: str = 'rgb_array'):
        grids = np.asarray(self._states.grid)
        return [R.rgb_from_grid(g) for g in grids]

    def close(self):
        pass

    @property
    def states(self):
        return self._states


class RenderGUI(Wrapper):
    """cv2 window + optional mp4 capture.

    Deliberately a close port of the reference's GUI shim
    (wrappers.py:20-82) rather than a redesign: it is ~45 lines of
    host-side cv2 calls with essentially one correct shape (named
    window, BGR convert, lazily-opened mp4v writer), kept
    field-compatible (``window_initialized``, ``render_size``) so users
    of the reference find the same knobs. TPU-native additions: frames
    come from the vectorized ``render_fancy`` grid renderer, and a
    ``headless`` mode (auto-detected from DISPLAY) skips the window for
    CI/batch use.
    """

    def __init__(self, env, window_name: str = 'Snake AI',
                 save_video: bool = False, video_path: str = 'output.mp4',
                 fps: int = 20, headless: Optional[bool] = None):
        super().__init__(env)
        self.window_name = window_name
        self.render_size = 30
        self.save_video = save_video
        self.video_path = video_path
        self.fps = fps
        self.video_writer = None
        self.window_initialized = False
        import os
        self.headless = (headless if headless is not None
                         else not os.environ.get('DISPLAY'))

    def render(self, *args, **kwargs):
        img_rgb = self.env.render_fancy(cell_size=self.render_size)
        if img_rgb is None:
            return None
        import cv2
        img_bgr = cv2.cvtColor(img_rgb, cv2.COLOR_RGB2BGR)
        if not self.headless:
            if not self.window_initialized:
                cv2.namedWindow(self.window_name, cv2.WINDOW_NORMAL)
                cv2.resizeWindow(self.window_name, img_bgr.shape[1],
                                 img_bgr.shape[0])
                self.window_initialized = True
            cv2.imshow(self.window_name, img_bgr)
            cv2.waitKey(1)
        if self.save_video and self.video_writer is None:
            h, w, _ = img_bgr.shape
            fourcc = cv2.VideoWriter_fourcc(*'mp4v')
            self.video_writer = cv2.VideoWriter(
                self.video_path, fourcc, self.fps, (w, h))
        if self.save_video and self.video_writer is not None:
            self.video_writer.write(img_bgr)
        return img_rgb

    def close(self):
        import cv2
        if self.video_writer is not None:
            self.video_writer.release()
        if self.window_initialized:
            cv2.destroyWindow(self.window_name)
        super().close()


def make_snake(num_envs: int = 1, num_snakes: int = 4,
               env_id: str = 'Snake-v1', seed: int = 0, **kwargs):
    """Main public factory — reference ``make_snake`` (wrappers.py:203-223).

    Returns ``(env, obs_shape, action_shape, properties)``. Unlike the
    reference (which returns ``None`` shapes — wrappers.py:223, a documented
    bug), the shape slots are populated.
    """
    kwargs.pop('render_mode', None)  # accepted & ignored, like gym.make

    if env_id not in ENV_IDS:
        raise KeyError(f'unknown env id {env_id!r}; '
                       f'choose from {sorted(ENV_IDS)}')

    def make_one():
        adapter = make(env_id, num_snakes=num_snakes, seed=seed, **kwargs)
        return (SingleMultiAgent(adapter) if num_snakes > 1
                else SingleAgent(adapter))

    if num_envs > 1:
        reward_dict = kwargs.pop('reward_dict', None)
        kwargs.setdefault('num_fruits', -1)
        if 'map' in kwargs:
            from marlsnake_tpu.core.maps import load_layout
            kwargs['map_layout'] = load_layout(kwargs.pop('map'))
        cfg = EnvConfig.from_reward_dict(
            reward_dict, num_snakes=num_snakes,
            done_mode=ENV_IDS[env_id]['done_mode'], **kwargs)
        env = VectorAdapter(cfg, num_envs, seed=seed,
                            graph=ENV_IDS[env_id]['graph'])
        obs_shape = env.observation_space.shape
        action_n = cfg.num_actions
    else:
        env = make_one()
        obs_shape = env.observation_space.shape
        action_n = env.action_space.n

    properties = {
        'action_info': {'action_n': action_n},
        'num_envs': num_envs,
        'num_snakes': num_snakes,
    }
    return env, obs_shape, (action_n,), properties
