"""Import the reference SnakeEnv with a minimal fake-gym shim.

gym==0.24.1 is not installable here; the reference env only touches a
narrow slice of the gym API (Env base class, spaces.Discrete/Box,
utils.seeding, envs.registration.register), which this shim fakes so the
REAL reference code at /root/reference can be executed for golden-trajectory
validation. Nothing from the reference is copied — it is imported read-only.
"""

import sys
import types

import numpy as np

REF_PATH = '/root/reference/marlenv'


def install_gym_shim():
    if 'gym' in sys.modules and getattr(sys.modules['gym'], '_marl_shim',
                                        False):
        return sys.modules['gym']
    gym = types.ModuleType('gym')
    gym._marl_shim = True

    class Env:
        metadata = {}

        def close(self):
            pass

    class Wrapper(Env):
        def __init__(self, env):
            self.env = env

        def __getattr__(self, name):
            return getattr(self.env, name)

    spaces = types.ModuleType('gym.spaces')

    class Discrete:
        def __init__(self, n):
            self.n = n

        def sample(self):
            return int(np.random.randint(self.n))

    class Box:
        def __init__(self, low, high, shape=None, dtype=np.uint8):
            self.low, self.high = low, high
            self.shape = tuple(shape) if shape is not None else None
            self.dtype = dtype

    spaces.Discrete = Discrete
    spaces.Box = Box

    utils = types.ModuleType('gym.utils')
    seeding = types.ModuleType('gym.utils.seeding')

    def np_random(seed=None):
        return np.random.RandomState(seed), seed

    seeding.np_random = np_random
    utils.seeding = seeding

    envs = types.ModuleType('gym.envs')
    registration = types.ModuleType('gym.envs.registration')
    _registry = {}

    def register(id=None, entry_point=None, **kwargs):
        _registry[id] = entry_point

    registration.register = register
    envs.registration = registration

    gym.Env = Env
    gym.Wrapper = Wrapper
    gym.spaces = spaces
    gym.utils = utils
    gym.envs = envs

    sys.modules['gym'] = gym
    sys.modules['gym.spaces'] = spaces
    sys.modules['gym.utils'] = utils
    sys.modules['gym.utils.seeding'] = seeding
    sys.modules['gym.envs'] = envs
    sys.modules['gym.envs.registration'] = registration
    return gym


def load_reference_snake_env():
    """Returns the reference SnakeEnv class (executed, not copied)."""
    install_gym_shim()
    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    from marlenv.envs.snake_env import SnakeEnv  # noqa: PLC0415
    return SnakeEnv
