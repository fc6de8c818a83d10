"""marlsnake_tpu — a TPU-native multi-agent snake-battle RL framework.

A ground-up JAX/XLA re-design of the capabilities of
tranthai189765/MARL-Snake (mounted read-only at /root/reference): the
``marlenv`` Gym environment family, its wrapper/vectorization API, and the
DQN / PPO / NEAT-hybrid training, evaluation and battle stacks — rebuilt as
pure functional, fixed-shape, vmap/jit/shard_map-able array programs.
"""

__version__ = '0.1.0'

from marlsnake_tpu.core.types import EnvConfig  # noqa: F401
from marlsnake_tpu.envs.env import SnakeEnv, make_env  # noqa: F401
