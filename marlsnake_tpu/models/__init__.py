from marlsnake_tpu.models.dqn import DQN  # noqa: F401
from marlsnake_tpu.models.ppo import ActorCritic  # noqa: F401
