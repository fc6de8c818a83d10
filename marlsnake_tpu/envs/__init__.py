from marlsnake_tpu.envs.env import SnakeEnv, make_env  # noqa: F401
