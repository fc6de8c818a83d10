"""Reference-path alias: ``marlenv.marlenv.wrappers`` -> the TPU-native
wrapper layer (see ``marlenv/__init__.py`` for why this path exists)."""

from marlsnake_tpu.envs.wrappers import (  # noqa: F401
    ENV_IDS, GymAdapter, RenderGUI, SingleAgent, SingleMultiAgent,
    VectorAdapter, Wrapper, make, make_snake)
