from marlsnake_tpu.core.types import EnvConfig  # noqa: F401
from marlsnake_tpu.core.state import EnvState  # noqa: F401
