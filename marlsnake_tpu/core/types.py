"""Core constants and configuration for the TPU-native MARL-Snake engine.

Semantics contract: this module mirrors the cell/direction model of the
reference implementation (``/root/reference/marlenv/marlenv/core/snake.py:5-49``)
but re-encodes it for fixed-shape, compiler-friendly array programs:

* Cells are small ints; a grid cell stores ``cell_type | (snake_idx << 4)``
  (the reference uses ``cell_type + 10 * snake_idx`` — same information)
  (reference: ``envs/snake_env.py:140-144`` writes, ``:527,538`` decode).
* Directions are indices into a delta table instead of an Enum with
  ``__radd__`` magic (reference: ``core/snake.py:33-49``); the relative-turn
  algebra (atan2 rotation at ``envs/snake_env.py:598-608``) collapses to
  ``(dir ± 1) % 4`` with the table ordered UP, RIGHT, DOWN, LEFT.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

# --- Cell model (reference core/snake.py:5-11) ---
EMPTY = 0
WALL = 1
FRUIT = 2
HEAD = 3
BODY = 4
TAIL = 5

# Cell packing: cell = type | (owner << OWNER_SHIFT). The reference packs
# cell = type + 10 * owner (snake_env.py:140-144); a power-of-two shift is
# semantically identical (bijective re-encoding) but decodes with
# single-cycle bit ops on the TPU VPU — s32 division by 10 was a
# multi-instruction sequence costing ~10% of the whole step in device
# traces. Works for python ints, numpy, and jnp arrays alike.
OWNER_SHIFT = 4
TYPE_MASK = (1 << OWNER_SHIFT) - 1


def cell_type(cell):
    """Cell-type field (EMPTY..TAIL) of packed cell value(s)."""
    return cell & TYPE_MASK


def cell_owner(cell):
    """Owning snake index of packed cell value(s) (0 for env cells)."""
    return cell >> OWNER_SHIFT


def pack_cell(ctype, owner):
    """Pack type + owner into a cell value."""
    return ctype + (owner << OWNER_SHIFT)

# Number of feature channels in the observation encoding
# (reference envs/constants.py:1-2).
FEATURE_CHANNEL = 8
RGB_CHANNEL = 3

# Observation channel indices (reference envs/snake_env.py:478-492; consumer
# channel names at train_dqn.py:393-400).
CH_WALL = 0
CH_FRUIT = 1
CH_OTHER_HEAD = 2
CH_OTHER_BODY = 3
CH_OTHER_TAIL = 4
CH_MY_HEAD = 5
CH_MY_BODY = 6
CH_MY_TAIL = 7

# --- Direction model ---
# Index order chosen so that a relative left turn is ``(d - 1) % 4`` and a
# right turn is ``(d + 1) % 4`` — equivalent to the reference's
# cos/sin rotation (envs/snake_env.py:598-608).
UP, RIGHT, DOWN, LEFT = 0, 1, 2, 3
DIR_DELTA = np.array([(-1, 0), (0, 1), (1, 0), (0, -1)], dtype=np.int32)

# Relative action table for observer='snake' (actions 0=noop, 1=left,
# 2=right). Rows: current direction, cols: action. Actions 3/4 are not legal
# in the reference (KeyError at envs/snake_env.py:606); we map them to noop.
TURN_SNAKE = np.zeros((4, 5), dtype=np.int32)
for _d in range(4):
    TURN_SNAKE[_d, 0] = _d
    TURN_SNAKE[_d, 1] = (_d - 1) % 4
    TURN_SNAKE[_d, 2] = (_d + 1) % 4
    TURN_SNAKE[_d, 3] = _d
    TURN_SNAKE[_d, 4] = _d

# Absolute action table for observer='human' (actions 0=noop, 1=left,
# 2=right, 3=down, 4=up); only axis-switching moves are honoured
# (reference envs/snake_env.py:610-632).
TURN_HUMAN = np.zeros((4, 5), dtype=np.int32)
for _d in range(4):
    for _a in range(5):
        _nd = _d
        _dr, _dc = DIR_DELTA[_d]
        if _dr == 0:  # moving horizontally: may switch to vertical
            if _a == 3:
                _nd = DOWN
            elif _a == 4:
                _nd = UP
        elif _dc == 0:  # moving vertically: may switch to horizontal
            if _a == 1:
                _nd = LEFT
            elif _a == 2:
                _nd = RIGHT
        TURN_HUMAN[_d, _a] = _nd

# Default rewards (reference envs/snake_env.py:46-52).
DEFAULT_REWARDS = {
    'fruit': 10.0,
    'kill': 0.0,
    'lose': -0.5,
    'win': 0.0,
    'time': -0.001,
}
REWARD_KEYS = ('fruit', 'kill', 'lose', 'win', 'time')


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment configuration.

    Field names and defaults match the reference ``SnakeEnv.__init__``
    signature (envs/snake_env.py:58-94) so that reference configs port 1:1.
    The config is hashable so it can be closed over by jitted functions.
    """

    height: int = 20
    width: int = 20
    num_snakes: int = 4
    snake_length: int = 3
    vision_range: Optional[int] = None
    frame_stack: int = 1
    observer: str = 'snake'
    # (fruit, kill, lose, win, time) — stored as a tuple for hashability.
    rewards: Tuple[float, float, float, float, float] = (
        DEFAULT_REWARDS['fruit'], DEFAULT_REWARDS['kill'],
        DEFAULT_REWARDS['lose'], DEFAULT_REWARDS['win'],
        DEFAULT_REWARDS['time'],
    )
    num_fruits: int = -1  # -1 → round(0.8 * num_snakes), reference :87-88
    max_episode_steps: int = 10_000
    # 'all' = SnakeEnv (episode ends when all snakes are done);
    # 'any' = CoopSnakeEnv (episode ends when any snake dies, done broadcast;
    #         reference envs/coop_snake_env.py:14-22).
    done_mode: str = 'all'
    # Optional ASCII wall layout ('#' = wall); overrides height/width.
    # First-class version of the reference's dead map-asset feature
    # (core/grid_util.py:23-33, marlenv/assets/).
    map_layout: Optional[Tuple[str, ...]] = None
    # Host-precomputed disjoint spawn combinations available to reset
    # (core/spawn.spawn_pool). Shrinking the pool does NOT speed up the
    # per-reset row gather (measured flat 4096 vs 65536 rows at 4096
    # envs), so the default keeps maximal spawn diversity.
    spawn_pool_size: int = 1 << 16
    # Reset spawn scheme (replaces reference snake_env.py:576-589):
    #   'pool'       (default) — one precomputed host-enumerated pool row
    #                fetched per reset by a single gather; samples the
    #                reference's DFS candidate family (any path shape)
    #                and is the parity path.
    #   'procedural' (opt-in) — the combo is derived ARITHMETICALLY on
    #                device: snake i owns a private horizontal band of
    #                (height-2)//num_snakes interior rows and samples
    #                (row-in-band, column start, head side) from its own
    #                key schedule; disjointness holds by construction and
    #                the reset grid is painted closed-form per cell, so
    #                the latency-bound kCustom spawn-row gather leaves
    #                the program entirely (it was 2.7ms of the 21.1ms
    #                64-step headline trace). Straight segments only
    #                (see spawn_orientations) — a narrower distribution
    #                than the reference's path family, hence opt-in;
    #                mirrored exactly by the oracle (oracle.py reset,
    #                'jax' mode).
    spawn_mode: str = 'pool'
    # Procedural-spawn segment orientations:
    #   'horizontal' (default) — straight left/right segments only (the
    #                round-5 family; cheapest closed-form paint).
    #   'both'       — each snake also samples an orientation bit and
    #                may spawn VERTICALLY inside its band (only possible
    #                when the band is >= snake_length rows tall —
    #                otherwise degrades statically to horizontal).
    #                Widens the spawn distribution toward the
    #                reference's path family at ~3% headline cost (the
    #                generalized-segment paint needs ~2 extra (H, W)
    #                compare passes; measured 17.6M -> 17.1M).
    #                Mirrored bit-exactly by the oracle.
    spawn_orientations: str = 'horizontal'
    # Observation format:
    #   'uint8'  (default) — the reference's one-hot channel planes,
    #            (N, H, W, 8*frame_stack) uint8 (snake_env.py:474-519).
    #   'packed' (opt-in)  — the 8 one-hot channels of each frame pack
    #            into ONE byte (bit c = channel c), obs shape
    #            (N, H, W, frame_stack) uint8: 8x less HBM traffic for
    #            the same information. The 30x30x8 frame-stack-4 row is
    #            ROOFLINE-bound on its 944MB/step uint8 obs (round-4
    #            trace) — packing is the only lever that moves it.
    #            Unpack with ops.obs_pack.unpack_obs (bit-identical to
    #            the uint8 planes; equivalence-tested).
    obs_format: str = 'uint8'

    def __post_init__(self):
        if self.map_layout is not None:
            from marlsnake_tpu.core.maps import parse_layout
            mask = parse_layout(self.map_layout)
            object.__setattr__(self, 'map_layout',
                               tuple(self.map_layout))
            object.__setattr__(self, 'height', mask.shape[0])
            object.__setattr__(self, 'width', mask.shape[1])
        if self.observer not in ('snake', 'human'):
            raise ValueError(f'unknown observer {self.observer!r}')
        if self.done_mode not in ('all', 'any'):
            raise ValueError(f'unknown done_mode {self.done_mode!r}')
        if self.snake_length < 2:
            raise ValueError('snake_length must be >= 2')
        if self.spawn_mode not in ('pool', 'procedural'):
            raise ValueError(f'unknown spawn_mode {self.spawn_mode!r}')
        if self.spawn_orientations not in ('horizontal', 'both'):
            raise ValueError(
                f'unknown spawn_orientations {self.spawn_orientations!r}')
        if self.obs_format not in ('uint8', 'packed'):
            raise ValueError(f'unknown obs_format {self.obs_format!r}')
        if self.spawn_mode == 'procedural':
            if self.map_layout is not None:
                raise ValueError('procedural spawn supports plain '
                                 'bordered boards only (no map_layout)')
            if self.height - 2 < self.num_snakes:
                raise ValueError(
                    f'procedural spawn needs >= 1 interior row per '
                    f'snake: height={self.height} num_snakes='
                    f'{self.num_snakes}')
            if self.width - 2 < self.snake_length:
                raise ValueError(
                    f'procedural spawn needs snake_length <= width-2: '
                    f'snake_length={self.snake_length} '
                    f'width={self.width}')
        if len(self.rewards) != 5:
            raise ValueError('rewards must be a 5-tuple '
                             '(fruit, kill, lose, win, time)')

    @staticmethod
    def from_reward_dict(reward_dict=None, **kwargs) -> 'EnvConfig':
        """Build a config from a reference-style ``reward_dict``.

        Enforces the exact-key validation of the reference
        (envs/snake_env.py:76-80): the dict keys must equal
        ``{'fruit','kill','lose','win','time'}``.
        """
        if reward_dict is None:
            reward_dict = DEFAULT_REWARDS
        if set(reward_dict.keys()) != set(REWARD_KEYS):
            raise KeyError(
                f'reward dict keys must correspond to {REWARD_KEYS}')
        rewards = tuple(float(reward_dict[k]) for k in REWARD_KEYS)
        return EnvConfig(rewards=rewards, **kwargs)

    # --- derived properties ---
    @property
    def resolved_num_fruits(self) -> int:
        if self.num_fruits >= 0:
            return self.num_fruits
        return int(round(self.num_snakes * 0.8))

    @property
    def num_actions(self) -> int:
        return 5 if self.observer == 'human' else 3

    @property
    def obs_height(self) -> int:
        return (2 * self.vision_range + 1) if self.vision_range \
            else self.height

    @property
    def obs_width(self) -> int:
        return (2 * self.vision_range + 1) if self.vision_range \
            else self.width

    @property
    def frame_channels(self) -> int:
        """Trailing dim of ONE encoded frame (8, or 1 packed byte)."""
        return 1 if self.obs_format == 'packed' else FEATURE_CHANNEL

    @property
    def obs_channels(self) -> int:
        return self.frame_channels * self.frame_stack

    @property
    def obs_shape(self) -> Tuple[int, int, int, int]:
        """(num_snakes, H, W, C) — reference envs/snake_env.py:115-129."""
        return (self.num_snakes, self.obs_height, self.obs_width,
                self.obs_channels)

    @property
    def body_capacity(self) -> int:
        """Max body length; a snake can never exceed the interior area."""
        return (self.height - 2) * (self.width - 2)

    def reward(self, name: str) -> float:
        return self.rewards[REWARD_KEYS.index(name)]
