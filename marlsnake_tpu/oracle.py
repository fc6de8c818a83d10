"""Host-side numpy oracle of the MARL-Snake semantics.

An independent, deliberately reference-shaped (mutable, sequential,
per-snake-loop) implementation of the parity contract in SURVEY.md §2.4.
It exists to cross-validate the vectorized TPU engine
(``marlsnake_tpu.core.engine``): the two implementations share no step
logic, so any semantic disagreement surfaces as a trajectory mismatch.

Two RNG modes:

* ``'jax'`` — mirrors the engine's exact ``jax.random`` key schedule (host
  CPU keys are platform-independent), so oracle and engine trajectories are
  bit-identical given the same key.
* ``'ref'`` — consumes the global ``np.random`` stream in exactly the order
  the reference implementation does (permutation over the DFS candidate
  list at reset — snake_env.py:576-589 — and ``randint`` draws for fruits
  — grid_util.py:126-133), so the oracle can be validated bit-exactly
  against the actual reference env run under the same seed.
"""

from __future__ import annotations

from collections import deque
from typing import List, Optional

import numpy as np

from marlsnake_tpu.core import types as T
from marlsnake_tpu.core.spawn import spawn_candidates

DIR_DELTA = T.DIR_DELTA


class _Snake:
    def __init__(self, idx: int, coords: np.ndarray):
        self.idx = idx
        self.head = (int(coords[0][0]), int(coords[0][1]))
        self.tail = (int(coords[-1][0]), int(coords[-1][1]))
        dirs = []
        for a, b in zip(coords[:-1], coords[1:]):
            delta = (int(a[0] - b[0]), int(a[1] - b[1]))
            dirs.append(_delta_index(delta))
        self.directions = deque(dirs)  # newest (head link) first
        self.direction = dirs[0]
        self.alive = True
        self.reset_flags()

    def reset_flags(self):
        self.fruit = False
        self.death = False
        self.kills = 0
        self.win = False

    @property
    def coords(self) -> List[tuple]:
        out = [self.head]
        cur = self.head
        for d in self.directions:
            dr, dc = DIR_DELTA[d]
            cur = (cur[0] - int(dr), cur[1] - int(dc))
            out.append(cur)
        return out

    def move(self) -> Optional[tuple]:
        dr, dc = DIR_DELTA[self.direction]
        self.head = (self.head[0] + int(dr), self.head[1] + int(dc))
        self.directions.appendleft(self.direction)
        prev_tail = None
        if not self.fruit:
            prev_tail = self.tail
            td = self.directions.pop()
            tdr, tdc = DIR_DELTA[td]
            self.tail = (self.tail[0] + int(tdr), self.tail[1] + int(tdc))
        self.reset_flags()
        return prev_tail


def _delta_index(delta) -> int:
    for i, d in enumerate(DIR_DELTA):
        if tuple(d) == tuple(delta):
            return i
    raise ValueError(f'not a unit delta: {delta}')


class OracleEnv:
    """Single-env numpy oracle with the reference's exact semantics."""

    def __init__(self, cfg: T.EnvConfig, rng_mode: str = 'jax'):
        assert rng_mode in ('jax', 'ref')
        self.cfg = cfg
        self.rng_mode = rng_mode
        # procedural spawns are derived arithmetically — no DFS needed
        self.candidates = (
            None if (rng_mode == 'jax' and cfg.spawn_mode == 'procedural')
            else spawn_candidates(cfg.height, cfg.width,
                                  cfg.snake_length, cfg.map_layout))
        self.snakes: List[_Snake] = []
        self.grid: np.ndarray = None
        self._key = None  # jax mode per-step key

    # --- RNG plumbing -----------------------------------------------------
    def _jax_uniform(self, key, shape):
        import jax
        return np.asarray(jax.random.uniform(key, shape))

    # --- reset ------------------------------------------------------------
    def reset(self, key=None, seed: Optional[int] = None) -> np.ndarray:
        cfg = self.cfg
        h, w, n, k = cfg.height, cfg.width, cfg.num_snakes, cfg.snake_length
        grid = np.full((h, w), T.EMPTY, dtype=np.int64)
        grid[[0, -1]] = T.WALL
        grid[:, [0, -1]] = T.WALL
        if cfg.map_layout is not None:
            from marlsnake_tpu.core.maps import parse_layout
            grid[parse_layout(cfg.map_layout)] = T.WALL

        if self.rng_mode == 'jax' and cfg.spawn_mode == 'procedural':
            import jax
            assert key is not None
            k_spawn = jax.random.fold_in(key, 0)
            k_fruit = jax.random.fold_in(key, 1)
            self._key = jax.random.fold_in(key, 2)
            # mirror engine._procedural_spawn bit-exactly: same uniforms,
            # same float32 floor-scale + min-clamp arithmetic
            b = (h - 2) // n
            s = w - 1 - k
            allow_vertical = (cfg.spawn_orientations == 'both'
                              and b >= k)
            u = np.asarray(jax.random.uniform(k_spawn, (n, 4)),
                           dtype=np.float32)
            chosen = []
            for i in range(n):
                band0 = 1 + i * b
                side = bool(u[i, 2] < 0.5)  # head at the LEFT/TOP end
                if allow_vertical and bool(u[i, 3] < 0.5):
                    sv = b - k + 1
                    r0 = band0 + min(int(u[i, 0] * np.float32(sv)),
                                     sv - 1)
                    cv = 1 + min(int(u[i, 1] * np.float32(w - 2)), w - 3)
                    rws = (range(r0, r0 + k) if side
                           else range(r0 + k - 1, r0 - 1, -1))
                    chosen.append([(r, cv) for r in rws])  # head-first
                else:
                    dr = min(int(u[i, 0] * np.float32(b)), b - 1)
                    c0 = 1 + min(int(u[i, 1] * np.float32(s)), s - 1)
                    row = band0 + dr
                    cols = (range(c0, c0 + k) if side
                            else range(c0 + k - 1, c0 - 1, -1))
                    chosen.append([(row, c) for c in cols])  # head-first
            assert self._disjoint(chosen)
        elif self.rng_mode == 'jax':
            import jax
            from marlsnake_tpu.core.spawn import spawn_pool
            assert key is not None
            k_spawn = jax.random.fold_in(key, 0)
            k_fruit = jax.random.fold_in(key, 1)
            self._key = jax.random.fold_in(key, 2)
            pool = spawn_pool(cfg.height, cfg.width, cfg.snake_length,
                              n, pool_size=cfg.spawn_pool_size,
                              map_layout=cfg.map_layout)
            u = float(self._jax_uniform(k_spawn, ()))
            row = min(int(np.float32(u) * len(pool)), len(pool) - 1)
            chosen = [self.candidates[j] for j in pool[row]]
            assert self._disjoint(chosen)
        else:
            if seed is not None:
                np.random.seed(seed)
            while True:
                perm = np.random.permutation(len(self.candidates))[:n]
                chosen = [self.candidates[j] for j in perm]
                if self._disjoint(chosen):
                    break

        self.snakes = [_Snake(i, c) for i, c in enumerate(chosen)]
        for s in self.snakes:
            sid = T.pack_cell(0, s.idx)
            for coord in s.coords:
                grid[coord] = T.BODY + sid
            grid[s.head] = T.HEAD + sid
            grid[s.tail] = T.TAIL + sid
        self.grid = grid

        nf = cfg.resolved_num_fruits
        if nf > 0:
            if self.rng_mode == 'jax':
                u = self._jax_uniform(k_fruit, (nf,))
                self._place_fruits_from_uniform(u, nf)
            else:
                self._place_fruits_ref(nf)

        self.alive_count = n
        self.epi_scores = np.zeros(n)
        self.epi_steps = np.zeros(n)
        self.epi_fruits = np.zeros(n)
        self.epi_kills = np.zeros(n)
        self.episode_length = 0

        frame = self._encode()
        self.obs_frames = deque([frame] * cfg.frame_stack,
                                maxlen=cfg.frame_stack)
        return self._stacked_obs()

    @staticmethod
    def _disjoint(chosen) -> bool:
        flat = [tuple(c) for path in chosen for c in path]
        return len(set(flat)) == len(flat)

    # --- fruit placement --------------------------------------------------
    def _place_fruits_from_uniform(self, u: np.ndarray, count: int):
        """jax-mode placement: identical math to engine.place_fruits."""
        flat = self.grid.reshape(-1)
        empties = np.flatnonzero(flat == T.EMPTY)
        if len(empties) == 0:
            return
        for j in range(count):
            r = min(int(np.floor(u[j] * len(empties))), len(empties) - 1)
            flat[empties[r]] = T.FRUIT

    def _place_fruits_ref(self, count: int):
        """ref-mode placement: same np.random calls as grid_util.py:126-133."""
        xs, ys = np.where(self.grid == 0)
        if len(xs) == 0:
            return
        idxes = np.random.randint(0, len(xs), size=count)
        self.grid[xs[idxes], ys[idxes]] = T.FRUIT

    # --- step -------------------------------------------------------------
    def step(self, actions):
        cfg = self.cfg
        n = cfg.num_snakes
        grid = self.grid
        rew_d = dict(zip(T.REWARD_KEYS, cfg.rewards))

        # Phase 1: directions + proposed heads (snake_env.py:318-330)
        table = (T.TURN_HUMAN if cfg.observer == 'human' else T.TURN_SNAKE)
        next_heads = {}
        for s, a in zip(self.snakes, actions):
            if not s.alive:
                continue
            s.direction = int(table[s.direction, int(a)])
            dr, dc = DIR_DELTA[s.direction]
            coord = (s.head[0] + int(dr), s.head[1] + int(dc))
            next_heads.setdefault(coord, []).append(s.idx)

        # Phase 2: collision (snake_env.py:521-544)
        dead, eaters = set(), []
        fruit_taken = 0
        for coord, idxes in next_heads.items():
            cell = int(grid[coord])
            ctype = T.cell_type(cell)
            if len(idxes) > 1 or ctype in (T.WALL, T.BODY, T.HEAD):
                dead.update(idxes)
                if ctype == T.FRUIT:
                    fruit_taken += 1
                if ctype in (T.BODY, T.HEAD):
                    self.snakes[T.cell_owner(cell)].kills += 1
            elif ctype == T.FRUIT:
                eaters.extend(idxes)
                fruit_taken += 1

        self.alive_count -= len(dead)
        for i in dead:
            self.snakes[i].death = True
            self.snakes[i].alive = False
        # Phase 3: tail chase (snake_env.py:338-346) — incl. the reference's
        # double-decrement of alive_count for chasers that already died.
        for i in eaters:
            tail = self.snakes[i].tail
            if tail in next_heads:
                for j in next_heads[tail]:
                    self.snakes[j].death = True
                    self.snakes[j].alive = False
                    self.alive_count -= 1
                    self.snakes[i].kills += 1
            self.snakes[i].fruit = True
        # Phase 4: win
        if self.alive_count == 1 and n > 1:
            for s in self.snakes:
                if s.alive:
                    s.win = True
                    break

        # Phase 5+6: rewards + sequential grid update (snake_env.py:354-374)
        rews, dones, fruits, kills = [], [], [], []
        for s in self.snakes:
            if not s.death and not s.alive:
                rews.append(0.0)
                fruits.append(0.0)
                kills.append(0.0)
            else:
                r = rew_d['time'] * float(s.alive)
                r += rew_d['fruit'] * float(s.fruit)
                r += rew_d['lose'] * float(s.death)
                r += rew_d['kill'] * float(s.kills)
                r += rew_d['win'] * float(s.win)
                rews.append(r)
                fruits.append(float(s.fruit))
                kills.append(float(s.kills))
                self._update_grid(s)
            dones.append(not s.alive)

        # Phase 7: fruit respawn
        if self.rng_mode == 'jax':
            import jax
            self._key, k_fruit = jax.random.split(self._key)
            u = self._jax_uniform(k_fruit, (n,))
            if fruit_taken:
                self._place_fruits_from_uniform(u, fruit_taken)
        else:
            if fruit_taken:
                self._place_fruits_ref(fruit_taken)

        # Phase 8: obs
        self.obs_frames.append(self._encode())
        obs = self._stacked_obs()

        # Phase 9: stats / timeout / rank (snake_env.py:385-410)
        mask = 1.0 - np.asarray(dones, dtype=float)
        self.epi_scores = self.epi_scores + mask * np.asarray(rews)
        self.epi_steps = self.epi_steps + mask
        self.epi_fruits = self.epi_fruits + mask * np.asarray(fruits)
        self.epi_kills = self.epi_kills + mask * np.asarray(kills)

        info = {}
        self.episode_length += 1
        if self.episode_length >= cfg.max_episode_steps:
            dones = [True] * n

        done_ep = (any(dones) if cfg.done_mode == 'any' else all(dones))
        if done_ep:
            rank = 1 + (self.epi_scores[None, :]
                        > self.epi_scores[:, None]).sum(1)
            info['rank'] = list(rank)
            info['episode_scores'] = self.epi_scores.copy()
            info['episode_steps'] = self.epi_steps.copy()
            info['episode_fruits'] = self.epi_fruits.copy()
            info['episode_kills'] = self.epi_kills.copy()
            self.epi_scores = np.zeros(n)
            self.epi_steps = np.zeros(n)
            self.epi_fruits = np.zeros(n)
            self.epi_kills = np.zeros(n)
        if cfg.done_mode == 'any' and done_ep:
            dones = [True] * n

        return obs, rews, dones, info

    def _update_grid(self, s: _Snake):
        """Sequential per-snake grid update (snake_env.py:546-566)."""
        grid = self.grid
        if s.alive:
            sid = T.pack_cell(0, s.idx)
            grid[s.head] = T.BODY + sid
            prev_tail = s.move()
            if prev_tail is not None:
                if grid[prev_tail] == T.TAIL + sid:
                    grid[prev_tail] = T.EMPTY
            grid[s.head] = T.HEAD + sid
            grid[s.tail] = T.TAIL + sid
        else:
            coords = s.coords
            if T.cell_owner(grid[coords[-1]]) != s.idx:
                coords = coords[:-1]
            for c in coords:
                grid[c] = T.EMPTY
            s.move()

    # --- observation ------------------------------------------------------
    def _encode(self) -> np.ndarray:
        """(N, Ho, Wo, 8) uint8 frame, same channel layout as the engine."""
        cfg = self.cfg
        n = cfg.num_snakes
        grid = self.grid
        t = T.cell_type(grid)
        o = T.cell_owner(grid)
        frames = np.zeros((n, *grid.shape, T.FEATURE_CHANNEL),
                          dtype=np.uint8)
        for i in range(n):
            mine = (o == i)
            frames[i, ..., T.CH_WALL] = (t == T.WALL)
            frames[i, ..., T.CH_FRUIT] = (t == T.FRUIT)
            frames[i, ..., T.CH_OTHER_HEAD] = (t == T.HEAD) & ~mine
            frames[i, ..., T.CH_OTHER_BODY] = (t == T.BODY) & ~mine
            frames[i, ..., T.CH_OTHER_TAIL] = (t == T.TAIL) & ~mine
            frames[i, ..., T.CH_MY_HEAD] = (t == T.HEAD) & mine
            frames[i, ..., T.CH_MY_BODY] = (t == T.BODY) & mine
            frames[i, ..., T.CH_MY_TAIL] = (t == T.TAIL) & mine
        if cfg.vision_range:
            v = cfg.vision_range
            out = np.zeros((n, 2 * v + 1, 2 * v + 1, T.FEATURE_CHANNEL),
                           dtype=np.uint8)
            for i in range(n):
                # argmax of the my-head channel — (0, 0) when dead
                # (snake_env.py:497-517 quirk)
                hp = np.unravel_index(frames[i, ..., T.CH_MY_HEAD].argmax(),
                                      grid.shape)
                padded = np.pad(frames[i],
                                ((v, v), (v, v), (0, 0)))
                out[i] = padded[hp[0]:hp[0] + 2 * v + 1,
                                hp[1]:hp[1] + 2 * v + 1]
            frames = out
        return frames

    def _stacked_obs(self) -> np.ndarray:
        return np.concatenate(list(self.obs_frames), axis=-1)
