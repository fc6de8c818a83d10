"""Multi-config benchmark table (BASELINE.md bottom table, machine-readable).

Runs the bench rollout (same harness as bench.py: jitted lax.scan,
obs consumed via checksum, auto-reset) over the BASELINE.md config matrix
and writes ``artifacts/BENCH_TABLE.json`` — one entry per config with
steps/s and the reference comparison point where one exists.

Usage: python bench_table.py  (runs on the real TPU chip; ~5 min of
compiles on first run).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

from bench import build_rollout
from marlsnake_tpu.core.maps import load_layout
from marlsnake_tpu.core.types import EnvConfig

# (tag, num_envs, cfg, reference steps/s or None — BASELINE.md rows)
CONFIGS = [
    ('20x20x4_full_obs', 4096,
     EnvConfig(height=20, width=20, num_snakes=4, snake_length=3), 783.0),
    ('20x20x4_full_obs_procedural', 4096,
     EnvConfig(height=20, width=20, num_snakes=4, snake_length=3,
               spawn_mode='procedural'), 783.0),
    # orientation-diverse procedural family (vertical segments opt-in):
    # the generalized-segment paint costs ~2 extra (H, W) compare passes
    # — the row exists so the knob's price stays measured, not assumed
    ('20x20x4_full_obs_procedural_both', 4096,
     EnvConfig(height=20, width=20, num_snakes=4, snake_length=3,
               spawn_mode='procedural', spawn_orientations='both'),
     None),
    # headline config under the opt-in packed obs contract: the uint8
    # one-hot planes are the measured wall of the full-obs rows (the
    # checksum consumer's 52MB/step write+readback is 39% of the
    # procedural program's device time, round-5 trace) — this row prices
    # that contract: same engine, 1 byte/cell obs
    ('20x20x4_full_obs_procedural_packedobs', 4096,
     EnvConfig(height=20, width=20, num_snakes=4, snake_length=3,
               spawn_mode='procedural', obs_format='packed'), None),
    ('20x20x4_vision5', 4096,
     EnvConfig(height=20, width=20, num_snakes=4, snake_length=3,
               vision_range=5), 596.0),
    # vision5 with the opt-in arithmetic reset (round 5): the spawn-row
    # gather leaves the program — VERDICT r4's vision5 >= 9.8M ask lands
    # here (the place_fruits fragments themselves are shared with the
    # full-obs program; the vision-unique residual is the two window
    # passes + ~2.5ms of obs layout copies, trace tools/trace_bench.py)
    ('20x20x4_vision5_procedural', 4096,
     EnvConfig(height=20, width=20, num_snakes=4, snake_length=3,
               vision_range=5, spawn_mode='procedural'), None),
    ('20x20x4_vision5_framestack2', 4096,
     EnvConfig(height=20, width=20, num_snakes=4, snake_length=3,
               vision_range=5, frame_stack=2), None),
    ('20x20cross_x8_framestack4', 4096,
     EnvConfig(num_snakes=8, snake_length=3, frame_stack=4,
               map_layout=load_layout('20x20_cross')), None),
    # BASELINE.json configs[3]: 4096 envs, 30x30, 8 snakes, frame_stack=4,
    # walls enabled, full obs pipeline on-device
    ('30x30walls_x8_framestack4', 4096,
     EnvConfig(height=30, width=30, num_snakes=8, snake_length=3,
               frame_stack=4, map_layout=load_layout('30x30_pillars')),
     None),
    # Packed-obs variants of the HBM-roofline-bound frame-stacked rows:
    # obs_format='packed' collapses each frame's 8 one-hot channels into
    # one byte (8x less obs traffic, bit-identical after unpack — see
    # ops/obs_pack.py). The uint8 rows above keep the reference contract.
    ('20x20cross_x8_framestack4_packedobs', 4096,
     EnvConfig(num_snakes=8, snake_length=3, frame_stack=4,
               map_layout=load_layout('20x20_cross'),
               obs_format='packed'), None),
    ('30x30walls_x8_framestack4_packedobs', 4096,
     EnvConfig(height=30, width=30, num_snakes=8, snake_length=3,
               frame_stack=4, map_layout=load_layout('30x30_pillars'),
               obs_format='packed'), None),
    # Big-board scale row: the reference's largest shipped asset
    # (assets/40x40_ml2.txt; ~88k spawn candidates enumerate in ~8ms via
    # the native DFS, tests/test_spawn.py)
    ('40x40ml2_x4', 2048,
     EnvConfig(height=40, width=40, num_snakes=4, snake_length=3,
               map_layout=load_layout('40x40_ml2')), None),
    ('10x10x1', 8192,
     EnvConfig(height=10, width=10, num_snakes=1, snake_length=3), 616.0),
]

# GraphSnakeEnv rows: batched 5-ray distance features instead of grid obs
# (reference envs/graph_snake_env.py; fixed-shape rays in ops/rays.py).
# The frame_stack=2 row rides the same packed-grid byte-select over the
# raw-grid history carry (round 5) — previously it fell back to the
# 293k-steps/s fancy-indexing form.
GRAPH_CONFIGS = [
    ('20x20x4_graph', 4096,
     EnvConfig(height=20, width=20, num_snakes=4, snake_length=3)),
    ('20x20x4_graph_framestack2', 4096,
     EnvConfig(height=20, width=20, num_snakes=4, snake_length=3,
               frame_stack=2)),
]

# Launch-bound rows (tiny per-step device time) get LONGER scan blocks so
# host/tunnel dispatch amortizes: the 10x10 row had shown 30-44M
# cross-session spread at 256-step scans (VERDICT r3); 1024-step scans
# cut the per-dispatch overhead share 4x. Recorded per-row as
# 'scan_steps'.
LONG_SCAN = {'10x10x1': 1024}


def build_graph_rollout(cfg: EnvConfig, num_envs: int, num_steps: int):
    """bench.build_rollout shape, but over the GraphSnakeEnv vector fns
    (ray features consumed via the same checksum contract)."""
    import functools
    import jax.numpy as jnp
    from marlsnake_tpu.envs.vector import build_graph_vector_fns

    reset_fn, step_fn = build_graph_vector_fns(cfg, autoreset=True)

    @jax.jit
    def init(key):
        keys = jax.random.split(key, num_envs)
        states, _ = reset_fn(keys)
        return states

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rollout(states, key):
        def body(carry, _):
            states, key = carry
            key, k = jax.random.split(key)
            actions = jax.random.randint(
                k, (num_envs, cfg.num_snakes), 0, cfg.num_actions)
            states, out = step_fn(states, actions)
            return (states, key), (out.reward.sum(), out.obs.sum())

        (states, key), (rews, checks) = jax.lax.scan(
            body, (states, key), length=num_steps)
        return states, rews.sum() + checks.sum()

    return init, rollout


def measure(cfg: EnvConfig, num_envs: int, num_steps: int = 256,
            iters: int = 2, blocks: int = 4, graph: bool = False) -> dict:
    """Best/median/spread over ``blocks`` timed blocks of ``iters``
    rollouts each. Spread is (max-min)/median — tunnel noise is
    host-side, so best-of is the honest device throughput and the
    spread field makes the noise visible instead of trusted."""
    builder = build_graph_rollout if graph else build_rollout
    init, rollout = builder(cfg, num_envs, num_steps)
    states = init(jax.random.key(0))
    # two warmup calls + float() block ends: see bench.py — donation's
    # steady-state layouts compile on the SECOND call, and over the axon
    # tunnel only a value fetch is a trustworthy sync
    for w in range(2):
        states, r = rollout(states, jax.random.key(1 + 1_000_000 * w))
        float(r)
    per_block = []
    key = 2
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(iters):
            states, r = rollout(states, jax.random.key(key))
            key += 1
        float(r)
        per_block.append(
            num_envs * num_steps * iters / (time.perf_counter() - t0))
    per_block.sort()
    med = per_block[len(per_block) // 2]
    return {
        'steps_per_sec': round(per_block[-1], 1),
        'median_steps_per_sec': round(med, 1),
        'spread_pct': round(
            100 * (per_block[-1] - per_block[0]) / med, 1),
        'scan_steps': num_steps,
    }


def measure_acting(cfg: EnvConfig, num_envs: int, num_steps: int = 64,
                   iters: int = 3, optimized: bool = False) -> float:
    """Policy-in-the-loop rollout: greedy DQN actions for every agent
    (one batched (E*N) forward per step), env step, auto-reset — the
    actor loop of training/eval as ONE jitted scan. The policy consumes
    the observations, so no separate checksum is needed. The reference's
    analog is a per-agent batch-1 torch forward on host obs
    (train_dqn.py:163-173), unmeasurably slower.

    ``optimized=True`` applies the acting-path winners (rounds 3-4,
    tools/exp_acting.py matrix, trace-attributed in NEXT_STEPS.md):
    bf16 convs/matmuls, skip the conditional-/255 whole-obs max reduce
    (binary obs — bit-identical), zero-pad obs channels 8->16 before
    conv1 (exact math; fills the MXU contraction), and re-encode the
    observation from the carried grid at policy ingress instead of
    carrying the 52MB obs through the scan (bit-identical for full-obs
    frame_stack=1; the pad then fuses into the encode and the env's
    internal encode is DCE'd — 264k -> 319k env-steps/s). The f32 row
    keeps the reference's exact inference numerics and obs flow."""
    import functools
    import jax.numpy as jnp
    from marlsnake_tpu.core import engine
    from marlsnake_tpu.envs.vector import build_vector_fns
    from marlsnake_tpu.models.dqn import DQN

    reset_fn, step_fn = build_vector_fns(cfg, autoreset=True)
    if optimized:
        net = DQN(num_actions=cfg.num_actions,
                  compute_dtype=jnp.bfloat16, assume_binary_obs=True)
        pad = 8
    else:
        net = DQN(num_actions=cfg.num_actions)
        pad = 0
    e, n = num_envs, cfg.num_snakes

    def prep(obs):
        flat = obs.reshape((e * n,) + obs.shape[2:])
        if pad:
            flat = jnp.pad(flat, [(0, 0)] * (flat.ndim - 1) + [(0, pad)])
        return flat

    def obs_of(states):
        frame = jax.vmap(lambda g: engine.encode_frame(cfg, g))(
            states.grid)
        return prep(frame)

    @jax.jit
    def init(key):
        keys = jax.random.split(key, e)
        states, obs = reset_fn(keys)
        params = net.init(jax.random.key(7), prep(obs)[:1])
        return states, obs, params

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def rollout(states, obs, params):
        if optimized:
            # obs never enters the carry: re-encoded from states.grid
            # at policy ingress; the env's internal encode is DCE'd
            def body(states, _):
                q = net.apply(params, obs_of(states))
                actions = q.argmax(-1).astype(jnp.int32).reshape(e, n)
                states, out = step_fn(states, actions)
                return states, out.reward.sum()

            states, rews = jax.lax.scan(body, states, length=num_steps)
            return states, obs, rews.sum()

        def body(carry, _):
            states, obs = carry
            q = net.apply(params, prep(obs))
            actions = q.argmax(-1).astype(jnp.int32).reshape(e, n)
            states, out = step_fn(states, actions)
            return (states, out.obs), out.reward.sum()

        (states, obs), rews = jax.lax.scan(body, (states, obs),
                                           length=num_steps)
        return states, obs, rews.sum()

    states, obs, params = init(jax.random.key(0))
    states, obs, r = rollout(states, obs, params)
    r.block_until_ready()
    per_block = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            states, obs, r = rollout(states, obs, params)
            # block EVERY call: one ~2ms tunnel RTT per 0.8s rollout —
            # twice this session an async chain returned a garbage
            # (~1e9 steps/s) timing over the tunnel; per-call blocking
            # removes the race at negligible cost
            r.block_until_ready()
        per_block.append(
            e * num_steps * iters / (time.perf_counter() - t0))
    per_block.sort()
    med = per_block[len(per_block) // 2]
    return {
        'steps_per_sec': round(per_block[-1], 1),
        'median_steps_per_sec': round(med, 1),
        'spread_pct': round(
            100 * (per_block[-1] - per_block[0]) / med, 1),
        'scan_steps': num_steps,
    }


def main():
    rows = []
    for tag, num_envs, cfg, ref in CONFIGS:
        m = measure(cfg, num_envs,
                    num_steps=LONG_SCAN.get(tag, 256))
        row = {
            'config': tag,
            'num_envs': num_envs,
            **m,
            'reference_steps_per_sec': ref,
            'vs_reference': (round(m['steps_per_sec'] / ref, 1)
                             if ref else None),
        }
        rows.append(row)
        print(json.dumps(row))
    for gtag, genvs, gcfg in GRAPH_CONFIGS:
        m = measure(gcfg, genvs, graph=True)
        row = {'config': gtag, 'num_envs': genvs, **m,
               'reference_steps_per_sec': None, 'vs_reference': None}
        rows.append(row)
        print(json.dumps(row))
    # policy-in-the-loop: greedy DQN forward for all 4096*4 agents
    # fused into the same jitted rollout (the actor loop of eval/training)
    acting_cfg = EnvConfig(height=20, width=20, num_snakes=4,
                           snake_length=3)
    for tag, opt in (('20x20x4_dqn_policy_in_loop', False),
                     ('20x20x4_dqn_policy_in_loop_opt', True)):
        m = measure_acting(acting_cfg, 4096, optimized=opt)
        row = {'config': tag, 'num_envs': 4096, **m,
               'reference_steps_per_sec': None, 'vs_reference': None}
        rows.append(row)
        print(json.dumps(row))
    os.makedirs('artifacts', exist_ok=True)
    with open('artifacts/BENCH_TABLE.json', 'w') as f:
        json.dump({'unit': 'env-steps/s/chip', 'rows': rows}, f, indent=1)
    print('wrote artifacts/BENCH_TABLE.json')


if __name__ == '__main__':
    main()
