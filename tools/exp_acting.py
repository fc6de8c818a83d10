"""Acting-path (policy-in-the-loop) variant matrix on the real TPU.

The policy-in-the-loop rollout (greedy DQN actions for all E*N agents,
one batched forward per env step — bench_table.measure_acting) runs at
~134k env-steps/s at 4096 envs vs 10.4M bare-engine: the 16,384-agent
forward is ~98.7%% of the step. This tool measures forward variants under
the SAME one-jitted-scan harness (CLAUDE.md: never trust per-call timeit
over the tunnel) so wins can be attributed and wired into
bench_table/dqn_trainer.

Variants:
  f32          today's row (DQN compute_dtype=f32, conditional /255)
  f32_nonorm   f32, assume_binary_obs (skip the whole-obs max reduce)
  bf16         bf16 convs/matmuls on the MXU (f32 params, casts at use)
  bf16_nonorm  bf16 + assume_binary_obs
  bf16_pad16   bf16_nonorm with obs zero-padded 8->16 channels before
               conv1 (identical math — extra kernel columns see zeros;
               probes whether the 3*3*8=72-deep contraction is starving
               the 128-lane MXU)

NOTE (round 5): the engine's encode rewrite (shared byte + bit unpack)
lifted the wired-in optimized acting row 327k -> 377k env-steps/s — the
round-3 "~99% of the bf16 roofline" framing overestimated the conv share
(the encode inside the acting step was bigger than the trace attribution
suggested). The variant rows below are the recorded round-3 matrix.

Usage: python tools/exp_acting.py [--envs 4096] [--steps 64] [--iters 3]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from marlsnake_tpu.core.types import EnvConfig
from marlsnake_tpu.envs.vector import build_vector_fns
from marlsnake_tpu.models.dqn import DQN


def measure(cfg, num_envs, num_steps, iters, net, pad_channels=0,
            encode_pad=0):
    """``pad_channels`` zero-pads obs channels in the acting prep (a
    separate 104MB copy op — the pad reads the scan carry so XLA cannot
    fuse it into the encode). ``encode_pad`` instead pads INSIDE
    ``engine.encode_frame`` so the zero lanes ride the encode's own
    output write."""
    from marlsnake_tpu.core import engine
    orig_encode = engine.encode_frame
    if encode_pad:
        def encode_wide(cfg_, grid):
            f = orig_encode(cfg_, grid)
            z = jnp.zeros(f.shape[:-1] + (encode_pad,), f.dtype)
            return jnp.concatenate([f, z], axis=-1)
        engine.encode_frame = encode_wide
    try:
        return _measure_inner(cfg, num_envs, num_steps, iters, net,
                              pad_channels)
    finally:
        engine.encode_frame = orig_encode


def _measure_inner(cfg, num_envs, num_steps, iters, net, pad_channels=0):
    reset_fn, step_fn = build_vector_fns(cfg, autoreset=True)
    e, n = num_envs, cfg.num_snakes

    def prep(obs):
        flat = obs.reshape((e * n,) + obs.shape[2:])
        if pad_channels:
            pad = [(0, 0)] * (flat.ndim - 1) + [(0, pad_channels)]
            flat = jnp.pad(flat, pad)
        return flat

    @jax.jit
    def init(key):
        keys = jax.random.split(key, e)
        states, obs = reset_fn(keys)
        params = net.init(jax.random.key(7), prep(obs)[:1])
        return states, obs, params

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def rollout(states, obs, params):
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
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        states, obs, r = rollout(states, obs, params)
        r.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    return (e * num_steps / best,
            sorted(times)[len(times) // 2] and e * num_steps
            / sorted(times)[len(times) // 2])


def measure_planes(cfg, num_envs, num_steps, iters, dtype=jnp.bfloat16,
                   delta_pad=0):
    """Shared/delta conv1 decomposition: conv1 is LINEAR in the one-hot
    obs channels, and per-agent obs differ only in the mine/other split,
    so conv1(obs_i) = conv(S, W[:, :, :5]) + conv(D_i, W[:, :, 5:] -
    W[:, :, 2:5]) exactly (channel order types.py:62-69) with
    S = per-ENV planes [wall, fruit, all_heads, all_bodies, all_tails]
    and D_i = per-agent [head_i, body_i, tail_i]. The (E, N, H, W, 8)
    one-hot obs is never materialized: 17 plane writes per env replace
    32, and the shared conv runs once per ENV, not per agent. The planes
    come straight off the carried grid, so the policy still consumes the
    full observation information each step."""
    import numpy as np
    from marlsnake_tpu.core import engine
    from marlsnake_tpu.core import types as T

    orig_encode = engine.encode_frame
    # the env's own obs encode is bypassed — the policy reads planes off
    # states.grid; keep a tiny dummy so step/autoreset shapes stay valid
    engine.encode_frame = lambda c, g: jnp.zeros(
        (c.num_snakes, 1, 1, 1), jnp.uint8)
    try:
        reset_fn, step_fn = build_vector_fns(cfg, autoreset=True)
    finally:
        engine.encode_frame = orig_encode
    e, n = num_envs, cfg.num_snakes
    h, w = cfg.height, cfg.width
    net = DQN(num_actions=cfg.num_actions)

    def planes(grid):
        t = T.cell_type(grid)
        o = T.cell_owner(grid)
        S = jnp.stack([t == T.WALL, t == T.FRUIT, t == T.HEAD,
                       t == T.BODY, t == T.TAIL], -1)        # (E, H, W, 5)
        mine = o[:, None] == jnp.arange(n).reshape(n, 1, 1)  # (E, N, H, W)
        D = jnp.stack([(t[:, None] == c) & mine
                       for c in (T.HEAD, T.BODY, T.TAIL)], -1)
        return S.astype(jnp.uint8), D.astype(jnp.uint8)

    dn = ('NHWC', 'HWIO', 'NHWC')

    def conv(x, k, b=None):
        y = jax.lax.conv_general_dilated(x, k, (1, 1), 'SAME',
                                         dimension_numbers=dn)
        return y if b is None else y + b

    def apply_planes(params, S, D):
        p = params['params']
        cast = lambda a: a.astype(dtype)
        W1 = p['conv1']['kernel'].astype(jnp.float32)  # (3, 3, 8, 32)
        Wsh = cast(W1[:, :, :5])
        Wdl = W1[:, :, 5:] - W1[:, :, 2:5]
        if delta_pad:
            Wdl = jnp.pad(Wdl, ((0, 0), (0, 0), (0, delta_pad), (0, 0)))
        Wdl = cast(Wdl)
        shared = conv(cast(S), Wsh, cast(p['conv1']['bias']))
        Df = D.reshape(e * n, h, w, 3)
        if delta_pad:
            Df = jnp.pad(Df, ((0, 0), (0, 0), (0, 0), (0, delta_pad)))
        delta = conv(cast(Df), Wdl)
        x = jax.nn.relu(
            (shared[:, None] + delta.reshape(e, n, h, w, -1)
             ).reshape(e * n, h, w, -1))
        for name in ('conv2', 'conv3'):
            x = jax.nn.relu(conv(x, cast(p[name]['kernel']),
                                 cast(p[name]['bias'])))
        x = x.reshape(x.shape[0], -1)
        for name, act in (('fc1', True), ('fc2', True), ('fc3', False)):
            x = x @ cast(p[name]['kernel']) + cast(p[name]['bias'])
            if act:
                x = jax.nn.relu(x)
        return x.astype(jnp.float32)

    @jax.jit
    def init(key):
        keys = jax.random.split(key, e)
        states, obs = reset_fn(keys)
        params = net.init(jax.random.key(7),
                          jnp.zeros((1, h, w, 8), jnp.uint8))
        return states, params

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rollout(states, params):
        def body(states, _):
            S, D = planes(states.grid)
            q = apply_planes(params, S, D)
            actions = q.argmax(-1).astype(jnp.int32).reshape(e, n)
            states, out = step_fn(states, actions)
            return states, out.reward.sum()

        states, rews = jax.lax.scan(body, states, length=num_steps)
        return states, rews.sum()

    states, params = init(jax.random.key(0))
    states, r = rollout(states, params)
    r.block_until_ready()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        states, r = rollout(states, params)
        r.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    med = sorted(times)[len(times) // 2]
    return e * num_steps / best, e * num_steps / med


def measure_carrypad(cfg, num_envs, num_steps, iters,
                     dtype=jnp.bfloat16, pad=8):
    """Carry the PADDED obs through the scan instead of padding the
    carried obs: the pad then reads out.obs fresh from the step's own
    fusions (same scan iteration), so XLA can ride the zero lanes on
    the encode's output write instead of a separate 104MB carry-read
    copy. Unlike padding inside encode_frame (bf16_obs16, which LOST),
    the step/autoreset internals stay 8-channel."""
    reset_fn, step_fn = build_vector_fns(cfg, autoreset=True)
    e, n = num_envs, cfg.num_snakes
    net = DQN(num_actions=cfg.num_actions, compute_dtype=dtype,
              assume_binary_obs=True)

    def padded(obs):
        flat = obs.reshape((e * n,) + obs.shape[2:])
        return jnp.pad(flat, [(0, 0)] * (flat.ndim - 1) + [(0, pad)])

    @jax.jit
    def init(key):
        keys = jax.random.split(key, e)
        states, obs = reset_fn(keys)
        pobs = padded(obs)
        params = net.init(jax.random.key(7), pobs[:1])
        return states, pobs, params

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def rollout(states, pobs, params):
        def body(carry, _):
            states, pobs = carry
            q = net.apply(params, pobs)
            actions = q.argmax(-1).astype(jnp.int32).reshape(e, n)
            states, out = step_fn(states, actions)
            return (states, padded(out.obs)), out.reward.sum()

        (states, pobs), rews = jax.lax.scan(body, (states, pobs),
                                            length=num_steps)
        return states, pobs, rews.sum()

    states, pobs, params = init(jax.random.key(0))
    states, pobs, r = rollout(states, pobs, params)
    r.block_until_ready()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        states, pobs, r = rollout(states, pobs, params)
        r.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    med = sorted(times)[len(times) // 2]
    return e * num_steps / best, e * num_steps / med


def measure_int8(cfg, num_envs, num_steps, iters, pad=8):
    """Opt-in QUANTIZED acting: int8 weights (per-output-channel
    symmetric) and int8 activations (per-layer static scales from a
    one-batch f32 calibration) through conv1-3 + fc1; fc2/fc3 run f32.
    The v5e MXU runs s8xs8->s32 at 2x the bf16 rate, and the binary obs
    quantize EXACTLY (scale 1). Approximate inference (argmax agreement
    vs f32 printed); the acting-loop analog of production int8 serving."""
    reset_fn, step_fn = build_vector_fns(cfg, autoreset=True)
    e, n = num_envs, cfg.num_snakes
    net = DQN(num_actions=cfg.num_actions, assume_binary_obs=True)

    def prep(obs):
        flat = obs.reshape((e * n,) + obs.shape[2:])
        if pad:
            flat = jnp.pad(flat, [(0, 0)] * (flat.ndim - 1) + [(0, pad)])
        return flat

    @jax.jit
    def init(key):
        keys = jax.random.split(key, e)
        states, obs = reset_fn(keys)
        params = net.init(jax.random.key(7), prep(obs)[:1])
        return states, obs, params

    states, obs, params = init(jax.random.key(0))

    # ---- calibration: f32 layer activations on the reset batch ----
    p = jax.tree.map(lambda a: a, params['params'])
    dn = ('NHWC', 'HWIO', 'NHWC')

    def convf(x, k, b):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), 'SAME', dimension_numbers=dn) + b

    @jax.jit
    def calib(obs):
        x = prep(obs).astype(jnp.float32)
        maxes = []
        for name in ('conv1', 'conv2', 'conv3'):
            # net was initialized on PADDED obs, so conv1's kernel is
            # already (3, 3, 8 + pad, 32)
            x = jax.nn.relu(convf(x, p[name]['kernel'], p[name]['bias']))
            maxes.append(x.max())
        x = x.reshape(x.shape[0], -1)
        x = jax.nn.relu(x @ p['fc1']['kernel'] + p['fc1']['bias'])
        maxes.append(x.max())
        return maxes

    act_scale = [float(m) / 127.0 for m in jax.device_get(calib(obs))]

    # ---- static int8 weights/multipliers ----
    qw = {}
    in_scale = 1.0  # binary obs quantize exactly
    for i, name in enumerate(('conv1', 'conv2', 'conv3', 'fc1')):
        W = p[name]['kernel']
        axes = tuple(range(W.ndim - 1))
        s = jnp.maximum(jnp.abs(W).max(axis=axes), 1e-8) / 127.0
        out_s = act_scale[i]
        qw[name] = (
            jnp.round(W / s).astype(jnp.int8),
            (s * in_scale / out_s).astype(jnp.float32),      # requant mult
            (p[name]['bias'] / out_s).astype(jnp.float32),   # bias in out units
        )
        in_scale = out_s
    fc1_out_scale = act_scale[3]

    def convq(x8, k8):
        return jax.lax.conv_general_dilated(
            x8, k8, (1, 1), 'SAME', dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    def apply_int8(obs):
        x = prep(obs).astype(jnp.int8)
        for name in ('conv1', 'conv2', 'conv3'):
            k8, m, b = qw[name]
            y = convq(x, k8).astype(jnp.float32) * m + b
            x = jnp.clip(jnp.round(jax.nn.relu(y)), 0, 127).astype(jnp.int8)
        x = x.reshape(x.shape[0], -1)
        k8, m, b = qw['fc1']
        y = jax.lax.dot(x, k8, preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * m + b
        x = jax.nn.relu(y) * fc1_out_scale   # back to real units
        for name in ('fc2', 'fc3'):
            x = x @ p[name]['kernel'] + p[name]['bias']
            if name == 'fc2':
                x = jax.nn.relu(x)
        return x

    # argmax agreement vs the f32 forward on the calibration batch
    @jax.jit
    def agreement(obs):
        qf = net.apply(params, prep(obs))
        qq = apply_int8(obs)
        return (qf.argmax(-1) == qq.argmax(-1)).mean()
    agree = float(agreement(obs))

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def rollout(states, obs):
        def body(carry, _):
            states, obs = carry
            q = apply_int8(obs)
            actions = q.argmax(-1).astype(jnp.int32).reshape(e, n)
            states, out = step_fn(states, actions)
            return (states, out.obs), out.reward.sum()

        (states, obs), rews = jax.lax.scan(body, (states, obs),
                                           length=num_steps)
        return states, obs, rews.sum()

    states, obs, r = rollout(states, obs)
    r.block_until_ready()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        states, obs, r = rollout(states, obs)
        r.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    med = sorted(times)[len(times) // 2]
    return e * num_steps / best, e * num_steps / med, agree


def measure_grouped(cfg, num_envs, num_steps, iters, groups=4,
                    dtype=jnp.bfloat16):
    """Batch->lane packing: fold G batch rows into the channel dim and
    run every conv as a feature-group conv with identical per-group
    kernels (block-diagonal = exact same math). Probes whether the conv
    stack is 128-lane-starved at C=16/32/64: grouped, the conv layers
    see G*C lanes. fc1 contracts over (H, W, C) with the group dim as a
    batch dim via einsum, so no ungroup transpose is needed until the
    (B, 256) reshape, which is layout-contiguous."""
    from marlsnake_tpu.core import engine  # noqa: F401 (parity w/ measure)
    reset_fn, step_fn = build_vector_fns(cfg, autoreset=True)
    e, n = num_envs, cfg.num_snakes
    h, w = cfg.height, cfg.width
    g = groups
    assert (e * n) % g == 0
    net = DQN(num_actions=cfg.num_actions)
    dn = ('NHWC', 'HWIO', 'NHWC')

    def apply_grouped(params, obs_flat):
        p = params['params']
        cast = lambda a: a.astype(dtype)
        b = obs_flat.shape[0]
        x = jnp.pad(obs_flat, [(0, 0)] * 3 + [(0, 8)])   # (B, H, W, 16)
        x = jnp.moveaxis(x.reshape(b // g, g, h, w, 16), 1, 3)
        x = cast(x.reshape(b // g, h, w, g * 16))         # one transpose
        for name, cin in (('conv1', 16), ('conv2', 32), ('conv3', 64)):
            k = p[name]['kernel'].astype(jnp.float32)
            if name == 'conv1':
                k = jnp.pad(k, ((0, 0), (0, 0), (0, 8), (0, 0)))
            k = cast(jnp.concatenate([k] * g, axis=3))    # (3,3,cin,g*F)
            bias = cast(jnp.tile(p[name]['bias'], g))
            x = jax.nn.relu(jax.lax.conv_general_dilated(
                x, k, (1, 1), 'SAME', dimension_numbers=dn,
                feature_group_count=g) + bias)
        # x: (B/g, H, W, g*64) with group-contiguous channels
        x = x.reshape(b // g, h, w, g, 64)
        wf = cast(p['fc1']['kernel']).reshape(h, w, 64, 256)
        x = jnp.einsum('bhwgc,hwcf->bgf', x, wf,
                       preferred_element_type=dtype)
        x = jax.nn.relu(x + cast(p['fc1']['bias']))
        x = x.reshape(b, 256)
        for name, act in (('fc2', True), ('fc3', False)):
            x = x @ cast(p[name]['kernel']) + cast(p[name]['bias'])
            if act:
                x = jax.nn.relu(x)
        return x.astype(jnp.float32)

    @jax.jit
    def init(key):
        keys = jax.random.split(key, e)
        states, obs = reset_fn(keys)
        params = net.init(jax.random.key(7),
                          jnp.zeros((1, h, w, 8), jnp.uint8))
        return states, obs, params

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def rollout(states, obs, params):
        def body(carry, _):
            states, obs = carry
            q = apply_grouped(params,
                              obs.reshape((e * n,) + obs.shape[2:]))
            actions = q.argmax(-1).astype(jnp.int32).reshape(e, n)
            states, out = step_fn(states, actions)
            return (states, out.obs), out.reward.sum()

        (states, obs), rews = jax.lax.scan(body, (states, obs),
                                           length=num_steps)
        return states, obs, rews.sum()

    states, obs, params = init(jax.random.key(0))
    states, obs, r = rollout(states, obs, params)
    r.block_until_ready()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        states, obs, r = rollout(states, obs, params)
        r.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    med = sorted(times)[len(times) // 2]
    return e * num_steps / best, e * num_steps / med


def measure_reencode(cfg, num_envs, num_steps, iters,
                     dtype=jnp.bfloat16, pad=8):
    """Obs leaves the scan carry entirely: the policy re-encodes its
    observation from the carried ``states.grid`` at ingress
    (bit-identical for full-obs frame_stack=1 — encode_frame is a pure
    function of the grid, and step_autoreset's own obs is encoded from
    exactly that post-select grid; the env's internal encode is then
    DCE'd, so still ONE encode per step). The 8->16 channel pad now
    reads the encode's producer inside the same fusion instead of the
    52MB carry (the 2.25ms pad copy of bf16_pad16), and the carry
    shrinks by the 52MB obs."""
    from marlsnake_tpu.core import engine
    reset_fn, step_fn = build_vector_fns(cfg, autoreset=True)
    e, n = num_envs, cfg.num_snakes
    net = DQN(num_actions=cfg.num_actions, compute_dtype=dtype,
              assume_binary_obs=True)

    def obs_of(states):
        frame = jax.vmap(lambda g: engine.encode_frame(cfg, g))(
            states.grid)                       # (E, N, H, W, 8)
        flat = frame.reshape((e * n,) + frame.shape[2:])
        if pad:
            flat = jnp.pad(flat, [(0, 0)] * (flat.ndim - 1) + [(0, pad)])
        return flat

    @jax.jit
    def init(key):
        keys = jax.random.split(key, e)
        states, _ = reset_fn(keys)
        params = net.init(jax.random.key(7), obs_of(states)[:1])
        return states, params

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rollout(states, params):
        def body(states, _):
            q = net.apply(params, obs_of(states))
            actions = q.argmax(-1).astype(jnp.int32).reshape(e, n)
            states, out = step_fn(states, actions)
            return states, out.reward.sum()

        states, rews = jax.lax.scan(body, states, length=num_steps)
        return states, rews.sum()

    states, params = init(jax.random.key(0))
    states, r = rollout(states, params)
    r.block_until_ready()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        states, r = rollout(states, params)
        r.block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    med = sorted(times)[len(times) // 2]
    return e * num_steps / best, e * num_steps / med


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--envs', type=int, default=4096)
    ap.add_argument('--steps', type=int, default=64)
    ap.add_argument('--iters', type=int, default=3)
    ap.add_argument('--variants', type=str, default='')
    args = ap.parse_args()

    cfg = EnvConfig(height=20, width=20, num_snakes=4, snake_length=3)
    A = cfg.num_actions
    variants = {
        'f32': (DQN(num_actions=A), 0, 0),
        'f32_nonorm': (DQN(num_actions=A, assume_binary_obs=True), 0, 0),
        'bf16': (DQN(num_actions=A, compute_dtype=jnp.bfloat16), 0, 0),
        'bf16_nonorm': (DQN(num_actions=A, compute_dtype=jnp.bfloat16,
                            assume_binary_obs=True), 0, 0),
        'bf16_pad16': (DQN(num_actions=A, compute_dtype=jnp.bfloat16,
                           assume_binary_obs=True), 8, 0),
        # pad fused into the encode's output write instead of a
        # separate carry-read copy
        'bf16_obs16': (DQN(num_actions=A, compute_dtype=jnp.bfloat16,
                           assume_binary_obs=True), 0, 8),
        'f32_obs16': (DQN(num_actions=A, assume_binary_obs=True), 0, 8),
    }
    planes_variants = {
        'bf16_planes': dict(dtype=jnp.bfloat16),
        'f32_planes': dict(dtype=jnp.float32),
        'bf16_planes_pad13': dict(dtype=jnp.bfloat16, delta_pad=13),
    }
    grouped_variants = {
        'bf16_g4': dict(groups=4),
        'bf16_g8': dict(groups=8),
    }
    sel = [v for v in args.variants.split(',') if v] \
        or list(variants) + list(planes_variants)
    for name in sel:
        if name == 'int8':
            best, med, agree = measure_int8(cfg, args.envs, args.steps,
                                            args.iters)
            print(json.dumps({'variant': name,
                              'env_steps_per_sec': round(best),
                              'median': round(med),
                              'argmax_agreement_vs_f32': round(agree, 4)}),
                  flush=True)
            continue
        if name in ('bf16_reencode_pad16', 'bf16_reencode'):
            best, med = measure_reencode(
                cfg, args.envs, args.steps, args.iters,
                pad=8 if name.endswith('pad16') else 0)
            print(json.dumps({'variant': name,
                              'env_steps_per_sec': round(best),
                              'median': round(med)}), flush=True)
            continue
        if name == 'bf16_carrypad16':
            best, med = measure_carrypad(cfg, args.envs, args.steps,
                                         args.iters)
            print(json.dumps({'variant': name,
                              'env_steps_per_sec': round(best),
                              'median': round(med)}), flush=True)
            continue
        if name in grouped_variants:
            best, med = measure_grouped(cfg, args.envs, args.steps,
                                        args.iters,
                                        **grouped_variants[name])
            print(json.dumps({'variant': name,
                              'env_steps_per_sec': round(best),
                              'median': round(med)}), flush=True)
            continue
        if name in planes_variants:
            best, med = measure_planes(cfg, args.envs, args.steps,
                                       args.iters, **planes_variants[name])
            print(json.dumps({'variant': name,
                              'env_steps_per_sec': round(best),
                              'median': round(med)}), flush=True)
            continue
        net, pad, epad = variants[name]
        best, med = measure(cfg, args.envs, args.steps, args.iters,
                            net, pad_channels=pad, encode_pad=epad)
        print(json.dumps({'variant': name, 'env_steps_per_sec': round(best),
                          'median': round(med)}), flush=True)


if __name__ == '__main__':
    main()
