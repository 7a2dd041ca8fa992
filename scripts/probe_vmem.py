"""Validate the obs kernel's VMEM working-set model on hardware.

For a sweep of grid sizes / view sizes / team sizes, compile the fused obs
kernel at the lane block `pick_block` predicts (derived from
``working_set_bytes``, ops/obs_pallas.py) and report whether the compile
succeeds. A failure at the predicted block means the model's slack factor
is too small for that shape (the kernel would crash loudly, never silently
mis-tile); a success at DOUBLE the predicted block where the model said no
means the model is conservative there (costing lane parallelism, never
correctness).

Usage (on TPU)::

    python scripts/probe_vmem.py
"""

from __future__ import annotations

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_state(w: int, h: int, n: int, e: int):
    """A synthetic batched state: outer walls, agents at random interior
    cells — all the kernel reads."""
    from multigrid_tpu.core.constants import (
        EMPTY_ENCODING, TYPE_WALL, WALL_ENCODING)
    from multigrid_tpu.core.state import MultiGridState

    key = jax.random.key(0)
    kx, ky, kd = jax.random.split(key, 3)
    grid = jnp.broadcast_to(
        jnp.asarray(EMPTY_ENCODING, jnp.int32), (e, w, h, 3))
    xs = jnp.arange(w)[None, :, None, None]
    ys = jnp.arange(h)[None, None, :, None]
    border = (xs == 0) | (xs == w - 1) | (ys == 0) | (ys == h - 1)
    grid = jnp.where(border, jnp.asarray(WALL_ENCODING, jnp.int32), grid)
    pos = jnp.stack([
        jax.random.randint(kx, (e, n), 1, w - 1),
        jax.random.randint(ky, (e, n), 1, h - 1),
    ], -1).astype(jnp.int32)
    empty_n = jnp.broadcast_to(
        jnp.asarray(EMPTY_ENCODING, jnp.int32), (e, n, 3))
    return MultiGridState(
        grid=grid,
        box_contents=jnp.zeros((e, 0, 0, 3), jnp.int32),
        agent_pos=pos,
        agent_dir=jax.random.randint(kd, (e, n), 0, 4, jnp.int32),
        agent_color=jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32) % 6, (e, n)),
        agent_terminated=jnp.zeros((e, n), jnp.bool_),
        agent_carrying=empty_n,
        agent_carrying_contents=empty_n,
        step_count=jnp.zeros((e,), jnp.int32),
        rng=jax.random.split(jax.random.key(1), e),
        extras={},
    )


def try_block(w, h, vs, n, block):
    """Compile + run one kernel invocation at exactly ``block`` lanes."""
    import multigrid_tpu.ops.obs_pallas as op

    state = make_state(w, h, n, block)
    orig = op._MAX_BLOCK
    op._MAX_BLOCK = block  # force: e == block == one invocation
    try:
        out = op.gen_obs_batched_pallas(state, vs, False, packed=True)
        int(jnp.sum(out))  # force compile + execute
        return True, None
    except Exception as e:  # compile failure (scoped VMEM) is the signal
        return False, f'{type(e).__name__}: {str(e)[:120]}'
    finally:
        op._MAX_BLOCK = orig


def main():
    from multigrid_tpu.ops.obs_pallas import pick_block, working_set_bytes

    sweep = []
    for w, h in [(8, 8), (16, 16), (19, 19), (25, 13), (32, 32), (40, 40),
                 (48, 48), (64, 64)]:
        for vs, n in [(7, 4), (7, 8), (9, 2), (11, 2)]:
            sweep.append((w, h, vs, n))

    for w, h, vs, n in sweep:
        blk = pick_block(w, h, vs, n)
        ok, err = try_block(w, h, vs, n, blk)
        # Where the model said "too big for 512", check it wasn't merely
        # conservative (2x the predicted block actually compiling).
        double_ok = None
        if blk < 512:
            double_ok, _ = try_block(w, h, vs, n, blk * 2)
        print(json.dumps({
            'grid': f'{w}x{h}', 'vs': vs, 'n': n,
            'predicted_block': blk,
            'ws_mb_at_block': round(
                working_set_bytes(w, h, vs, n, blk) / 1e6, 1),
            'compiles_at_predicted': ok,
            'compiles_at_double': double_ok,
            **({'error': err} if err else {}),
        }), flush=True)


if __name__ == '__main__':
    main()
