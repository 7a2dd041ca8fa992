"""Fused Pallas TPU kernel for observation generation.

One kernel computes, per environment block, everything between the padded
grid and the final per-agent observation images:

  per-agent window crop (predicated-roll chains at traced offsets)
  → rotation to face-up (constant permutation matmuls on the MXU)
  → carried-object overlay
  → see-behind mask + two-pass flood-fill visibility
  → unseen masking

The XLA expression of this pipeline (ops/obs.py) materializes every roll in
HBM (~1.4 ms/step at 4096 envs on v5e); here the entire pipeline runs out of
VMEM with HBM traffic = one grid read + one obs write.

Layout: **cells in sublanes, environments in lanes.** Per-env traced shifts
become static sublane rolls predicated per lane — the layout under which the
"every env wants a different window" problem vectorizes on the VPU. The
channel planes (type/color/state) are kept separate so strides stay 1.

Semantics are bit-identical to ops/obs.py:gen_obs_grid_encoding (itself
differentially tested against the reference numba kernels,
multigrid/utils/obs.py); tests/test_obs_pallas.py asserts equality in
interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import (
    STATE_OPEN,
    TYPE_AGENT,
    TYPE_DOOR,
    TYPE_WALL,
    WALL_ENCODING,
)
from ..core.config import EnvConfig
from ..core.state import MultiGridState
from .obs import get_view_exts

#: Env-block width (lanes per kernel invocation).
_BLOCK = 512


def _rotation_mats(vs: int) -> np.ndarray:
    """(4, vs², vs²) permutation matrices: out_flat = P[k] @ win_flat where
    out = rot90(win, k=-k) (k left-rotations, ops/obs.py step 4)."""
    idx = np.arange(vs * vs).reshape(vs, vs)
    mats = np.zeros((4, vs * vs, vs * vs), dtype=np.float32)
    for k in range(4):
        src = np.rot90(idx, k=-k).reshape(-1)
        mats[k, np.arange(vs * vs), src] = 1.0
    return mats


def _obs_kernel(
    meta_ref,      # (6N, B) int32: [sx; sy; dir; carry_t; carry_c; carry_s]
    gt_ref, gc_ref, gs_ref,   # (wp*hp, B) int8 padded grid planes
    ot_ref, oc_ref, os_ref,   # (N*vs*vs, B) int8 obs planes
    *,
    num_agents: int,
    vs: int,
    wp: int,
    hp: int,
    see_through_walls: bool,
):
    n = num_agents
    nbits_x = max(1, (wp - 1).bit_length())
    nbits_y = max(1, (hp - 1).bit_length())
    rot_mats = _rotation_mats(vs)
    v2 = vs * vs
    mid = (vs // 2) * vs + (vs - 1)  # flat index of the agent's own view cell

    # Row-index table over the flat (vs*vs) view for flood-fill masks.
    rflat = np.arange(n * v2)
    jcol = rflat % vs          # j coordinate of each flat row
    irow = (rflat % v2) // vs  # i coordinate

    def lane_bits(row, k):
        """(1, B) bool — bit k of a (B,) int32 lane vector."""
        return (((row >> k) & 1) != 0).reshape(1, -1)

    def pshift(v, shift_rows, bit):
        """Predicated cyclic up-shift by ``shift_rows`` sublanes."""
        rolled = pltpu.roll(v, v.shape[0] - shift_rows, axis=0)
        return jnp.where(bit, rolled, v)

    wins = {'t': [], 'c': [], 's': []}
    for a in range(n):
        sx = meta_ref[a, :]
        sy = meta_ref[n + a, :]
        vt = gt_ref[:, :]
        vc = gc_ref[:, :]
        vss = gs_ref[:, :]
        # x-chain: shift so row sx*hp lands at 0; high bit first, shrinking
        # the working slab each pass (remaining shift < 2^k).
        for k in reversed(range(nbits_x)):
            bit = lane_bits(sx, k)
            step = (1 << k) * hp
            vt = pshift(vt, step, bit)
            vc = pshift(vc, step, bit)
            vss = pshift(vss, step, bit)
            keep = min(vt.shape[0] // hp, (1 << k) - 1 + vs) * hp
            vt, vc, vss = vt[:keep], vc[:keep], vss[:keep]
        vt, vc, vss = vt[:vs * hp], vc[:vs * hp], vss[:vs * hp]
        # y-chain: shifts stay within each row's hp-block for kept columns.
        for k in reversed(range(nbits_y)):
            bit = lane_bits(sy, k)
            step = 1 << k
            vt = pshift(vt, step, bit)
            vc = pshift(vc, step, bit)
            vss = pshift(vss, step, bit)
        # Extract the vs×vs window: vs static row-slices of vs rows.
        wins['t'].append(
            jnp.concatenate([vt[u * hp:u * hp + vs] for u in range(vs)]))
        wins['c'].append(
            jnp.concatenate([vc[u * hp:u * hp + vs] for u in range(vs)]))
        wins['s'].append(
            jnp.concatenate([vss[u * hp:u * hp + vs] for u in range(vs)]))

    # (N*vs², B) per plane, all agents stacked.
    win_t = jnp.concatenate(wins['t'])
    win_c = jnp.concatenate(wins['c'])
    win_s = jnp.concatenate(wins['s'])

    # Rotation: select among the four permuted copies per lane. The
    # permutation is applied as a constant block-diagonal matmul (MXU);
    # win values ≤ 31 are exact in bfloat16.
    dirs = [meta_ref[2 * n + a, :] for a in range(n)]
    rot = jnp.concatenate(
        [((dirs[a] + 1) % 4).reshape(1, -1) for a in range(n)]
    )  # (N, B)
    rot_rows = jnp.concatenate(
        [jnp.broadcast_to(rot[a:a + 1], (v2, rot.shape[1])) for a in range(n)]
    )  # (N*vs², B)

    def rotate(win):
        winf = win.astype(jnp.bfloat16)
        out = jnp.zeros_like(winf)
        for k in range(4):
            pk = jnp.asarray(rot_mats[k], dtype=jnp.bfloat16)
            # Block-diagonal: same permutation per agent block.
            rotated = jnp.concatenate([
                jnp.dot(pk, winf[a * v2:(a + 1) * v2],
                        preferred_element_type=jnp.bfloat16)
                for a in range(n)
            ])
            out = jnp.where(rot_rows == k, rotated, out)
        return out.astype(jnp.int8)

    obs_t = rotate(win_t)
    obs_c = rotate(win_c)
    obs_s = rotate(win_s)

    # Carried-object overlay at the agent's own view cell (obs.py:204-207).
    own_mask = jnp.asarray(
        ((rflat % v2) == mid).reshape(-1, 1), dtype=jnp.bool_)
    carry_rows = lambda base: jnp.concatenate([
        jnp.broadcast_to(
            meta_ref[base + a, :].astype(jnp.int8).reshape(1, -1),
            (v2, obs_t.shape[1]))
        for a in range(n)
    ])
    obs_t = jnp.where(own_mask, carry_rows(3 * n), obs_t)
    obs_c = jnp.where(own_mask, carry_rows(4 * n), obs_c)
    obs_s = jnp.where(own_mask, carry_rows(5 * n), obs_s)

    if not see_through_walls:
        # Flood-fill visibility (obs.py:235-273) on the flat (N*vs², B)
        # layout: shift along i == roll by vs rows; column selection and
        # boundary conditions are static row masks. All agents propagate
        # simultaneously (rolls never cross agent blocks for unmasked rows).
        see = ~(
            (obs_t == TYPE_WALL)
            | ((obs_t == TYPE_DOOR) & (obs_s != STATE_OPEN))
        )
        rows = see.shape[0]
        vis = jnp.asarray(
            ((irow == vs // 2) & (jcol == vs - 1)).reshape(-1, 1),
            dtype=jnp.bool_,
        ) & jnp.ones_like(see)
        i_ge1 = jnp.asarray((irow >= 1).reshape(-1, 1), dtype=jnp.bool_)
        i_lt_last = jnp.asarray(
            (irow < vs - 1).reshape(-1, 1), dtype=jnp.bool_)

        def shift_up(v):
            # value at i moves to i+1 (flat: +vs), zero-fill at i=0.
            return pltpu.roll(v, vs, axis=0) & i_ge1

        def shift_down(v):
            return pltpu.roll(v, rows - vs, axis=0) & i_lt_last

        for j in range(vs - 1, -1, -1):
            colmask = jnp.asarray(
                (jcol == j).reshape(-1, 1), dtype=jnp.bool_)
            f = vis
            for _ in range(vs - 1):
                f = f | shift_up(f & see)
            b = f
            for _ in range(vs - 1):
                b = b | shift_down(b & see)
            vis = jnp.where(colmask, b, vis)
            if j > 0:
                cf = (f & see) & i_lt_last
                cb = (b & see) & i_ge1
                contrib = cf | shift_up(cf) | cb | shift_down(cb)
                # place at column j-1: flat shift by -1 within the i-block.
                prev = pltpu.roll(contrib, rows - 1, axis=0)
                colmask_prev = jnp.asarray(
                    (jcol == j - 1).reshape(-1, 1), dtype=jnp.bool_)
                vis = vis | (prev & colmask_prev)
        obs_t = jnp.where(vis, obs_t, 0)
        obs_c = jnp.where(vis, obs_c, 0)
        obs_s = jnp.where(vis, obs_s, 0)

    ot_ref[:, :] = obs_t
    oc_ref[:, :] = obs_c
    os_ref[:, :] = obs_s


def _pad_plane(plane_t: jax.Array, w: int, h: int, vs: int,
               wall_value: int) -> jax.Array:
    """(w*h, E) cell-major plane → (wp*hp, E) wall-padded plane.

    Static concatenation only (no scatters): wall slabs around and between
    the grid's row-blocks.
    """
    e = plane_t.shape[-1]
    hp = h + 2 * vs
    wallrow = jnp.full((vs * hp, e), wall_value, dtype=plane_t.dtype)
    wallseg = jnp.full((vs, e), wall_value, dtype=plane_t.dtype)
    pieces = [wallrow]
    for x in range(w):
        pieces.append(wallseg)
        pieces.append(plane_t[x * h:(x + 1) * h])
        pieces.append(wallseg)
    pieces.append(wallrow)
    return jnp.concatenate(pieces)


@functools.partial(
    jax.jit,
    static_argnames=('view_size', 'see_through_walls', 'interpret'),
)
def gen_obs_batched_pallas(
    state: MultiGridState,
    view_size: int,
    see_through_walls: bool,
    interpret: bool = False,
) -> jax.Array:
    """Batched observation images via the fused kernel.

    Parameters: batched state with leading env axis E (E a multiple of 128;
    callers pad or fall back to the XLA path otherwise).
    Returns ``(E, N, vs, vs, 3)`` int32, bit-identical to
    ``vmap(gen_obs_grid_encoding)``.
    """
    vs = view_size
    e, w, h, _ = state.grid.shape
    n = state.agent_dir.shape[-1]
    wp, hp = w + 2 * vs, h + 2 * vs
    v2 = vs * vs

    # ---- XLA prologue: overlay agents, split planes, go cell-major. -------
    grid8 = state.grid.astype(jnp.int8)
    if n > 1:
        # Agent overlay in index order, skipping terminated (obs.py:162-173).
        cx = jnp.arange(w, dtype=jnp.int32).reshape(1, w, 1)
        cy = jnp.arange(h, dtype=jnp.int32).reshape(1, 1, h)
        enc_t = jnp.full((e,), TYPE_AGENT, dtype=jnp.int8)
        for a in range(n):
            m = (
                (cx == state.agent_pos[:, a, 0].reshape(-1, 1, 1))
                & (cy == state.agent_pos[:, a, 1].reshape(-1, 1, 1))
                & ~state.agent_terminated[:, a].reshape(-1, 1, 1)
            )
            over = jnp.stack([
                jnp.broadcast_to(enc_t.reshape(-1, 1, 1), (e, w, h)),
                jnp.broadcast_to(
                    state.agent_color[:, a].astype(jnp.int8).reshape(-1, 1, 1),
                    (e, w, h)),
                jnp.broadcast_to(
                    state.agent_dir[:, a].astype(jnp.int8).reshape(-1, 1, 1),
                    (e, w, h)),
            ], axis=-1)
            grid8 = jnp.where(m[..., None], over, grid8)

    planes = []
    for c, wall_val in ((0, int(WALL_ENCODING[0])),
                        (1, int(WALL_ENCODING[1])),
                        (2, int(WALL_ENCODING[2]))):
        pt = grid8[..., c].reshape(e, w * h).T  # (w*h, E) cell-major
        planes.append(_pad_plane(pt, w, h, vs, wall_val))

    top_x, top_y = get_view_exts(state.agent_dir, state.agent_pos, vs)
    meta = jnp.concatenate([
        (top_x + vs).astype(jnp.int32).T,            # (N, E)
        (top_y + vs).astype(jnp.int32).T,
        state.agent_dir.astype(jnp.int32).T,
        state.agent_carrying[..., 0].astype(jnp.int32).T,
        state.agent_carrying[..., 1].astype(jnp.int32).T,
        state.agent_carrying[..., 2].astype(jnp.int32).T,
    ])  # (6N, E)

    # ---- kernel ------------------------------------------------------------
    block = min(_BLOCK, e)
    assert e % block == 0, f'env batch {e} not a multiple of {block}'
    kernel = functools.partial(
        _obs_kernel,
        num_agents=n, vs=vs, wp=wp, hp=hp,
        see_through_walls=see_through_walls,
    )
    out_shape = [
        jax.ShapeDtypeStruct((n * v2, e), jnp.int8) for _ in range(3)
    ]
    grid_spec = pl.GridSpec(
        grid=(e // block,),
        in_specs=[
            pl.BlockSpec((6 * n, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((wp * hp, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_specs=[
            pl.BlockSpec((n * v2, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
    )
    ot, oc, osx = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, *planes)

    # ---- XLA epilogue: back to env-major int32 images. ---------------------
    img = jnp.stack([ot, oc, osx], axis=-1)        # (N*vs², E, 3)
    img = img.transpose(1, 0, 2)                   # (E, N*vs², 3)
    return img.reshape(e, n, vs, vs, 3).astype(jnp.int32)
