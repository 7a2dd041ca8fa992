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
(type, color, state) triple is bit-packed into one int32 per cell
(``t<<8 | c<<4 | s``) so each (agent) crop is a single roll chain; sublane
rotates are the kernel's dominant cost, so minimizing chain count is the
main lever. Each chain is an independent straight-line sequence —
interleaving multiple logical arrays' rolls inside one Python loop crashes
the Mosaic compiler, and matmul operands must start at sublane offset 0.

Semantics are bit-identical to ops/obs.py:gen_obs_grid_encoding (itself
differentially tested against the reference numba kernels,
multigrid/utils/obs.py); tests/test_obs_pallas.py asserts equality in
interpret mode, and the same assertion has been verified on real TPU
hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import (
    STATE_OPEN,
    TYPE_AGENT,
    TYPE_DOOR,
    TYPE_WALL,
    WALL_ENCODING,
)
from ..core.state import MultiGridState
from .obs import get_view_exts

#: Maximum env-block width (lanes per kernel invocation).
_MAX_BLOCK = 512

#: Scoped-VMEM limit requested from Mosaic. The 16 MB default forces small
#: lane blocks on grids past ~16x16 (more kernel invocations, each with the
#: same fixed roll-chain cost — measured 1.5x slower end-to-end on the 19x19
#: Playground); v5e accommodates 64 MB for this kernel's stack comfortably.
_VMEM_LIMIT = 64 * 1024 * 1024

#: Allocator slack on top of the structural working-set model below: Mosaic
#: double-buffers grid-step inputs/outputs and does not aggressively reuse
#: dead intermediates. Calibrated on v5e by compiling the kernel across a
#: grid-size sweep (scripts/probe_vmem.py) and validated against the
#: measured stacks of the shipped configs.
_VMEM_SLACK = 2.0


def working_set_bytes(w: int, h: int, vs: int, n: int, block: int) -> int:
    """Structural VMEM working-set estimate for one kernel invocation.

    Derived from the kernel's live buffers (all int32, per lane-block of
    ``block`` lanes), not hand-calibrated per grid:

    * stage 1 (crop chains, agents sequential): the padded plane, the
      largest pass output (the top bit's shrunk slab), and the finished
      agents' slabs;
    * stage 2 (stacked y-chain): stack + broadcast shift rows + rolled copy
      + select output, all ``n·vs·stride`` rows;
    * stage 3/4 (rotation, flood fill) and the output: ``n·vs²`` rows plus
      change — dominated by the earlier stages on every realistic shape.

    A single measured allocator-slack factor (:data:`_VMEM_SLACK`) covers
    Mosaic's double buffering; scripts/probe_vmem.py re-validates it by
    compiling across the size envelope on hardware.
    """
    stride = _row_stride(h, vs)
    plane = _plane_rows(w, vs) * stride
    keep1 = min(_plane_rows(w, vs),
                (1 << (_nbits(w, vs) - 1)) - 1 + vs) * stride
    slab = vs * stride
    stage1 = plane + keep1 + (n - 1) * slab
    stage2 = 4 * n * slab
    rows = max(stage1, stage2) + n * vs * vs
    return int(4 * block * rows * _VMEM_SLACK)


def pick_block(w: int, h: int, vs: int, n: int = 8) -> int:
    """Lane-block width for a given grid: largest power-of-two ≤ 512 whose
    working set (:func:`working_set_bytes`) stays inside scoped VMEM.

    ``n`` defaults to the Pallas path's maximum team size (VectorEnv gates
    ``num_agents > 8`` onto the XLA path), so the default is conservative;
    callers that know the real team size pass it for full blocks on big
    grids."""
    block = _MAX_BLOCK
    while block > 128 and working_set_bytes(w, h, vs, n, block) > _VMEM_LIMIT:
        block //= 2
    return block


def _nbits(extent: int, vs: int) -> int:
    """Bits needed for a crop shift: the padded window origin is
    ``top + vs ∈ [1, extent - 1 + vs]`` (get_view_exts caps ``top`` at
    ``extent - 1``)."""
    return max(1, (extent - 1 + vs).bit_length())


def _plane_rows(w: int, vs: int) -> int:
    """Stride-rows in the padded plane: ``wp = w + 2*vs`` plus trailing wall
    rows so the x-chain's top-bit slice ``v[2^k : 2^k + keep]`` stays in
    bounds (lower passes exactly fit — see crop_chain)."""
    wp = w + 2 * vs
    top = _nbits(w, vs) - 1
    keep_top = min(wp, (1 << top) - 1 + vs)
    return max(wp, (1 << top) + keep_top)


_WALL_PACKED = (
    (int(WALL_ENCODING[0]) << 8)
    | (int(WALL_ENCODING[1]) << 4)
    | int(WALL_ENCODING[2])
)


def supports_batch(e: int, w: int = 16, h: int = 16, vs: int = 7,
                   n: int = 8) -> bool:
    """Whether an env batch of size ``e`` tiles into the kernel's lane
    blocks: whole 128-lane tiles, and a whole number of blocks."""
    block = min(pick_block(w, h, vs, n), e)
    return e % 128 == 0 and e % block == 0


def _pack(t, c, s):
    """Bit-pack encoding triples: 4 bits state, 4 bits color, rest type."""
    return (
        (t.astype(jnp.int32) << 8)
        | (c.astype(jnp.int32) << 4)
        | s.astype(jnp.int32)
    )


def _rotation_mat(vs: int, k: int, dtype) -> jax.Array:
    """(vs², vs²) permutation matrix: out_flat = P @ win_flat where
    out = rot90(win, k=-k) (k left-rotations, ops/obs.py step 4).

    Built from 2-D iota arithmetic (Pallas kernels cannot capture array
    constants; everything is computed from ``broadcasted_iota``).
    """
    v2 = vs * vs
    r = jax.lax.broadcasted_iota(jnp.int32, (v2, v2), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (v2, v2), 1)
    i, j = r // vs, r % vs
    # src flat index of rot90(win, k=-k)[i, j] in win:
    if k == 0:
        src = i * vs + j
    elif k == 1:              # A[vs-1-j, i]
        src = (vs - 1 - j) * vs + i
    elif k == 2:              # A[vs-1-i, vs-1-j]
        src = (vs - 1 - i) * vs + (vs - 1 - j)
    else:                     # A[j, vs-1-i]
        src = j * vs + (vs - 1 - i)
    return (c == src).astype(dtype)


def _obs_kernel(
    meta_ref,      # (5N, B) int32: [sx; sy mod stride; dir; carry; top_y]
    g_ref,         # (plane_rows*stride, B) int32 packed x-padded grid
    o_ref,         # (N*vs*vs, B) int32 packed obs
    *,
    num_agents: int,
    vs: int,
    w: int,
    h: int,
    see_through_walls: bool,
):
    n = num_agents
    stride = _row_stride(h, vs)
    nbits_x = _nbits(w, vs)
    # The y-crop shift is the CLAMPED top_y ∈ [0, h-1] (no y-wall padding
    # in the plane): windows that cross y = h wrap cyclically into the
    # neighbouring column's rows, and windows with top_y < 0 are cropped
    # from 0 then realigned by a small roll — in both cases every
    # wrong-source window cell corresponds to a world y outside [0, h) and
    # is wall-masked below from the raw top_y.
    nbits_y = max(1, (h - 1).bit_length())
    v2 = vs * vs
    mid = (vs // 2) * vs + (vs - 1)  # flat index of the agent's own view cell

    def lane_bits(row, k):
        """(1, B) bool — bit k of a (B,) int32 lane vector."""
        return (((row >> k) & 1) != 0).reshape(1, -1)

    # --- crop: one slice-select chain per agent on the packed plane ---------
    def crop_chain(a):
        sx = meta_ref[a, :]
        v = g_ref[:, :]
        # x-chain: shift so row sx*stride lands at 0; high bit first. All
        # offsets are whole stride-rows (stride % 8 == 0 → tile-aligned), so
        # instead of a cyclic roll + select over the FULL slab, each pass is
        # one select of two static slices writing only the SHRUNK slab
        # (remaining shift < 2^k ⇒ keep = 2^k - 1 + vs rows suffice). The
        # top pass's high slice reaches past wp into the plane's trailing
        # wall pad (_plane_rows); every lower pass exactly fits:
        # off + keep = 2^k + (2^k - 1 + vs) = previous keep.
        for k in reversed(range(nbits_x)):
            keep = min(v.shape[0] // stride, (1 << k) - 1 + vs) * stride
            off = (1 << k) * stride
            v = jnp.where(lane_bits(sx, k), v[off:off + keep], v[:keep])
        return v[:vs * stride]

    slabs = [crop_chain(a) for a in range(n)]

    # --- y-chain: one stacked chain for all agents --------------------------
    # Shifts are the clamped top_y ∈ [0, h-1]; kept columns [0, vs) of a
    # stride-row may pull PAST the row's end (window crossing y = h), which
    # reads the neighbouring column's rows — every such cell is a world
    # y ≥ h and is wall-masked after window extraction, so the cyclic
    # stacked roll stays safe without y-padding in the plane.
    stack = jnp.concatenate(slabs) if n > 1 else slabs[0]  # (N*vs*stride, B)
    sy_rows = jnp.concatenate([
        jnp.broadcast_to(meta_ref[n + a, :].reshape(1, -1),
                         (vs * stride, stack.shape[1]))
        for a in range(n)
    ]) if n > 1 else jnp.broadcast_to(
        meta_ref[n, :].reshape(1, -1), (vs * stride, stack.shape[1]))
    for k in reversed(range(nbits_y)):
        bit = ((sy_rows >> k) & 1) != 0
        rolled = pltpu.roll(stack, stack.shape[0] - (1 << k), axis=0)
        stack = jnp.where(bit, rolled, stack)

    # --- rotation + carried overlay, per agent -------------------------------
    # Matmul operands must start at sublane offset 0, so each agent's window
    # is extracted into a fresh array before the permutation matmuls.
    # The MXU narrows float32 operands through bfloat16 (packed values up to
    # ~2700 lose their low bits), so the permutation runs on the hi/lo bytes
    # separately — each ≤ 255, exact in bfloat16.
    own_mask49 = (
        jax.lax.broadcasted_iota(jnp.int32, (v2, 1), 0) == mid
    )
    obs_parts = []
    for a in range(n):
        win = jnp.concatenate([
            stack[a * vs * stride + u * stride:
                  a * vs * stride + u * stride + vs]
            for u in range(vs)
        ])  # (vs², B) packed, world orientation
        # Realign windows with top_y < 0 (cropped from row 0 instead): roll
        # down by d = -top_y so cell (u, j) holds world y = top_y + j; the
        # d contaminated leading rows (and any y ≥ h wrap-reads from the
        # crop) are exactly the out-of-bounds cells — mask them to wall.
        ty = meta_ref[4 * n + a, :].reshape(1, -1)
        d = jnp.maximum(-ty, 0)
        # d = -top_y ≤ vs - 1 (get_view_exts: top_y ≥ y - vs + 1, y ≥ 0), so
        # the chain needs (vs - 1).bit_length() passes — a fixed 3-bit chain
        # would silently corrupt view_size ≥ 11 (d up to 10).
        for k in reversed(range(max(1, (vs - 1).bit_length()))):
            bit = ((d >> k) & 1) != 0
            win = jnp.where(bit, pltpu.roll(win, 1 << k, axis=0), win)
        jj = jax.lax.broadcasted_iota(jnp.int32, (v2, 1), 0) % vs
        wy = ty + jj
        win = jnp.where((wy < 0) | (wy >= h), _WALL_PACKED, win)
        hi = (win >> 8).astype(jnp.bfloat16)
        lo = (win & 255).astype(jnp.bfloat16)
        rot = ((meta_ref[2 * n + a, :] + 1) % 4).reshape(1, -1)
        # Rotations compose: rot = 2·b1 + b0 ⇒ P_rot = P180^b1 @ P90^b0, so
        # two predicated levels (4 matmuls + 4 selects for the hi/lo pair)
        # replace one predicated matmul per rotation value (8 + 8).
        p90 = _rotation_mat(vs, 1, jnp.bfloat16)
        p180 = _rotation_mat(vs, 2, jnp.bfloat16)
        for pk, bit in ((p90, rot & 1), (p180, rot & 2)):
            sel = bit != 0
            hi = jnp.where(
                sel,
                jnp.dot(pk, hi, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16),
                hi)
            lo = jnp.where(
                sel,
                jnp.dot(pk, lo, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16),
                lo)
        out = (hi.astype(jnp.int32) << 8) | lo.astype(jnp.int32)
        # Carried-object overlay at the agent's own view cell
        # (obs.py:204-207) — unconditional, empty encoding when hands free.
        carry = meta_ref[3 * n + a, :].reshape(1, -1)
        obs_parts.append(jnp.where(own_mask49, carry, out))

    obs = jnp.concatenate(obs_parts) if n > 1 else obs_parts[0]  # (N·vs², B)

    if not see_through_walls:
        # Flood-fill visibility (obs.py:235-273), **bit-packed**: each
        # (agent, view-column j) holds its vs i-cells as bits of one int32,
        # so the reference's sequential i-sweeps become Kogge-Stone carry
        # propagation in the integer domain — 3 doubling levels instead of
        # vs-1 shift-OR passes, on a (N*vs, B) array instead of (N*vs^2, B).
        # Verified against the sweep semantics on 5000 random masks;
        # tests/test_obs_pallas.py covers it end-to-end.
        vsmask = (1 << vs) - 1
        top_bit = 1 << (vs - 1)

        # Pack see-bits: see_p[a*vs + j] bit i = see(i, j).
        t = obs >> 8
        st = obs & 15
        see = (~(
            (t == TYPE_WALL) | ((t == TYPE_DOOR) & (st != STATE_OPEN))
        )).astype(jnp.int32)
        see_parts = []
        for a in range(n):
            acc = jnp.zeros((vs, see.shape[1]), jnp.int32)
            for i in range(vs):
                acc = acc | (see[a * v2 + i * vs: a * v2 + i * vs + vs] << i)
            see_parts.append(acc)
        see_p = jnp.concatenate(see_parts) if n > 1 else see_parts[0]

        rows_p = n * vs
        rp = jax.lax.broadcasted_iota(jnp.int32, (rows_p, 1), 0)
        jcol = rp % vs
        # Seed: the agent's own cell (i = vs//2) in column vs-1.
        vis_p = jnp.where(jcol == vs - 1, 1 << (vs // 2), 0) \
            * jnp.ones_like(see_p)

        def up_fill(f, sbits):
            tgate = (sbits << 1) & vsmask
            d = 1
            while d < vs:
                f = f | ((f << d) & tgate)
                tgate = tgate & ((tgate << d) & vsmask)
                d <<= 1
            return f & vsmask

        def down_fill(f, sbits):
            tgate = sbits >> 1
            d = 1
            while d < vs:
                f = f | ((f >> d) & tgate)
                tgate = tgate & (tgate >> d)
                d <<= 1
            return f

        for j in range(vs - 1, -1, -1):
            colmask = jcol == j
            f = up_fill(vis_p, see_p)
            b = down_fill(f, see_p)
            vis_p = jnp.where(colmask, b, vis_p)
            if j > 0:
                cf = (f & see_p) & ~top_bit
                cb = (b & see_p) & ~1
                contrib = cf | ((cf << 1) & vsmask) | cb | (cb >> 1)
                prev = pltpu.roll(contrib, rows_p - 1, axis=0)
                vis_p = vis_p | jnp.where(jcol == j - 1, prev, 0)

        # Unpack to a (N*vs^2, B) 0/1 mask and apply (packed unseen == 0).
        mask_parts = []
        for a in range(n):
            va = vis_p[a * vs:(a + 1) * vs]  # (vs, B) - bit i = cell (i, j)
            mask_parts.extend(((va >> i) & 1) for i in range(vs))
        vis_mask = jnp.concatenate(mask_parts)
        obs = jnp.where(vis_mask != 0, obs, 0)

    o_ref[:, :] = obs


def _row_stride(h: int, vs: int) -> int:
    """Row stride: the REAL grid height rounded up to a sublane tile (8).

    Round 4 removed the per-column ±vs y-wall padding (the old stride was
    ``h + 2*vs`` rounded): y-crops now run as CYCLIC rolls mod the stride
    and out-of-bounds window cells are masked to wall afterward from the
    raw ``top_y`` (wrap-reads land on y ≥ h or cross into the neighbouring
    column's cells — but any wrapped read corresponds to a world y outside
    [0, h), so the bounds mask always covers it). This shrinks the padded
    plane ~2x on 16-row grids (stride 32 → 16), cutting both the plane's
    HBM traffic and the x-chain's per-pass work, which scales with stride.
    The stride must still cover a full view window (the per-column window
    slice takes ``vs`` rows), so views taller than the grid keep a
    vs-sized stride.
    """
    return max((h + 7) // 8 * 8, (vs + 7) // 8 * 8)


def _pad_packed(plane_t: jax.Array, w: int, h: int, vs: int) -> jax.Array:
    """(w*h, E) packed cell-major plane → (plane_rows*stride, E) x-padded
    plane.

    Static concatenation only (no scatters). Columns carry NO y-wall
    padding (see :func:`_row_stride` — y out-of-bounds is handled by the
    kernel's post-crop mask); the x axis keeps ``vs`` wall stride-groups on
    each side (x-crops read them directly, exactly like the old layout)
    plus the trailing wall groups the x-chain's top-bit slice needs.
    """
    e = plane_t.shape[-1]
    stride = _row_stride(h, vs)
    body = plane_t.reshape(w, h, e)
    if stride != h:
        body = jnp.concatenate([
            body,
            jnp.full((w, stride - h, e), _WALL_PACKED, plane_t.dtype),
        ], axis=1)
    body = body.reshape(w * stride, e)
    wall_x = jnp.full((vs * stride, e), _WALL_PACKED, dtype=plane_t.dtype)
    pieces = [wall_x, body, wall_x]
    tail = _plane_rows(w, vs) - (w + 2 * vs)
    if tail:
        # Trailing wall rows keep the kernel's top-bit x-slice in bounds.
        pieces.append(jnp.full(
            (tail * stride, e), _WALL_PACKED, dtype=plane_t.dtype))
    return jnp.concatenate(pieces)


@functools.partial(
    jax.jit,
    static_argnames=('view_size', 'see_through_walls', 'interpret', 'packed'),
)
def gen_obs_batched_pallas(
    state: MultiGridState,
    view_size: int,
    see_through_walls: bool,
    interpret: bool = False,
    packed: bool = False,
) -> jax.Array:
    """Batched observation images via the fused kernel.

    Parameters: batched state with leading env axis E (E a multiple of the
    kernel block; callers fall back to the XLA path otherwise).
    Returns ``(E, N, vs, vs, 3)`` int32, bit-identical to
    ``vmap(gen_obs_grid_encoding)`` — or, with ``packed=True``, the kernel's
    native ``(E, N, vs·vs)`` bit-packed cells (``type<<8|color<<4|state``,
    row-major cell order), skipping the unpack epilogue (1/3 the output
    traffic; the training path one-hots directly from the packed fields,
    learn/nets.py)."""
    vs = view_size
    e, w, h, _ = state.grid.shape
    n = state.agent_dir.shape[-1]
    v2 = vs * vs

    # ---- XLA prologue: pack cells, overlay agents, go cell-major. ----------
    cells = _pack(state.grid[..., 0], state.grid[..., 1], state.grid[..., 2])
    if n > 1:
        # Agent overlay in index order, skipping terminated (obs.py:162-173).
        cx = jnp.arange(w, dtype=jnp.int32).reshape(1, w, 1)
        cy = jnp.arange(h, dtype=jnp.int32).reshape(1, 1, h)
        for a in range(n):
            m = (
                (cx == state.agent_pos[:, a, 0].reshape(-1, 1, 1))
                & (cy == state.agent_pos[:, a, 1].reshape(-1, 1, 1))
                & ~state.agent_terminated[:, a].reshape(-1, 1, 1)
            )
            enc = (
                (TYPE_AGENT << 8)
                | (state.agent_color[:, a].astype(jnp.int32) << 4)
                | state.agent_dir[:, a].astype(jnp.int32)
            ).reshape(-1, 1, 1)
            cells = jnp.where(m, enc, cells)

    plane = _pad_packed(cells.reshape(e, w * h).T, w, h, vs)
    stride = _row_stride(h, vs)

    top_x, top_y = get_view_exts(state.agent_dir, state.agent_pos, vs)
    carry_packed = _pack(
        state.agent_carrying[..., 0],
        state.agent_carrying[..., 1],
        state.agent_carrying[..., 2],
    )
    meta = jnp.concatenate([
        (top_x + vs).astype(jnp.int32).T,            # (N, E)
        jnp.maximum(top_y, 0).astype(jnp.int32).T,   # clamped y-crop shift
        state.agent_dir.astype(jnp.int32).T,
        carry_packed.T,
        top_y.astype(jnp.int32).T,                   # raw, for the y mask
    ])  # (5N, E)

    # ---- kernel ------------------------------------------------------------
    block = min(pick_block(w, h, vs, n), e)
    # Compiled mode needs whole 128-lane tiles; the interpreter handles any
    # batch (used by the CPU equality tests).
    assert interpret or supports_batch(e, w, h, vs, n), (
        f'env batch {e} does not tile into {block}-lane kernel blocks '
        '(use VectorEnv, which falls back to the XLA path)')
    kernel = functools.partial(
        _obs_kernel,
        num_agents=n, vs=vs, w=w, h=h,
        see_through_walls=see_through_walls,
    )
    grid_spec = pl.GridSpec(
        grid=(e // block,),
        in_specs=[
            pl.BlockSpec((5 * n, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_plane_rows(w, vs) * stride, block),
                         lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n * v2, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )
    compiler_params = (
        None if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n * v2, e), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=compiler_params,
    )(meta, plane)

    # ---- XLA epilogue: back to env-major images (unpack unless packed). ----
    if packed:
        # Flat cell axis, NOT (vs, vs): a trailing (7, 7) puts both minor
        # dims under the (8, 128) physical tile → ~18x padded HBM footprint,
        # measured 19 GB/s effective touching a (T, E, N, 7, 7) rollout
        # buffer vs 153+ GB/s for the same data with one flat minor axis.
        # Everything downstream (one-hot decode, fused kernels) is
        # cell-order-agnostic, so the training path never pays the tile tax.
        return out.T.reshape(e, n, v2)
    img = jnp.stack([out >> 8, (out >> 4) & 15, out & 15], axis=-1)
    img = img.transpose(1, 0, 2)                   # (E, N*vs², 3)
    return img.reshape(e, n, vs, vs, 3)
