"""Playground environment (reference: multigrid/envs/playground.py:8).

A 3×3 room lattice connected by randomly placed doors (``connect_all``) and
strewn with random objects. No rewards; truncation-only termination.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import (
    DIR_TO_VEC,
    Direction,
    NUM_BASE_COLORS,
    STATE_CLOSED,
    TYPE_DOOR,
    TYPE_EMPTY,
    TYPE_KEY,
)
from ..core.state import MultiGridState
from . import layout
from .roomgrid import (
    RoomGrid,
    front_ok_mask,
    next_to_agent_mask,
)


class PlaygroundEnv(RoomGrid):
    """Rooms, random doors, random objects, no goals
    (envs/playground.py:52-137). Registered: ``MultiGrid-Playground-v0``.
    """

    mission = ""

    def __init__(
        self,
        room_size: int = 7,
        num_rows: int = 3,
        num_cols: int = 3,
        max_steps: int = 100,
        **kwargs,
    ):
        super().__init__(
            room_size=room_size,
            num_rows=num_rows,
            num_cols=num_cols,
            max_steps=max_steps,
            **kwargs,
        )
        geom = self.geometry
        # Static tables for the on-device connect_all loop.
        self._has_neighbor = np.zeros(
            (geom.num_cols, geom.num_rows, 4), dtype=bool)
        for c in range(geom.num_cols):
            for r in range(geom.num_rows):
                for d in range(4):
                    self._has_neighbor[c, r, d] = geom.has_neighbor(c, r, d)
        self._room_tops = np.array(
            [[geom.room_top(c, r) for r in range(geom.num_rows)]
             for c in range(geom.num_cols)],
            dtype=np.int32,
        )

    # ------------------------------------------------------- device-side gen

    def _slot_tables(self):
        """Static tables for connect_all: interior walls and door slots.

        Every interior wall gets an id; a door proposal maps to slot
        ``wall_id * (room_size - 2) + (offset - 1)`` whose grid cell is a
        static position — so accepted doors render to the grid with static
        (free) indexed writes instead of per-env scatters.
        """
        geom = self.geometry
        C, R, rs = geom.num_cols, geom.num_rows, geom.room_size
        wall_id = np.full((C, R, 4), -1, dtype=np.int32)
        positions = []
        wid = 0
        for c in range(C):
            for r in range(R):
                for d, (nc, nr) in ((0, (c + 1, r)), (1, (c, r + 1))):
                    if not geom.has_neighbor(c, r, d):
                        continue
                    wall_id[c, r, d] = wid
                    wall_id[nc, nr, (d + 2) % 4] = wid
                    top = geom.room_top(c, r)
                    for off in range(1, rs - 1):
                        if d == 0:       # right wall
                            positions.append((top[0] + rs - 1, top[1] + off))
                        else:            # bottom wall
                            positions.append((top[0] + off, top[1] + rs - 1))
                    wid += 1
        return wall_id, np.asarray(positions, dtype=np.int32), wid

    def _connect_all_device(self, grid: jax.Array, key: jax.Array,
                            max_itrs: int = 256):
        """On-device equivalent of ``connect_all`` (core/roomgrid.py:406-452):
        keep adding doors between random room pairs until every room is
        reachable from room (0, 0).

        Fully vectorized — no loop at all. The sequential semantics
        ("accept proposal k iff its wall is fresh and the rooms are not yet
        connected by proposals < k") are recovered exactly from batched
        draws: connectivity is monotone in the door set, so the first
        connected prefix index k* is computed by evaluating reachability on
        all cumulative prefixes at once, and proposal k is accepted iff
        k <= k*. Accepted doors render through static per-wall slots.
        """
        geom = self.geometry
        C, R = geom.num_cols, geom.num_rows
        rs = geom.room_size
        K = max_itrs
        has_nb = jnp.asarray(self._has_neighbor)
        dvec = jnp.asarray(DIR_TO_VEC, dtype=jnp.int32)
        wall_id_np, slot_pos, num_walls = self._slot_tables()
        wall_id = jnp.asarray(wall_id_np)
        offs_per_wall = rs - 2
        num_slots = num_walls * offs_per_wall

        # Batched proposal draws.
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        cols = jax.random.randint(k1, (K,), 0, C, dtype=jnp.int32)
        rows = jax.random.randint(k2, (K,), 0, R, dtype=jnp.int32)
        ds = jax.random.randint(k3, (K,), 0, 4, dtype=jnp.int32)
        colors = jax.random.randint(k4, (K,), 0, NUM_BASE_COLORS, jnp.int32)
        offsets = jax.random.randint(k5, (K,), 1, rs - 1, dtype=jnp.int32)

        ci = jnp.arange(C, dtype=jnp.int32)[None, :, None, None]
        ri = jnp.arange(R, dtype=jnp.int32)[None, None, :, None]
        di = jnp.arange(4, dtype=jnp.int32)[None, None, None, :]
        here = (
            (ci == cols[:, None, None, None])
            & (ri == rows[:, None, None, None])
            & (di == ds[:, None, None, None])
        )  # (K, C, R, 4)
        ncols = cols + jnp.sum(
            jnp.where(di[0, 0, 0] == ds[:, None], dvec[None, :, 0], 0), axis=1)
        nrows = rows + jnp.sum(
            jnp.where(di[0, 0, 0] == ds[:, None], dvec[None, :, 1], 0), axis=1)
        there = (
            (ci == ncols[:, None, None, None])
            & (ri == nrows[:, None, None, None])
            & (di == ((ds[:, None, None, None] + 2) % 4))
        )

        wid = jnp.sum(jnp.where(here, wall_id[None], 0), axis=(1, 2, 3))
        has_wall = jnp.any(here & has_nb[None], axis=(1, 2, 3))  # (K,)
        # First valid proposal per wall wins (later ones hit an existing
        # door in the sequential loop).
        occ = (
            (jnp.arange(num_walls, dtype=jnp.int32)[None, :] == wid[:, None])
            & has_wall[:, None]
        )  # (K, num_walls)
        fresh = occ & (jnp.cumsum(occ.astype(jnp.int32), axis=0) == 1)
        valid = jnp.any(fresh, axis=1)  # (K,)

        # Connectivity only changes when a NEW wall is accepted (at most
        # num_walls times), so reachability is evaluated per accepted-wall
        # COUNT (num_walls + 1 small prefixes) instead of per proposal (K
        # large prefixes) — exact, and ~K/num_walls less work.
        rank = jnp.cumsum(valid.astype(jnp.int32))          # (K,) 1-based
        W1 = num_walls + 1
        # Acceptance rank of each wall (num_walls+1 if never proposed):
        # its fresh proposal's rank.
        wall_rank = jnp.sum(
            jnp.where(fresh, rank[:, None], 0), axis=0)
        wall_rank = jnp.where(wall_rank == 0, num_walls + 1, wall_rank)
        # Each wall's (C, R, 4) edge pair is a static table.
        wall_edges = np.zeros((num_walls, C, R, 4), dtype=bool)
        for c in range(C):
            for r in range(R):
                for d in range(4):
                    w = int(wall_id_np[c, r, d])
                    if w >= 0:
                        wall_edges[w, c, r, d] = True
        # Door set after the first w accepted walls, for w = 0..num_walls.
        incl = (
            wall_rank[None, :]
            <= jnp.arange(W1, dtype=jnp.int32)[:, None]
        )  # (W1, num_walls)
        doors_by_count = jnp.any(
            incl[..., None, None, None] & jnp.asarray(wall_edges)[None],
            axis=1,
        )  # (W1, C, R, 4)

        reach = jnp.broadcast_to(
            (jnp.arange(C)[:, None] == 0) & (jnp.arange(R)[None, :] == 0),
            (W1, C, R),
        )
        for _ in range(C * R - 1):
            spread = reach
            spread = spread | jnp.pad(
                (reach & doors_by_count[..., 0])[:, :-1, :],
                ((0, 0), (1, 0), (0, 0)))
            spread = spread | jnp.pad(
                (reach & doors_by_count[..., 1])[:, :, :-1],
                ((0, 0), (0, 0), (1, 0)))
            spread = spread | jnp.pad(
                (reach & doors_by_count[..., 2])[:, 1:, :],
                ((0, 0), (0, 1), (0, 0)))
            spread = spread | jnp.pad(
                (reach & doors_by_count[..., 3])[:, :, 1:],
                ((0, 0), (0, 0), (0, 1)))
            reach = spread
        connected_by_count = jnp.all(reach, axis=(1, 2))  # (W1,)
        # Smallest wall count that connects everything; if none within the
        # proposal cap, accept every valid proposal. 256 proposals leave a
        # given interior wall door-less with p = (34/36)^256 ~ 5e-7 (the
        # reference bounds at 5000 tries and raises, roomgrid.py:426,451).
        wstar = jnp.where(
            jnp.any(connected_by_count),
            jnp.argmax(connected_by_count),
            jnp.int32(num_walls),
        )
        # Sequential semantics: proposal k accepted iff valid and not yet
        # connected before it, i.e. its rank is <= wstar.
        accepted = valid & (rank <= wstar)

        # Render through static slots (walls are unique among accepted, so
        # there are no slot collisions).
        slots_k = wid * offs_per_wall + (offsets - 1)
        slot_hit = (
            jnp.arange(num_slots, dtype=jnp.int32)[None, :] == slots_k[:, None]
        ) & accepted[:, None]
        slot_vals = jnp.sum(
            slot_hit.astype(jnp.int32) * (colors[:, None] + 1), axis=0)

        # One fused select over the whole grid: expand the per-slot packed
        # values onto their static cells with a constant (num_slots, W, H)
        # indicator built host-side — no per-slot writes at all.
        W, H = self.cfg.width, self.cfg.height
        slot_cells = np.zeros((num_slots, W, H), dtype=bool)
        for sidx in range(num_slots):
            slot_cells[sidx, slot_pos[sidx, 0], slot_pos[sidx, 1]] = True
        cell_val = jnp.sum(
            jnp.asarray(slot_cells, jnp.int32) * slot_vals[:, None, None],
            axis=0,
        )  # (W, H): color+1 where a door landed, else 0
        door_cell = jnp.stack([
            jnp.full((W, H), TYPE_DOOR, jnp.int32),
            cell_val - 1,
            jnp.full((W, H), STATE_CLOSED, jnp.int32),
        ], axis=-1)
        return jnp.where((cell_val > 0)[..., None], door_cell, grid)

    def _gen_grid(self, key: jax.Array) -> MultiGridState:
        """On-device layout (envs/playground.py:121-137): connect all rooms,
        scatter 12 random objects, place agents anywhere (front-cell retry).

        Structured to minimize sequential kernel count on the per-step
        auto-reset path: loop-invariant masks (next-to-agent rejection,
        front-cell predicate, the empty-cell base mask) are computed once,
        each placement only ANDs its cell out of an incrementally maintained
        validity mask, and object writes accumulate in a packed per-cell
        value merged into the grid in one pass. Distribution is unchanged
        (uniform over the valid set at each sequential placement, exactly as
        the reference's rejection loops)."""
        geom = self.geometry
        cfg = self.cfg
        rs = geom.room_size
        W, H = cfg.width, cfg.height
        k_connect, k_objs, k_agents = jax.random.split(key, 3)

        state = self._init_room_state(key)
        grid = self._connect_all_device(state.grid, k_connect)

        # Batched draws for the 12 objects (playground.py:130-133).
        kc, kr, kk, kcol, kp = jax.random.split(k_objs, 5)
        cols = jax.random.randint(kc, (12,), 0, geom.num_cols, jnp.int32)
        rows = jax.random.randint(kr, (12,), 0, geom.num_rows, jnp.int32)
        kinds = TYPE_KEY + jax.random.randint(kk, (12,), 0, 3, jnp.int32)
        colors = jax.random.randint(kcol, (12,), 0, NUM_BASE_COLORS, jnp.int32)
        prio = jax.random.bits(kp, (12, W, H), dtype=jnp.uint32)

        # Room rectangles straight from the drawn (col, row): top corner is
        # affine in the draw, so each rect is four comparisons — no big
        # one-hot-over-rooms intermediates.
        gx = jnp.arange(W, dtype=jnp.int32)[None, :, None]
        gy = jnp.arange(H, dtype=jnp.int32)[None, None, :]
        tx = (cols * (rs - 1))[:, None, None]
        ty = (rows * (rs - 1))[:, None, None]
        rect = (
            (gx >= tx) & (gx < tx + rs) & (gy >= ty) & (gy < ty + rs)
        )  # (12, W, H)

        # Base validity: empty cell, not adjacent to an agent (agents sit at
        # the middle-room center during object placement). Maintained
        # incrementally as objects land.
        valid = (grid[..., 0] == TYPE_EMPTY) & ~next_to_agent_mask(
            state.agent_pos, W, H)
        placed = jnp.zeros((W, H), jnp.int32)  # packed kind<<4|color, +1
        flat_iota = jnp.arange(W * H, dtype=jnp.int32)
        for i in range(12):
            g = jnp.where(valid & rect[i],
                          (prio[i] >> 1) | jnp.uint32(1 << 31), jnp.uint32(0))
            oh = (flat_iota == jnp.argmax(g.reshape(-1))).reshape(W, H)
            packed = ((kinds[i] << 4) | colors[i]) + 1
            placed = jnp.where(oh, packed, placed)
            valid = valid & ~oh
        obj_cell = jnp.stack([
            (placed - 1) >> 4, (placed - 1) & 15, jnp.zeros_like(placed),
        ], axis=-1)
        grid = jnp.where((placed > 0)[..., None], obj_cell, grid)
        state = state.replace(grid=grid)

        # Agents: random room, uniform valid (pos, dir) with the front-cell
        # predicate (core/roomgrid.py:373-404). The grid is final now, so the
        # front-cell mask is loop-invariant; placed agents (and the shared
        # middle-center cell holding the still-unplaced ones) block cells
        # through the same incremental mask.
        kar, kap = jax.random.split(k_agents)
        acols = jax.random.randint(
            kar, (cfg.num_agents, 2), 0,
            jnp.asarray([geom.num_cols, geom.num_rows]), dtype=jnp.int32)
        aprio = jax.random.bits(
            kap, (cfg.num_agents, W, H, 4), dtype=jnp.uint32)
        front_ok = front_ok_mask(grid)  # (W, H, 4)
        mid = jnp.asarray(geom.middle_pos(), dtype=jnp.int32)
        mid_oh = (
            (jnp.arange(W, dtype=jnp.int32)[:, None] == mid[0])
            & (jnp.arange(H, dtype=jnp.int32)[None, :] == mid[1])
        )
        atx = (acols[:, 0] * (rs - 1))[:, None, None]
        aty = (acols[:, 1] * (rs - 1))[:, None, None]
        arect = (
            (gx >= atx) & (gx < atx + rs) & (gy >= aty) & (gy < aty + rs)
        )  # (N, W, H)
        flat_iota4 = jnp.arange(W * H * 4, dtype=jnp.int32)
        agent_pos = state.agent_pos
        agent_dir = state.agent_dir
        taken = jnp.zeros((W, H), jnp.bool_)
        for a in range(cfg.num_agents):
            # Unplaced agents (> a) still occupy the middle-center cell.
            others_at_mid = mid_oh if a < cfg.num_agents - 1 \
                else jnp.zeros_like(mid_oh)
            vpos = valid & arect[a] & ~taken & ~others_at_mid
            v4 = vpos[:, :, None] & front_ok
            g = jnp.where(v4, (aprio[a] >> 1) | jnp.uint32(1 << 31),
                          jnp.uint32(0))
            flat = jnp.argmax(g.reshape(-1))
            oh4 = (flat_iota4 == flat).reshape(W, H, 4)
            pos = jnp.stack([flat // (H * 4), (flat // 4) % H]).astype(jnp.int32)
            dirn = (flat % 4).astype(jnp.int32)
            taken = taken | jnp.any(oh4, axis=-1)
            sel = jnp.arange(cfg.num_agents, dtype=jnp.int32) == a
            agent_pos = jnp.where(sel[:, None], pos[None, :], agent_pos)
            agent_dir = jnp.where(sel, dirn, agent_dir)
        return state.replace(agent_pos=agent_pos, agent_dir=agent_dir)

    # ------------------------------------------------------------ parity mode

    def _gen_grid_parity(self, G: np.random.Generator) -> dict:
        """Host-side layout consuming draws in reference order
        (playground.py:121-137 + core/roomgrid.py:406-452)."""
        geom = self.geometry
        data = self._parity_init()
        grid, agent_pos, agent_dir = (
            data['grid'], data['agent_pos'], data['agent_dir'])

        # connect_all (core/roomgrid.py:406-452): BFS reachability + random
        # door insertion; doors are never locked here so the locked-room skip
        # can't fire.
        doors = np.zeros((geom.num_cols, geom.num_rows, 4), dtype=bool)

        def all_reachable():
            seen = {(0, 0)}
            stack = [(0, 0)]
            while stack:
                c, r = stack.pop()
                for d in range(4):
                    if doors[c, r, d]:
                        nb = geom.neighbor(c, r, d)
                        if nb not in seen:
                            seen.add(nb)
                            stack.append(nb)
            return len(seen) == geom.num_rows * geom.num_cols

        for _ in range(5000):
            if all_reachable():
                break
            col = int(G.integers(0, geom.num_cols))
            row = int(G.integers(0, geom.num_rows))
            d = int(G.integers(0, 4))  # _rand_elem(Direction)
            if not geom.has_neighbor(col, row, d) or doors[col, row, d]:
                continue
            color = int(G.integers(0, NUM_BASE_COLORS))
            # add_door with rand_pos=True: position drawn from the gym stream
            # (the same injected G) via set_door_pos (core/roomgrid.py:324).
            axis, fixed, lo, hi = geom.door_wall_span(col, row, d)
            v = int(G.integers(lo, hi))
            pos = (fixed, v) if axis == 'x' else (v, fixed)
            grid[pos[0], pos[1]] = layout.door(color, STATE_CLOSED)
            doors[col, row, d] = True
            nc, nr = geom.neighbor(col, row, d)
            doors[nc, nr, (d + 2) % 4] = True
        else:
            raise RecursionError('connect_all failed')

        # 12 random objects (playground.py:130-133): col/row, then kind, then
        # color, then rejection placement with the next-to-agent filter.
        for _ in range(12):
            col = int(G.integers(0, geom.num_cols))
            row = int(G.integers(0, geom.num_rows))
            kind = TYPE_KEY + int(G.integers(0, 3))
            color = int(G.integers(0, NUM_BASE_COLORS))
            self._parity_place_in_room(
                G, grid, agent_pos, layout.encode(kind, color), col, row)

        for a in range(self.cfg.num_agents):
            self._parity_place_agent_in_room(G, grid, agent_pos, agent_dir, a)

        return dict(grid=grid, agent_pos=agent_pos, agent_dir=agent_dir)
