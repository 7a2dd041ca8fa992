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
    TYPE_KEY,
)
from ..core.state import MultiGridState
from ..ops.place import place_obj_mask, set_cell
from . import layout
from .roomgrid import (
    RoomGrid,
    front_ok_mask,
    next_to_agent_mask,
    uniform_pos_dir,
)
from ..ops.place import uniform_position


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
                            max_itrs: int = 96):
        """On-device equivalent of ``connect_all`` (core/roomgrid.py:406-452):
        keep adding doors between random room pairs until every room is
        reachable from room (0, 0).

        Structured for TPU: the proposal loop is a ``lax.scan`` touching only
        lattice-sized arrays ((C, R, 4) doors, per-wall-slot door values);
        accepted doors render to the grid afterwards with static-index
        writes. The grid never enters the loop carry — the earlier
        while_loop formulation re-selected the full (W, H, 3) grid every
        iteration and cost ~100× more.
        """
        geom = self.geometry
        C, R = geom.num_cols, geom.num_rows
        rs = geom.room_size
        has_nb = jnp.asarray(self._has_neighbor)
        dvec = jnp.asarray(DIR_TO_VEC, dtype=jnp.int32)
        wall_id_np, slot_pos, num_walls = self._slot_tables()
        wall_id = jnp.asarray(wall_id_np)
        offs_per_wall = rs - 2
        num_slots = num_walls * offs_per_wall

        ci = jnp.arange(C, dtype=jnp.int32)[:, None, None]
        ri = jnp.arange(R, dtype=jnp.int32)[None, :, None]
        di = jnp.arange(4, dtype=jnp.int32)[None, None, :]
        slot_iota = jnp.arange(num_slots, dtype=jnp.int32)

        def reachable(doors):
            reach = jnp.zeros((C, R), dtype=jnp.bool_).at[0, 0].set(True)
            for _ in range(C * R):
                spread = reach
                # right: door (c,r,0) connects (c,r) <-> (c+1,r), etc.
                spread = spread | jnp.pad(
                    (reach & doors[..., 0])[:-1, :], ((1, 0), (0, 0)))
                spread = spread | jnp.pad(
                    (reach & doors[..., 1])[:, :-1], ((0, 0), (1, 0)))
                spread = spread | jnp.pad(
                    (reach & doors[..., 2])[1:, :], ((0, 1), (0, 0)))
                spread = spread | jnp.pad(
                    (reach & doors[..., 3])[:, 1:], ((0, 0), (0, 1)))
                reach = spread
            return reach

        def body(carry, ks):
            doors, slots, connected = carry
            k1, k2, k3, k4, k5 = ks
            col = jax.random.randint(k1, (), 0, C, dtype=jnp.int32)
            row = jax.random.randint(k2, (), 0, R, dtype=jnp.int32)
            d = jax.random.randint(k3, (), 0, 4, dtype=jnp.int32)
            color = jax.random.randint(k4, (), 0, NUM_BASE_COLORS, jnp.int32)
            offset = jax.random.randint(k5, (), 1, rs - 1, dtype=jnp.int32)

            here = (ci == col) & (ri == row) & (di == d)
            # The while-loop form checks connectivity BEFORE each proposal.
            ok = (
                jnp.any(here & has_nb)
                & ~jnp.any(here & doors)
                & ~connected
            )
            wid = jnp.sum(jnp.where(here, wall_id, 0))
            slot = wid * offs_per_wall + (offset - 1)
            # Last write wins on slot collisions, matching the in-place
            # overwrite order of the reference loop.
            slots = jnp.where((slot_iota == slot) & ok, color + 1, slots)

            ncol = col + jnp.sum(jnp.where(di[0, 0] == d, dvec[:, 0], 0))
            nrow = row + jnp.sum(jnp.where(di[0, 0] == d, dvec[:, 1], 0))
            there = (ci == ncol) & (ri == nrow) & (di == (d + 2) % 4)
            doors = doors | ((here | there) & ok)
            connected = jnp.all(reachable(doors))
            return (doors, slots, connected), None

        doors0 = jnp.zeros((C, R, 4), dtype=jnp.bool_)
        slots0 = jnp.zeros((num_slots,), dtype=jnp.int32)  # 0 = no door
        # Scan over raw key data (typed keys don't stack into scan xs).
        raw = jax.random.key_data(
            jax.random.split(key, 5 * max_itrs)).reshape(max_itrs, 5, -1)

        def body_raw(carry, kraw):
            ks = tuple(jax.random.wrap_key_data(kraw[i]) for i in range(5))
            return body(carry, ks)

        (doors, slots, _), _ = jax.lax.scan(
            body_raw, (doors0, slots0, jnp.bool_(False)), raw)

        # Render accepted doors: every slot has a STATIC grid position.
        for sidx in range(num_slots):
            x, y = int(slot_pos[sidx, 0]), int(slot_pos[sidx, 1])
            val = slots[sidx]
            cell = jnp.where(
                val > 0,
                jnp.stack([jnp.int32(TYPE_DOOR), val - 1,
                           jnp.int32(STATE_CLOSED)]),
                grid[x, y],
            )
            grid = grid.at[x, y].set(cell)
        return grid

    def _gen_grid(self, key: jax.Array) -> MultiGridState:
        """On-device layout (envs/playground.py:121-137): connect all rooms,
        scatter 12 random objects, place agents anywhere (front-cell retry)."""
        geom = self.geometry
        cfg = self.cfg
        rs = geom.room_size
        k_connect, k_objs, k_agents = jax.random.split(key, 3)

        state = self._init_room_state(key)
        grid = self._connect_all_device(state.grid, k_connect)
        state = state.replace(grid=grid)

        # 12 random objects in random rooms (playground.py:130-133):
        # kind ∈ {key, ball, box}, random color, next-to-agent rejection.
        obj_keys = jax.random.split(k_objs, 12)
        room_tops = jnp.asarray(self._room_tops)
        for i in range(12):
            kc, kr, kk, kcol, kp = jax.random.split(obj_keys[i], 5)
            col = jax.random.randint(kc, (), 0, geom.num_cols, jnp.int32)
            row = jax.random.randint(kr, (), 0, geom.num_rows, jnp.int32)
            kind = TYPE_KEY + jax.random.randint(kk, (), 0, 3, jnp.int32)
            color = jax.random.randint(kcol, (), 0, NUM_BASE_COLORS, jnp.int32)
            top = room_tops[col, row]
            valid = place_obj_mask(
                state.grid, state.agent_pos, top, (rs, rs))
            valid = valid & ~next_to_agent_mask(
                state.agent_pos, cfg.width, cfg.height)
            pos = uniform_position(kp, valid)
            state = state.replace(grid=set_cell(state.grid, pos, 
                jnp.stack([kind, color, jnp.int32(0)])))

        # Agents: random room, then uniform valid (pos, dir) with the
        # front-cell predicate (core/roomgrid.py:373-404).
        agent_keys = jax.random.split(k_agents, cfg.num_agents)
        for a in range(cfg.num_agents):
            kc, kr, kp = jax.random.split(agent_keys[a], 3)
            col = jax.random.randint(kc, (), 0, geom.num_cols, jnp.int32)
            row = jax.random.randint(kr, (), 0, geom.num_rows, jnp.int32)
            top = room_tops[col, row]
            valid_pos = place_obj_mask(
                state.grid, state.agent_pos, top, (rs, rs))
            valid = valid_pos[:, :, None] & front_ok_mask(state.grid)
            pos, dirn = uniform_pos_dir(kp, valid)
            state = state.replace(
                agent_pos=state.agent_pos.at[a].set(pos),
                agent_dir=state.agent_dir.at[a].set(dirn),
            )
        return state

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
