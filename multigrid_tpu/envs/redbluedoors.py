"""Red-then-blue doors environment (reference: multigrid/envs/redbluedoors.py:10).

A room with a red door on the left wall and a blue door on the right wall.
Agents must open the red door first, then the blue door; opening the blue
door while the red one is closed is a failure (and the blue door snaps shut).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.actions import Action
from ..core.constants import (
    COLOR_BLUE,
    COLOR_RED,
    DIR_TO_VEC,
    STATE_CLOSED,
    STATE_OPEN,
)
from ..core.state import MultiGridState, init_state
from ..ops.place import set_cell
from ..ops.step import apply_failure, apply_success
from . import layout
from .env import MultiGridEnv
from .roomgrid import place_agents_device


class RedBlueDoorsEnv(MultiGridEnv):
    """Open the red door then the blue door (envs/redbluedoors.py:104-187).

    Registered: ``MultiGrid-RedBlueDoors-{6x6,8x8}-v0``.
    Layout generation is rejection-sampled (doors + agent placement), so
    auto-reset amortizes through the VectorEnv reserve pool.
    """

    mission = "open the red door then the blue door"
    procedural_reset = True
    #: No Box ever appears in these layouts — zero-sized box_contents
    #: table (core/state.py init_state).
    uses_boxes = False

    def __init__(
        self,
        size: int = 8,
        max_steps: int | None = None,
        joint_reward: bool = True,
        success_termination_mode: str = 'any',
        failure_termination_mode: str = 'any',
        **kwargs,
    ):
        self.size = size
        super().__init__(
            width=2 * size,
            height=size,
            max_steps=max_steps or (20 * size**2),
            joint_reward=joint_reward,
            success_termination_mode=success_termination_mode,
            failure_termination_mode=failure_termination_mode,
            **kwargs,
        )
        # Static layout: outer walls + inner room (envs/redbluedoors.py:148-152).
        w, h = self.cfg.width, self.cfg.height
        self.room_top = (w // 4, 0)
        self.room_size = (w // 2, h)
        grid = layout.empty_grid(w, h)
        layout.wall_rect(grid, 0, 0, w, h)
        layout.wall_rect(grid, *self.room_top, *self.room_size)
        self._layout = grid
        self._red_x = self.room_top[0]
        self._blue_x = self.room_top[0] + self.room_size[0] - 1

    def _gen_grid(self, key: jax.Array) -> MultiGridState:
        cfg = self.cfg
        k_agents, k_red, k_blue = jax.random.split(key, 3)
        state = init_state(cfg.width, cfg.height, cfg.num_agents, rng=key,
                           has_boxes=self.uses_boxes)
        state = state.replace(grid=jnp.asarray(self._layout))

        # Agents inside the room, then the two doors at random wall heights
        # (envs/redbluedoors.py:155-168; agents are placed before doors, so
        # door cells are walls during placement).
        state = place_agents_device(
            state, k_agents, top=self.room_top, size=self.room_size)
        red_y = jax.random.randint(k_red, (), 1, cfg.height - 1, dtype=jnp.int32)
        blue_y = jax.random.randint(k_blue, (), 1, cfg.height - 1, dtype=jnp.int32)
        red_pos = jnp.stack([jnp.int32(self._red_x), red_y])
        blue_pos = jnp.stack([jnp.int32(self._blue_x), blue_y])
        grid = set_cell(
            state.grid, red_pos, layout.door(COLOR_RED, STATE_CLOSED))
        grid = set_cell(
            grid, blue_pos, layout.door(COLOR_BLUE, STATE_CLOSED))
        return state.replace(
            grid=grid, extras={'red_pos': red_pos, 'blue_pos': blue_pos})

    def post_step(self, prev_state, state, actions, rewards, terminations,
                  action_mask):
        """Post-step success/failure check (envs/redbluedoors.py:170-187):
        each agent that toggled while facing the (open) blue door succeeds if
        the red door is open, else fails — and the blue door closes again."""
        cfg = self.cfg
        red_pos = state.extras['red_pos']
        blue_pos = state.extras['blue_pos']
        dir_vec = jnp.asarray(DIR_TO_VEC, dtype=jnp.int32)
        reward_value = (
            1.0 - 0.9 * state.step_count.astype(jnp.float32) / cfg.max_steps
        )
        # Door positions are per-env traced values: read/write their cells
        # through one-hot masks, not gathers/scatters (see ops/step.py note).
        cx = jnp.arange(cfg.width, dtype=jnp.int32)[:, None]
        cy = jnp.arange(cfg.height, dtype=jnp.int32)[None, :]
        blue_mask = (cx == blue_pos[0]) & (cy == blue_pos[1])
        red_mask = (cx == red_pos[0]) & (cy == red_pos[1])
        agent_iota = jnp.arange(cfg.num_agents, dtype=jnp.int32)

        def cell_state(mask):
            return jnp.sum(jnp.where(mask, state.grid[..., 2], 0))

        dir4 = jnp.arange(4, dtype=jnp.int32)
        for i in range(cfg.num_agents):  # dict insertion order 0..N-1
            doh = (dir4 == state.agent_dir[i])[:, None]
            fwd = state.agent_pos[i] + jnp.sum(
                jnp.where(doh, dir_vec, 0), axis=0)
            facing_blue = jnp.all(fwd == blue_pos)
            blue_open = cell_state(blue_mask) == STATE_OPEN
            red_open = cell_state(red_mask) == STATE_OPEN
            fire = (
                action_mask[i] & (actions[i] == int(Action.toggle))
                & facing_blue & blue_open
            )
            success = fire & red_open
            failure = fire & ~red_open

            oh = agent_iota == i
            terminated, rewards = apply_success(
                cfg, oh, success, state.agent_terminated, rewards, reward_value)
            terminated = apply_failure(cfg, oh, failure, terminated)
            # Failure closes the blue door again (redbluedoors.py:186).
            # Channel select via iota mask (.at[..., 2].set is a scatter).
            ch2 = jnp.arange(3) == 2
            state = state.replace(
                grid=jnp.where(
                    (failure & blue_mask)[..., None] & ch2,
                    STATE_CLOSED, state.grid),
                agent_terminated=terminated,
            )

        # on_success/on_failure update the returned dict and the agent state
        # identically here, so the final flags are just the agent state.
        return state, rewards, state.agent_terminated

    def success(self, state: MultiGridState) -> jax.Array:
        """Task complete ⇔ both doors are open: the success branch leaves
        red and blue open (envs/redbluedoors.py:177-183), while the failure
        branch snaps the blue door shut again (:186) and truncation never
        opens it — so the end-state predicate is exact. (The base
        any-agent-terminated default is wrong here: failure also sets
        agent termination flags.)"""
        cx = jnp.arange(self.cfg.width, dtype=jnp.int32)[:, None]
        cy = jnp.arange(self.cfg.height, dtype=jnp.int32)[None, :]

        def door_state(pos):
            mask = (cx == pos[0]) & (cy == pos[1])
            return jnp.sum(jnp.where(mask, state.grid[..., 2], 0))

        return (
            (door_state(state.extras['red_pos']) == STATE_OPEN)
            & (door_state(state.extras['blue_pos']) == STATE_OPEN)
        )

    # ------------------------------------------------------------ parity mode

    def _gen_grid_parity(self, G: np.random.Generator) -> dict:
        """Host-side layout consuming draws in reference order
        (envs/redbluedoors.py:139-168)."""
        from .parity import parity_place_agent

        cfg = self.cfg
        grid = self._layout.copy()
        agent_pos = np.full((cfg.num_agents, 2), -1, dtype=np.int32)
        agent_dir = np.full((cfg.num_agents,), -1, dtype=np.int32)

        for a in range(cfg.num_agents):
            _, agent_dir[a] = parity_place_agent(
                G, grid, agent_pos, a, self.room_top, self.room_size)

        red_y = int(G.integers(1, cfg.height - 1))
        blue_y = int(G.integers(1, cfg.height - 1))
        grid[self._red_x, red_y] = layout.door(COLOR_RED, STATE_CLOSED)
        grid[self._blue_x, blue_y] = layout.door(COLOR_BLUE, STATE_CLOSED)

        return dict(
            grid=grid, agent_pos=agent_pos, agent_dir=agent_dir,
            extras={
                'red_pos': np.array([self._red_x, red_y], np.int32),
                'blue_pos': np.array([self._blue_x, blue_y], np.int32),
            },
        )
