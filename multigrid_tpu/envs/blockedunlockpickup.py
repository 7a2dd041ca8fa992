"""Blocked-unlock-pickup environment
(reference: multigrid/envs/blockedunlockpickup.py:10).

Two rooms joined by a locked door that is blocked by a ball. Agents must move
the ball, fetch the key, unlock the door, and pick up the box in the far room.
Cooperative by default: everyone is rewarded when any agent holds the box.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import (
    Direction,
    STATE_LOCKED,
    TYPE_BALL,
    TYPE_BOX,
    TYPE_DOOR,
    TYPE_KEY,
)
from ..core.state import MultiGridState
from ..ops.step import apply_success
from . import layout
from ..ops.place import set_cell
from .roomgrid import RoomGrid, place_agents_device, place_object_device


class BlockedUnlockPickupEnv(RoomGrid):
    """Pick up the box behind the blocked, locked door
    (envs/blockedunlockpickup.py:104-175).

    Registered: ``MultiGrid-BlockedUnlockPickup-v0``.
    """

    def __init__(
        self,
        room_size: int = 6,
        max_steps: int | None = None,
        joint_reward: bool = True,
        **kwargs,
    ):
        assert room_size >= 4
        super().__init__(
            num_rows=1,
            num_cols=2,
            room_size=room_size,
            max_steps=max_steps or (16 * room_size**2),
            joint_reward=joint_reward,
            success_termination_mode='any',
            **kwargs,
        )

    def mission_of(self, state: MultiGridState) -> str:
        from ..core.constants import Color
        color = Color.from_index(int(state.extras['mission_color'])).value
        return f"pick up the {color} box"

    def mission_index(self, state: MultiGridState):
        """Index into :attr:`mission_space` for batched training: the space
        is the (color, type) product with type 'box' first, so the episode's
        mission index is ``color_index * 2``."""
        return state.extras['mission_color'] * 2

    @property
    def mission_space(self):
        """Missions over (color, object type) — the reference enumerates
        [list(Color), [Type.box, Type.key]] (blockedunlockpickup.py:123-126),
        12 missions, even though only box missions are ever issued."""
        from ..core.constants import Color
        from ..core.mission import MissionSpace
        return MissionSpace(
            mission_func=lambda color, obj_type:
                f"pick up the {color} {obj_type}",
            ordered_placeholders=[[c.value for c in Color], ['box', 'key']],
        )

    def _gen_grid(self, key: jax.Array) -> MultiGridState:
        """On-device layout (envs/blockedunlockpickup.py:142-164): box in the
        right room, locked door between rooms, blocking ball left of the
        door, matching key in the left room, agents in the left room."""
        geom = self.geometry
        rs = geom.room_size
        keys = jax.random.split(key, 7 + self.cfg.num_agents)

        # Agents start at the middle-room center so the reject-next-to filter
        # sees them during object placement (core/roomgrid.py:231-236).
        state = self._init_room_state(key)

        # Box (random color) in the right room.
        box_color = jax.random.randint(keys[0], (), 0, 6, dtype=jnp.int32)
        box_enc = jnp.stack([jnp.int32(TYPE_BOX), box_color, jnp.int32(0)])
        state, _ = place_object_device(
            state, keys[1], box_enc,
            top=geom.room_top(1, 0), size=geom.room_shape, reject_next_to=True)

        # Locked door (random color, random height) on the shared wall.
        door_color = jax.random.randint(keys[2], (), 0, 6, dtype=jnp.int32)
        _, door_x, lo, hi = geom.door_wall_span(0, 0, Direction.right)
        door_y = jax.random.randint(keys[3], (), lo, hi, dtype=jnp.int32)
        door_enc = jnp.stack(
            [jnp.int32(TYPE_DOOR), door_color, jnp.int32(STATE_LOCKED)])
        door_pos = jnp.stack([jnp.int32(door_x), door_y])
        grid = set_cell(state.grid, door_pos, door_enc)

        # Blocking ball (random color) directly left of the door.
        ball_color = jax.random.randint(keys[4], (), 0, 6, dtype=jnp.int32)
        grid = set_cell(
            grid, jnp.stack([jnp.int32(door_x - 1), door_y]),
            jnp.stack([jnp.int32(TYPE_BALL), ball_color, jnp.int32(0)]))
        state = state.replace(grid=grid)

        # Key matching the door color, in the left room.
        key_enc = jnp.stack(
            [jnp.int32(TYPE_KEY), door_color, jnp.int32(0)])
        state, _ = place_object_device(
            state, keys[5], key_enc,
            top=geom.room_top(0, 0), size=geom.room_shape, reject_next_to=True)

        # Agents in the left room (front-cell retry, core/roomgrid.py:373-404).
        state = place_agents_device(
            state, keys[6], top=geom.room_top(0, 0), size=geom.room_shape,
            check_front=True)

        return state.replace(extras={
            'target_enc': box_enc,
            'mission_color': box_color,
        })

    def post_step(self, prev_state, state, actions, rewards, terminations,
                  action_mask):
        """Success when any agent carries the target box
        (envs/blockedunlockpickup.py:166-175). The reference re-fires the
        callback every step while the box is held; replicated faithfully."""
        cfg = self.cfg
        target = state.extras['target_enc']
        reward_value = (
            1.0 - 0.9 * state.step_count.astype(jnp.float32) / cfg.max_steps
        )
        agent_iota = jnp.arange(cfg.num_agents, dtype=jnp.int32)
        for i in range(cfg.num_agents):
            fire = jnp.all(state.agent_carrying[i] == target)
            terminated, rewards = apply_success(
                cfg, agent_iota == i, fire, state.agent_terminated, rewards,
                reward_value)
            state = state.replace(agent_terminated=terminated)
        return state, rewards, state.agent_terminated

    # ------------------------------------------------------------ parity mode

    def _gen_grid_parity(self, G: np.random.Generator) -> dict:
        """Host-side layout consuming draws in reference order
        (envs/blockedunlockpickup.py:142-164)."""
        geom = self.geometry
        data = self._parity_init()
        grid, agent_pos, agent_dir = (
            data['grid'], data['agent_pos'], data['agent_dir'])

        # Box color draw, then rejection placement in right room.
        box_color = int(G.integers(0, 6))
        self._parity_place_in_room(
            G, grid, agent_pos, layout.box(box_color), 1, 0)

        # Door color draw, then random door height (stream A in the reference,
        # the same injected generator here).
        door_color = int(G.integers(0, 6))
        _, door_x, lo, hi = geom.door_wall_span(0, 0, Direction.right)
        door_y = int(G.integers(lo, hi))
        grid[door_x, door_y] = layout.door(door_color, STATE_LOCKED)

        # Blocking ball color draw, direct set.
        ball_color = int(G.integers(0, 6))
        grid[door_x - 1, door_y] = layout.ball(ball_color)

        # Key (door color) in left room.
        self._parity_place_in_room(
            G, grid, agent_pos, layout.key(door_color), 0, 0)

        # Agents in the left room with the front-cell retry.
        for a in range(self.cfg.num_agents):
            self._parity_place_agent_in_room(
                G, grid, agent_pos, agent_dir, a, col=0, row=0)

        return dict(
            grid=grid, agent_pos=agent_pos, agent_dir=agent_dir,
            extras={
                'target_enc': np.asarray(layout.box(box_color)),
                'mission_color': np.int32(box_color),
            },
        )
