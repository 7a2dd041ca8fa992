"""Scripted tests of the action/interaction semantics (SURVEY.md §2.2).

Uses a custom test environment with a hand-built layout — this also
exercises the user extension path (subclassing MultiGridEnv with a custom
``_gen_grid``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.core.actions import Action
from multigrid_tpu.core.constants import (
    COLOR_BLUE,
    COLOR_RED,
    STATE_CLOSED,
    STATE_LOCKED,
    STATE_OPEN,
    TYPE_BALL,
    TYPE_BOX,
    TYPE_DOOR,
    TYPE_EMPTY,
    TYPE_KEY,
)
from multigrid_tpu.core.state import state_from_numpy
from multigrid_tpu.envs import layout
from multigrid_tpu.envs.env import MultiGridEnv


class ScriptedEnv(MultiGridEnv):
    """7x7 walled room; layout injected per-test."""

    def __init__(self, cells, agent_pos, agent_dir, box_contents=None, **kw):
        kw.setdefault('agents', len(agent_pos))
        super().__init__(grid_size=7, max_steps=100, **kw)
        grid = layout.empty_grid(7, 7)
        layout.wall_rect(grid, 0, 0, 7, 7)
        for (x, y), enc in cells.items():
            grid[x, y] = enc
        self._grid = grid
        self._agent_pos = np.asarray(agent_pos, np.int32)
        self._agent_dir = np.asarray(agent_dir, np.int32)
        self._box_contents = box_contents

    def _gen_grid(self, key):
        extras = {}
        box_c = None
        if self._box_contents is not None:
            box_c = layout.empty_grid(7, 7)
            for (x, y), enc in self._box_contents.items():
                box_c[x, y] = enc
        return state_from_numpy(
            self._grid, self._agent_pos, self._agent_dir, rng=key,
            box_contents=box_c, extras=extras)


def run(env, state, action_seq):
    """Apply a per-agent action sequence; returns final (state, rew, term)."""
    for acts in action_seq:
        order = jnp.arange(env.cfg.num_agents, dtype=jnp.int32)
        obs, state, rew, term, trunc = env.step_with_order(
            state, jnp.asarray(acts, jnp.int32), order)
    return state, rew, term


def test_pickup_drop_cycle():
    env = ScriptedEnv({(2, 1): layout.ball(COLOR_RED)}, [(1, 1)], [0])
    _, state = env.reset(jax.random.PRNGKey(0))
    state, _, _ = run(env, state, [[Action.pickup]])
    assert np.asarray(state.grid)[2, 1, 0] == TYPE_EMPTY
    assert np.asarray(state.agent_carrying[0]).tolist() == [TYPE_BALL, COLOR_RED, 0]

    # Second pickup attempt with full hands: no-op even with object ahead.
    env2 = ScriptedEnv({(2, 1): layout.ball(COLOR_RED)}, [(1, 1)], [0])
    state = state.replace(grid=state.grid.at[2, 1].set(
        jnp.asarray(layout.key(COLOR_BLUE))))
    state, _, _ = run(env, state, [[Action.pickup]])
    assert np.asarray(state.grid)[2, 1, 0] == TYPE_KEY  # still there
    assert np.asarray(state.agent_carrying[0])[0] == TYPE_BALL

    # Drop fails onto occupied cell, succeeds onto empty.
    state, _, _ = run(env, state, [[Action.drop]])
    assert np.asarray(state.agent_carrying[0])[0] == TYPE_BALL
    state, _, _ = run(env, state, [[Action.right], [Action.drop]])  # face down
    assert np.asarray(state.agent_carrying[0])[0] == TYPE_EMPTY
    assert np.asarray(state.grid)[1, 2].tolist() == [TYPE_BALL, COLOR_RED, 0]


def test_drop_blocked_by_agent():
    env = ScriptedEnv({(3, 1): layout.ball(COLOR_RED)}, [(2, 1), (1, 1)],
                      [0, 0])
    _, state = env.reset(jax.random.PRNGKey(0))
    # Agent 0 picks up the ball; agent 1 walks to (2,1)? No — agent 1 faces
    # right at (1,1); after agent 0 picks up, agent 1 can't drop... set up:
    # agent 0 carries, turns around to face agent 1, drop must fail.
    state, _, _ = run(env, state, [[Action.pickup, Action.done]])
    state, _, _ = run(env, state, [[Action.left, Action.done],
                                   [Action.left, Action.done]])
    # agent 0 now faces left toward (1,1) where agent 1 stands
    state, _, _ = run(env, state, [[Action.drop, Action.done]])
    assert np.asarray(state.agent_carrying[0])[0] == TYPE_BALL  # drop blocked
    assert np.asarray(state.grid)[1, 1, 0] == TYPE_EMPTY


def test_locked_door_needs_matching_key():
    cells = {
        (3, 1): layout.door(COLOR_BLUE, STATE_LOCKED),
        (2, 1): layout.key(COLOR_RED),
    }
    env = ScriptedEnv(cells, [(1, 1)], [0])
    _, state = env.reset(jax.random.PRNGKey(0))

    # Toggle locked door with empty hands: stays locked.
    state, _, _ = run(env, state, [[Action.forward], [Action.toggle]])
    # forward blocked by key at (2,1)? Key is not overlappable -> blocked at (1,1)
    assert np.asarray(state.agent_pos[0]).tolist() == [1, 1]
    state, _, _ = run(env, state, [[Action.pickup]])   # pick up red key
    state, _, _ = run(env, state, [[Action.forward], [Action.toggle]])
    assert np.asarray(state.grid)[3, 1, 2] == STATE_LOCKED  # wrong color

    # Swap carried key color to blue: unlock opens the door.
    state = state.replace(agent_carrying=state.agent_carrying.at[0, 1].set(
        COLOR_BLUE))
    state, _, _ = run(env, state, [[Action.toggle]])
    assert np.asarray(state.grid)[3, 1, 2] == STATE_OPEN

    # Toggling an open (unlocked) door closes it, then reopens.
    state, _, _ = run(env, state, [[Action.toggle]])
    assert np.asarray(state.grid)[3, 1, 2] == STATE_CLOSED
    state, _, _ = run(env, state, [[Action.toggle]])
    assert np.asarray(state.grid)[3, 1, 2] == STATE_OPEN

    # Walking through the open door.
    state, _, _ = run(env, state, [[Action.forward], [Action.forward]])
    assert np.asarray(state.agent_pos[0]).tolist() == [4, 1]


def test_box_toggle_reveals_contents():
    cells = {(2, 1): layout.box(COLOR_BLUE)}
    contents = {(2, 1): layout.key(COLOR_RED)}
    env = ScriptedEnv(cells, [(1, 1)], [0], box_contents=contents)
    _, state = env.reset(jax.random.PRNGKey(0))
    state, _, _ = run(env, state, [[Action.toggle]])
    assert np.asarray(state.grid)[2, 1].tolist() == [TYPE_KEY, COLOR_RED, 0]
    assert np.asarray(state.box_contents)[2, 1, 0] == TYPE_EMPTY


def test_box_carried_keeps_contents():
    """Pick up a box, carry it elsewhere, drop it, toggle: contents travel."""
    cells = {(2, 1): layout.box(COLOR_BLUE)}
    contents = {(2, 1): layout.ball(COLOR_RED)}
    env = ScriptedEnv(cells, [(1, 1)], [0], box_contents=contents)
    _, state = env.reset(jax.random.PRNGKey(0))
    seq = [[Action.pickup], [Action.right], [Action.drop], [Action.toggle]]
    state, _, _ = run(env, state, seq)
    # box dropped at (1,2), toggled: ball revealed there
    assert np.asarray(state.grid)[1, 2].tolist() == [TYPE_BALL, COLOR_RED, 0]


def test_empty_box_toggle_clears_cell():
    env = ScriptedEnv({(2, 1): layout.box(COLOR_BLUE)}, [(1, 1)], [0])
    _, state = env.reset(jax.random.PRNGKey(0))
    state, _, _ = run(env, state, [[Action.toggle]])
    assert np.asarray(state.grid)[2, 1, 0] == TYPE_EMPTY


def test_agent_overlap_control():
    # Two agents face each other; forward for both with overlap allowed.
    env = ScriptedEnv({}, [(1, 1), (3, 1)], [0, 2], allow_agent_overlap=True)
    _, state = env.reset(jax.random.PRNGKey(0))
    state, _, _ = run(env, state, [[Action.forward, Action.done]])
    assert np.asarray(state.agent_pos[0]).tolist() == [2, 1]
    state, _, _ = run(env, state, [[Action.done, Action.forward]])
    assert np.asarray(state.agent_pos[1]).tolist() == [2, 1]  # overlap OK

    env = ScriptedEnv({}, [(1, 1), (3, 1)], [0, 2], allow_agent_overlap=False)
    _, state = env.reset(jax.random.PRNGKey(0))
    state, _, _ = run(env, state, [[Action.forward, Action.done]])
    assert np.asarray(state.agent_pos[0]).tolist() == [2, 1]
    state, _, _ = run(env, state, [[Action.done, Action.forward]])
    assert np.asarray(state.agent_pos[1]).tolist() == [3, 1]  # blocked


def test_sequential_conflict_resolution():
    """Two agents race for the same cell: order decides (base.py:399-436)."""
    env = ScriptedEnv({}, [(1, 1), (3, 1)], [0, 2], allow_agent_overlap=False)
    _, state0 = env.reset(jax.random.PRNGKey(0))
    acts = jnp.asarray([Action.forward, Action.forward], jnp.int32)

    _, s_01, *_ = env.step_with_order(
        state0, acts, jnp.asarray([0, 1], jnp.int32))
    assert np.asarray(s_01.agent_pos).tolist() == [[2, 1], [3, 1]]

    _, s_10, *_ = env.step_with_order(
        state0, acts, jnp.asarray([1, 0], jnp.int32))
    assert np.asarray(s_10.agent_pos).tolist() == [[1, 1], [2, 1]]


def test_lava_failure_terminates_without_reward():
    env = ScriptedEnv({(2, 1): layout.LAVA}, [(1, 1)], [0],
                      failure_termination_mode='any')
    _, state = env.reset(jax.random.PRNGKey(0))
    state, rew, term = run(env, state, [[Action.forward]])
    assert bool(term[0])
    assert float(rew[0]) == 0.0
    assert np.asarray(state.agent_pos[0]).tolist() == [2, 1]


def test_terminated_agents_skip_actions():
    env = ScriptedEnv({(2, 1): layout.LAVA}, [(1, 1)], [0],
                      failure_termination_mode='all')
    _, state = env.reset(jax.random.PRNGKey(0))
    state, _, term = run(env, state, [[Action.forward]])
    assert bool(term[0])
    state, _, _ = run(env, state, [[Action.right]])
    assert int(state.agent_dir[0]) == 0  # action skipped, dir unchanged
