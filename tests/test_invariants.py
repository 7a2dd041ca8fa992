"""Property tests: structural invariants under random action fuzzing.

The differential suite proves bit-exactness against the reference on
specific seeds; these properties must hold for ANY trajectory, so they run
on broader random fuzz and would catch state-machine corruption the golden
seeds might miss (SURVEY.md §4 test strategy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.core.constants import (
    STATE_OPEN,
    TYPE_BALL,
    TYPE_BOX,
    TYPE_DOOR,
    TYPE_EMPTY,
    TYPE_FLOOR,
    TYPE_GOAL,
    TYPE_KEY,
    TYPE_LAVA,
    Color,
    Type,
)
from multigrid_tpu.envs import make
from multigrid_tpu.parallel import VectorEnv

ENVS = [
    ('MultiGrid-Empty-8x8-v0', 3),
    ('MultiGrid-BlockedUnlockPickup-v0', 2),
    ('MultiGrid-LockedHallway-2Rooms-v0', 2),
    ('MultiGrid-Playground-v0', 2),
    ('MultiGrid-RedBlueDoors-6x6-v0', 2),
]


def _counts(state):
    """Per-env object tallies: visible + carried + hidden inside boxes."""
    grid_t = np.asarray(state.grid[..., 0])
    box_t = np.asarray(state.box_contents[..., 0])
    carried_t = np.asarray(state.agent_carrying[..., 0])
    carried_box_t = np.asarray(state.agent_carrying_contents[..., 0])

    def tally(t):
        # Box-free envs carry a zero-sized box_contents table (state.py).
        hidden = ((box_t == t) & (grid_t == TYPE_BOX)).sum(axis=(1, 2)) \
            if box_t.size else 0
        return (
            (grid_t == t).sum(axis=(1, 2))
            + (carried_t == t).sum(axis=1)
            # hidden contents count only where a box actually sits / is held
            + hidden
            + ((carried_box_t == t) & (carried_t == TYPE_BOX)).sum(axis=1)
        )

    return {t: tally(t) for t in (TYPE_KEY, TYPE_BALL, TYPE_BOX)}


@pytest.mark.parametrize('env_id,agents', ENVS)
def test_fuzz_invariants(env_id, agents):
    env = make(env_id, agents=agents)
    venv = VectorEnv(env, 8, auto_reset=False)  # conservation needs no resets
    _, state = venv.reset(jax.random.key(17))
    initial = _counts(state)
    rng = np.random.default_rng(17)

    for t in range(60):
        actions = jnp.asarray(
            rng.integers(0, 7, size=(8, agents)), dtype=jnp.int32)
        obs, state, rew, term, trunc, done, success = venv.step(state, actions)

        grid = np.asarray(state.grid)
        # Encoding ranges: every cell holds a valid (type, color, state).
        assert grid[..., 0].min() >= 0 and grid[..., 0].max() < len(Type)
        assert grid[..., 1].min() >= 0 and grid[..., 1].max() < len(Color)
        assert grid[..., 2].min() >= 0 and grid[..., 2].max() <= 2

        # Conservation: keys/balls never appear or vanish; boxes only vanish
        # (toggle replaces a box with its contents, world_object.py:599-605).
        now = _counts(state)
        np.testing.assert_array_equal(now[TYPE_KEY], initial[TYPE_KEY])
        np.testing.assert_array_equal(now[TYPE_BALL], initial[TYPE_BALL])
        assert (now[TYPE_BOX] <= initial[TYPE_BOX]).all()

        # Agents stand in-bounds on walkable cells (their own cell must be
        # empty/goal/floor/lava/open-door — they never enter walls/objects).
        pos = np.asarray(state.agent_pos)
        assert (pos >= 0).all()
        assert (pos[..., 0] < env.width).all() and (pos[..., 1] < env.height).all()
        for e in range(8):
            for a in range(agents):
                tt, _, ss = grid[e, pos[e, a, 0], pos[e, a, 1]]
                assert tt in (
                    TYPE_EMPTY, TYPE_GOAL, TYPE_FLOOR, TYPE_LAVA,
                ) or (tt == TYPE_DOOR and ss == STATE_OPEN), (
                    env_id, t, e, a, (tt, ss))

        # Rewards bounded by the reference reward function; step counter
        # bounded by truncation.
        assert (np.asarray(rew) >= 0).all() and (np.asarray(rew) <= 1).all()
        assert int(state.step_count.max()) <= env.cfg.max_steps


def test_no_agent_overlap_mode():
    """allow_agent_overlap=False: no two agents ever share a cell.

    Uses the Random variant — fixed-start Empty puts every agent on the
    same start cell, which the reference rejects with an assert at reset
    when overlap is disallowed (base.py:283-289).
    """
    env = make('MultiGrid-Empty-Random-6x6-v0', agents=4,
               allow_agent_overlap=False)
    venv = VectorEnv(env, 8, auto_reset=False)
    _, state = venv.reset(jax.random.key(5))
    rng = np.random.default_rng(5)
    for _ in range(60):
        actions = jnp.asarray(rng.integers(0, 7, size=(8, 4)), jnp.int32)
        _, state, *_ = venv.step(state, actions)
        pos = np.asarray(state.agent_pos)
        for e in range(8):
            cells = {tuple(p) for p in pos[e]}
            assert len(cells) == 4, (e, pos[e])


def test_scan_substep_path_matches_unroll():
    """The N>UNROLL_MAX_AGENTS lax.scan sub-step form is bit-identical to
    the unrolled form on the same trajectories (the operating-envelope
    guarantee for large teams: reference accepts any agent count by
    construction, base.py:85-153). Runs a 12-agent team through both forms
    by patching the threshold."""
    from multigrid_tpu.ops import step as step_mod

    def run(key):
        env = make('MultiGrid-Empty-Random-6x6-v0', agents=12, size=16)
        venv = VectorEnv(env, 4, auto_reset=False)
        _, state = venv.reset(key)
        rng = np.random.default_rng(11)
        grids, rews = [], []
        for _ in range(40):
            actions = jnp.asarray(rng.integers(0, 7, size=(4, 12)), jnp.int32)
            _, state, rew, *_ = venv.step(state, actions)
            grids.append(np.asarray(state.grid))
            rews.append(np.asarray(rew))
        return np.stack(grids), np.stack(rews), np.asarray(state.agent_pos)

    key = jax.random.key(3)
    orig = step_mod.UNROLL_MAX_AGENTS
    try:
        step_mod.UNROLL_MAX_AGENTS = 64  # force the unrolled form at N=12
        g_unroll, r_unroll, p_unroll = run(key)
    finally:
        step_mod.UNROLL_MAX_AGENTS = orig
    assert orig < 12  # default routes N=12 through the scan form
    g_scan, r_scan, p_scan = run(key)
    np.testing.assert_array_equal(g_scan, g_unroll)
    np.testing.assert_array_equal(r_scan, r_unroll)
    np.testing.assert_array_equal(p_scan, p_unroll)
