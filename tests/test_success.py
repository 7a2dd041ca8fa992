"""Exact task-completion semantics (``MultiGridEnv.success``).

Pins what ``success_rate`` means per environment family: the episode's
*task* was completed, not the old positive-return proxy (which credited
partial progress, e.g. one unlocked LockedHallway door).
"""

import jax
import jax.numpy as jnp
import numpy as np

from multigrid_tpu.core.actions import Action
from multigrid_tpu.core.constants import STATE_CLOSED, STATE_OPEN
from multigrid_tpu.envs import make
from multigrid_tpu.parallel import VectorEnv


def test_empty_success_is_goal_reach():
    """Empty: success ⇔ an agent terminated on the goal; truncation is not
    success (base any-agent-terminated default)."""
    env = make('MultiGrid-Empty-5x5-v0', agents=1)
    venv = VectorEnv(env, 2, auto_reset=True)
    _, state = venv.reset(jax.random.key(1))
    # Env 0 drives to the goal at (3, 3); env 1 idles.
    for a in [2, 2, 1, 2, 2]:
        actions = jnp.array([[a], [6]], dtype=jnp.int32)
        _, state, rew, term, trunc, done, success = venv.step(state, actions)
    assert bool(done[0]) and bool(success[0])
    assert not bool(done[1]) and not bool(success[1])


def _rbd_state_facing_blue(env, key):
    """Reset a RedBlueDoors env and teleport agent 0 to the cell left of the
    blue door, facing it."""
    _, state = env.reset(key)
    blue = np.asarray(state.extras['blue_pos'])
    pos = state.agent_pos.at[0].set(jnp.asarray([blue[0] - 1, blue[1]]))
    return state.replace(agent_pos=pos, agent_dir=state.agent_dir.at[0].set(0))


def _step(env, state, action):
    order = jnp.arange(env.cfg.num_agents, dtype=jnp.int32)
    acts = jnp.full((env.cfg.num_agents,), int(action), jnp.int32)
    _, state, rew, term, trunc = env.step_with_order(state, acts, order)
    return state, rew, term


def test_redbluedoors_success_requires_red_first():
    """RedBlueDoors: success ⇔ both doors open at episode end. The failure
    branch (blue first) terminates agents too — the predicate must not
    count it."""
    env = make('MultiGrid-RedBlueDoors-6x6-v0', agents=1)

    # Failure path: toggle blue with red still closed. The door opens on the
    # toggle, then post_step fires failure and snaps it shut — all in one
    # step (the reference checks after the base step, redbluedoors.py:175).
    state = _rbd_state_facing_blue(env, jax.random.key(3))
    state, rew, term = _step(env, state, Action.toggle)
    assert bool(jnp.all(term))          # failure terminated the episode...
    assert not bool(env.success(state))  # ...but the task was NOT completed
    assert float(rew.sum()) == 0.0

    # Success path: open red first (set its cell open), then toggle blue.
    state = _rbd_state_facing_blue(env, jax.random.key(3))
    red = np.asarray(state.extras['red_pos'])
    grid = state.grid.at[int(red[0]), int(red[1]), 2].set(STATE_OPEN)
    state = state.replace(grid=grid)
    state, rew, term = _step(env, state, Action.toggle)
    assert bool(jnp.all(term))
    assert bool(env.success(state))
    assert float(rew.sum()) > 0


def test_locked_hallway_success_is_all_doors():
    """LockedHallway: success ⇔ every door unlocked. Partial progress (some
    doors) banks reward but is not success — the exact signal the old
    positive-return proxy over-counted."""
    env = make('MultiGrid-LockedHallway-2Rooms-v0', agents=2)
    _, state = env.reset(jax.random.key(5))
    assert not bool(env.success(state))
    one = state.replace(extras={
        **state.extras,
        'door_unlocked': jnp.asarray([True, False])})
    assert not bool(env.success(one))
    both = state.replace(extras={
        **state.extras,
        'door_unlocked': jnp.asarray([True, True])})
    assert bool(env.success(both))


def test_bup_success_is_termination():
    """BlockedUnlockPickup: agent termination only happens via the box-pickup
    success callback, so the base default is exact."""
    env = make('MultiGrid-BlockedUnlockPickup-v0', agents=2)
    _, state = env.reset(jax.random.key(7))
    assert not bool(env.success(state))
    # The success callback terminates agents (ops/step.py apply_success).
    done_state = state.replace(
        agent_terminated=jnp.ones_like(state.agent_terminated))
    assert bool(env.success(done_state))


def test_vectorenv_success_uses_pre_reset_state():
    """The (E,) success flag is evaluated on the episode's final state, not
    the freshly auto-reset one (where every predicate would read False)."""
    env = make('MultiGrid-Empty-5x5-v0', agents=1)
    venv = VectorEnv(env, 1, auto_reset=True)
    _, state = venv.reset(jax.random.key(1))
    for a in [2, 2, 1, 2, 2]:
        _, state, *_, done, success = venv.step(
            state, jnp.array([[a]], dtype=jnp.int32))
    assert bool(done[0]) and bool(success[0])
    # Post-reset state itself does not satisfy the predicate.
    assert not bool(env.success(jax.tree.map(lambda x: x[0], state)))
