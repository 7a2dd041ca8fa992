"""Component tests: RoomGrid builders, missions, checkpointing, rendering."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from multigrid_tpu.core.constants import (
    STATE_LOCKED,
    TYPE_BALL,
    TYPE_BOX,
    TYPE_DOOR,
    TYPE_KEY,
    Type,
)
from multigrid_tpu.core.mission import Mission, MissionSpace
from multigrid_tpu.envs import make
from multigrid_tpu.envs.roomgrid import RoomGrid
from multigrid_tpu.parallel import VectorEnv


class _TwoRooms(RoomGrid):
    """Minimal custom env exercising the public builder API."""

    def __init__(self, **kwargs):
        super().__init__(room_size=5, num_rows=1, num_cols=2, **kwargs)

    def _gen_grid(self, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        state = self._init_room_state(key)
        state, _ = self.add_object(state, k1, 0, 0, TYPE_BALL, 2)
        state, door_pos = self.add_door(
            state, k2, 0, 0, 0, color=3, locked=True)
        state = self.place_agents_in_room(state, k3, 0, 0)
        state = self.add_distractors(state, k4, num_distractors=2)
        return state


def test_roomgrid_builders():
    env = _TwoRooms(agents=2)
    obs, state = env.reset(jax.random.key(0))
    grid = np.asarray(state.grid)
    types = grid[..., 0]
    # The locked door sits on the shared wall column (x = room_size - 1 = 4).
    door_cells = np.argwhere(types == TYPE_DOOR)
    assert len(door_cells) == 1 and door_cells[0][0] == 4
    assert grid[door_cells[0][0], door_cells[0][1], 2] == STATE_LOCKED
    # Ball + 2 distractors present.
    n_objects = sum(
        (types == t).sum() for t in (TYPE_BALL, TYPE_KEY, TYPE_BOX))
    assert n_objects == 3
    # Agents placed inside the left room.
    pos = np.asarray(state.agent_pos)
    assert (pos[:, 0] >= 1).all() and (pos[:, 0] <= 3).all()
    # And it steps + batches.
    venv = VectorEnv(env, 4)
    _, vstate = venv.reset(jax.random.key(1))
    venv.step(vstate, jnp.zeros((4, 2), jnp.int32))


def test_mission_space():
    space = MissionSpace(
        mission_func=lambda color, kind: f"pick up the {color} {kind}",
        ordered_placeholders=[['red', 'green'], ['ball', 'box']])
    assert len(space) == 4
    m = space.get('green', 'box')
    assert str(m) == 'pick up the green box' and m.index == 3
    assert space[m.index] == m
    space.seed(0)
    assert space.contains(space.sample())
    single = MissionSpace.from_string('do the thing')
    assert len(single) == 1 and str(single.sample()) == 'do the thing'


def test_env_mission_strings():
    env = make('MultiGrid-BlockedUnlockPickup-v0', agents=2)
    _, state = env.reset(jax.random.key(0))
    mission = env.mission_of(state)
    assert mission.startswith('pick up the ') and mission.endswith(' box')
    # 6 colors × {box, key} — matching the reference's placeholder product
    # (blockedunlockpickup.py:123-126).
    assert len(env.mission_space) == 12
    # The issued mission resolves to an index within the space.
    from multigrid_tpu.adapters import GymAdapter
    genv = GymAdapter(env)
    obs, _ = genv.reset(seed=0)
    m = obs[0]['mission']
    assert str(env.mission_space[m.index]) == str(m)


def test_checkpoint_roundtrip(tmp_path):
    from multigrid_tpu.utils.checkpoint import (
        latest_checkpoint, restore_checkpoint, save_checkpoint)
    env = make('MultiGrid-Empty-5x5-v0', agents=2)
    venv = VectorEnv(env, 4)
    _, state = venv.reset(jax.random.key(0))
    _, state, *_ = venv.step(state, jnp.zeros((4, 2), jnp.int32))

    path = save_checkpoint(os.path.join(tmp_path, 'step_5'), state)
    assert latest_checkpoint(tmp_path) == path
    _, fresh = venv.reset(jax.random.key(9))
    restored = restore_checkpoint(path, fresh)
    np.testing.assert_array_equal(np.asarray(restored.grid),
                                  np.asarray(state.grid))
    np.testing.assert_array_equal(np.asarray(restored.step_count),
                                  np.asarray(state.step_count))
    # Restored state steps identically to the original.
    acts = jnp.ones((4, 2), jnp.int32)
    _, s1, r1, *_ = venv.step(state, acts)
    _, s2, r2, *_ = venv.step(restored, acts)
    np.testing.assert_array_equal(np.asarray(s1.grid), np.asarray(s2.grid))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_restore_params_across_optimizer_configs(tmp_path):
    """restore_params reads only the params subtree of a TrainState
    checkpoint — a checkpoint trained with --lr-anneal (schedule wraps
    adam, different opt_state pytree) must restore into an eval-side init
    built with a constant lr, and shape mismatches must fail loudly."""
    import optax
    import pytest
    from multigrid_tpu.learn import PPOConfig, ppo_init
    from multigrid_tpu.utils.checkpoint import restore_params, save_checkpoint
    venv = VectorEnv(make('MultiGrid-Empty-5x5-v0', agents=2), 4,
                     packed_obs=True)
    state, net, config, tx = ppo_init(
        venv, jax.random.key(0), config=PPOConfig(rollout_steps=2),
        net_kwargs=dict(encoder='mlp', hidden=16),
        lr_schedule=optax.linear_schedule(3e-4, 0.0, 10))
    path = save_checkpoint(os.path.join(tmp_path, 'step_1'), state)

    # Eval-side init: constant lr → different opt_state structure.
    fresh, _, _, _ = ppo_init(
        venv, jax.random.key(1), config=PPOConfig(rollout_steps=2),
        net_kwargs=dict(encoder='mlp', hidden=16))
    params = restore_params(path, fresh.params)
    for got, want in zip(jax.tree.leaves(params),
                         jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # Wrong architecture fails loudly, not with silent garbage.
    wrong, _, _, _ = ppo_init(
        venv, jax.random.key(1), config=PPOConfig(rollout_steps=2),
        net_kwargs=dict(encoder='mlp', hidden=32))
    with pytest.raises(ValueError, match='mismatch'):
        restore_params(path, wrong.params)


def test_render_frame():
    from multigrid_tpu.render import render_state
    env = make('MultiGrid-RedBlueDoors-6x6-v0', agents=2)
    _, state = env.reset(jax.random.key(3))
    frame = render_state(env, state, tile_size=16)
    assert frame.shape == (6 * 16, 12 * 16, 3) and frame.dtype == np.uint8
    assert frame.sum() > 0
    # Highlighting off still renders.
    frame2 = render_state(env, state, highlight=False, tile_size=8)
    assert frame2.shape == (6 * 8, 12 * 8, 3)
