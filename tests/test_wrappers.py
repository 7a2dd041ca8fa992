"""Observation wrappers (reference: multigrid/wrappers.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from multigrid_tpu.core.constants import TYPE_AGENT, TYPE_GOAL, TYPE_WALL
from multigrid_tpu.envs import make
from multigrid_tpu.parallel import VectorEnv
from multigrid_tpu.wrappers import (
    FullyObsWrapper,
    ImgObsWrapper,
    ONE_HOT_DIMS,
    OneHotObsWrapper,
    SingleAgentWrapper,
)


def test_fully_obs():
    env = FullyObsWrapper(make('MultiGrid-Empty-5x5-v0', agents=2))
    obs, state = env.reset(jax.random.key(0))
    img = np.asarray(obs['image'])
    assert img.shape == (2, 5, 5, 3)
    # Identical global view for every agent (wrappers.py:41-55).
    np.testing.assert_array_equal(img[0], img[1])
    # Walls on the border, goal at (3, 3), agents overlaid at their positions.
    assert (img[0, :, 0, 0] == TYPE_WALL).all()
    assert img[0, 3, 3, 0] == TYPE_GOAL
    pos = np.asarray(state.agent_pos)
    for a in range(2):
        assert img[0, pos[a, 0], pos[a, 1], 0] == TYPE_AGENT

    obs, state, *_ = env.step(state, jnp.array([2, 0], dtype=jnp.int32))
    assert obs['image'].shape == (2, 5, 5, 3)


def test_img_obs():
    env = ImgObsWrapper(make('MultiGrid-Empty-5x5-v0', agents=2))
    obs, state = env.reset(jax.random.key(0))
    assert obs.dtype == jnp.uint8 and obs.shape == (2, 7, 7, 3)


def test_one_hot():
    env = OneHotObsWrapper(make('MultiGrid-Empty-5x5-v0', agents=2))
    obs, state = env.reset(jax.random.key(0))
    img = np.asarray(obs['image'])
    assert img.shape == (2, 7, 7, sum(ONE_HOT_DIMS))
    # Each of the three encoding slots contributes exactly one hot bit.
    assert (img.sum(-1) == 3).all()
    # Cross-check against the raw encodings.
    raw, _ = make('MultiGrid-Empty-5x5-v0', agents=2).reset(jax.random.key(0))
    raw_img = np.asarray(raw['image'])
    assert (np.argmax(img[..., :11], -1) == raw_img[..., 0]).all()
    assert (np.argmax(img[..., 11:17], -1) == raw_img[..., 1]).all()


def test_single_agent():
    env = SingleAgentWrapper(make('MultiGrid-Empty-5x5-v0'))
    obs, state = env.reset(jax.random.key(0))
    assert obs['image'].shape == (7, 7, 3)
    assert obs['direction'].shape == ()
    obs, state, rew, term, trunc = env.step(state, 2)
    assert rew.shape == () and term.shape == ()


def test_wrapped_env_vmaps():
    """Wrappers compose with VectorEnv batching."""
    venv = VectorEnv(OneHotObsWrapper(make('MultiGrid-Empty-5x5-v0', agents=2)), 4)
    obs, state = venv.reset(jax.random.key(1))
    assert obs['image'].shape == (4, 2, 7, 7, 21)
    obs, state, *_ = venv.step(state, jnp.zeros((4, 2), dtype=jnp.int32))
    assert obs['image'].shape == (4, 2, 7, 7, 21)


def test_mission_surfaces_through_wrappers_and_batching():
    """Mission-parameterized envs expose their mission index in the obs dict
    through every path (reference obs carry the mission, base.py:368-376)."""
    env = make('MultiGrid-BlockedUnlockPickup-v0', agents=2)
    obs, state = env.reset(jax.random.key(3))
    assert obs['mission'].shape == (2,)
    assert int(obs['mission'][0]) == int(state.extras['mission_color']) * 2
    # Index round-trips to the reference-shaped mission string.
    mission = env.mission_space[int(obs['mission'][0])]
    assert str(mission) == env.mission_of(state)

    # Batched + wrapped: mission passes through the OneHot wrapper chain.
    venv = VectorEnv(
        OneHotObsWrapper(make('MultiGrid-BlockedUnlockPickup-v0', agents=2)), 4)
    obs, vstate = venv.reset(jax.random.key(4))
    obs, vstate, *_ = venv.step(vstate, jnp.zeros((4, 2), dtype=jnp.int32))
    assert obs['mission'].shape == (4, 2)
    np.testing.assert_array_equal(
        np.asarray(obs['mission'][:, 0]),
        np.asarray(vstate.extras['mission_color']) * 2)

    # Static-mission envs are unchanged: no mission key in functional obs.
    obs, _ = make('MultiGrid-Empty-5x5-v0', agents=1).reset(jax.random.key(0))
    assert 'mission' not in obs
