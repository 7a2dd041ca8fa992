"""Basic smoke tests: envs construct, reset, step, and produce sane shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.envs import CONFIGURATIONS, make


@pytest.mark.parametrize('env_id', sorted(CONFIGURATIONS))
@pytest.mark.parametrize('num_agents', [1, 2])
def test_reset_step_shapes(env_id, num_agents):
    env = make(env_id, agents=num_agents)
    key = jax.random.PRNGKey(0)
    obs, state = env.reset(key)

    vs = env.cfg.view_size
    assert obs['image'].shape == (num_agents, vs, vs, 3)
    assert obs['direction'].shape == (num_agents,)
    assert bool(jnp.all(state.agent_pos >= 0))
    assert bool(jnp.all(state.agent_dir >= 0))

    for t in range(5):
        actions = jax.random.randint(
            jax.random.PRNGKey(t), (num_agents,), 0, 7, dtype=jnp.int32)
        obs, state, rew, term, trunc = env.step(state, actions)
        assert obs['image'].shape == (num_agents, vs, vs, 3)
        assert rew.shape == (num_agents,)
        assert term.shape == (num_agents,)
        assert trunc.shape == (num_agents,)


def test_empty_reaches_goal():
    """An agent walking straight into the goal terminates with reward."""
    env = make('MultiGrid-Empty-5x5-v0', agents=1)
    key = jax.random.PRNGKey(0)
    obs, state = env.reset(key)
    # Agent starts at (1,1) facing right; goal at (3,3) in a 5x5 grid.
    seq = [2, 2, 1, 2, 2]  # forward, forward, turn right, forward, forward
    rewards = []
    for a in seq:
        obs, state, rew, term, trunc = env.step(
            state, jnp.array([a], dtype=jnp.int32))
        rewards.append(float(rew[0]))
    assert bool(term[0])
    expected = 1 - 0.9 * (5 / env.cfg.max_steps)
    assert rewards[-1] == pytest.approx(expected, rel=1e-5)
    assert sum(rewards[:-1]) == 0.0


def test_truncation():
    env = make('MultiGrid-Empty-5x5-v0', agents=1, max_steps=3)
    obs, state = env.reset(jax.random.PRNGKey(0))
    for t in range(3):
        obs, state, rew, term, trunc = env.step(
            state, jnp.array([6], dtype=jnp.int32))  # done action: no-op
    assert bool(trunc[0])
    assert not bool(term[0])


def test_random_starts_are_valid_and_vary():
    env = make('MultiGrid-Empty-Random-5x5-v0', agents=2)
    positions = set()
    for s in range(8):
        obs, state = env.reset(jax.random.PRNGKey(s))
        pos = np.asarray(state.agent_pos)
        grid = np.asarray(state.grid)
        for a in range(2):
            x, y = pos[a]
            assert 1 <= x <= 3 and 1 <= y <= 3
            assert grid[x, y, 0] == 1  # empty cell
        assert len({tuple(p) for p in pos}) == 2  # agents don't collide
        positions.add(tuple(map(tuple, pos)))
    assert len(positions) > 1  # layouts vary across seeds
