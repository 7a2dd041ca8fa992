"""Cross-sim differential harness: Empty envs vs. the reference.

Reference layouts and trajectories (obs images, directions, rewards,
terminations, truncations) must match bit-exactly under identical seeds and
action sequences, using the injected-generator parity recipe (SURVEY.md §2.4).
"""

import numpy as np
import pytest

from multigrid_tpu.envs import make
from multigrid_tpu.envs.parity import ParityRunner

from .ref_loader import open_reference


def run_differential(env_id, seed, num_agents, num_steps, **kwargs):
    ref = open_reference(env_id, seed, num_agents, **kwargs)
    runner = ParityRunner(make(env_id, agents=num_agents, **kwargs), seed)
    our_obs = runner.reset()

    assert_obs_equal(ref.reset_obs, our_obs, num_agents, t='reset')

    action_rng = np.random.default_rng(seed + 1000)
    for t in range(num_steps):
        actions = {i: int(action_rng.integers(0, 7)) for i in range(num_agents)}
        ref_obs, ref_rew, ref_term, ref_trunc = ref.step(actions)
        our_obs, our_rew, our_term, our_trunc, _ = runner.step(actions)

        assert_obs_equal(ref_obs, our_obs, num_agents, t=t)
        for i in range(num_agents):
            assert ref_rew[i] == pytest.approx(our_rew[i], abs=1e-5), (t, i)
            assert bool(ref_term[i]) == our_term[i], (t, i, ref_term, our_term)
            assert bool(ref_trunc[i]) == our_trunc[i], (t, i)

        if all(ref_term.values()) or all(ref_trunc.values()):
            break
    ref.finish()


def assert_obs_equal(ref_obs, our_obs, num_agents, t):
    for i in range(num_agents):
        ref_img = np.asarray(ref_obs[i]['image'])
        our_img = np.asarray(our_obs[i]['image'])
        assert ref_img.shape == our_img.shape, (t, i)
        if not np.array_equal(ref_img, our_img):
            diff = np.argwhere((ref_img != our_img).any(-1))
            raise AssertionError(
                f"t={t} agent={i} image mismatch at {diff[:5]}:\n"
                f"ref={ref_img[tuple(diff[0])]} ours={our_img[tuple(diff[0])]}"
            )
        assert int(ref_obs[i]['direction']) == our_obs[i]['direction'], (t, i)


@pytest.mark.parametrize('seed', [0, 7, 123])
@pytest.mark.parametrize('num_agents', [1, 2, 3])
def test_empty_8x8(seed, num_agents):
    run_differential('MultiGrid-Empty-8x8-v0', seed, num_agents, num_steps=120)


@pytest.mark.parametrize('seed', [1, 42])
@pytest.mark.parametrize('num_agents', [2, 4])
def test_empty_random_5x5(seed, num_agents):
    run_differential(
        'MultiGrid-Empty-Random-5x5-v0', seed, num_agents, num_steps=120)


@pytest.mark.parametrize('seed', [3])
def test_empty_16x16(seed):
    run_differential('MultiGrid-Empty-16x16-v0', seed, 2, num_steps=150)


@pytest.mark.parametrize('seed', [5])
def test_empty_no_agent_overlap(seed):
    run_differential(
        'MultiGrid-Empty-Random-6x6-v0', seed, 3, num_steps=120,
        allow_agent_overlap=False)


@pytest.mark.parametrize('seed', [9])
def test_empty_joint_reward_all_mode(seed):
    run_differential(
        'MultiGrid-Empty-Random-6x6-v0', seed, 2, num_steps=150,
        joint_reward=True, success_termination_mode='all')
