"""Host-side adapters: Gymnasium, PettingZoo, RLlib protocol, MiniGrid shim."""

import gymnasium
import jax
import numpy as np
import pytest

from multigrid_tpu.adapters import (
    GymAdapter,
    PettingZooWrapper,
    RLlibWrapper,
    register_gymnasium_envs,
    to_pettingzoo_env,
    to_rllib_env,
)
from multigrid_tpu.core.mission import Mission
from multigrid_tpu.envs import CONFIGURATIONS, make
from multigrid_tpu.envs.empty import EmptyEnv
from multigrid_tpu.utils.minigrid_interface import MiniGridInterface


def test_gym_adapter_api():
    env = GymAdapter(make('MultiGrid-Empty-8x8-v0', agents=2))
    obs, infos = env.reset(seed=0)
    assert set(obs) == {0, 1} and set(infos) == {0, 1}
    assert obs[0]['image'].shape == (7, 7, 3)
    assert isinstance(obs[0]['mission'], Mission)
    assert env.observation_space[0]['image'].shape == (7, 7, 3)
    assert env.action_space[1].n == 7

    obs, rewards, terms, truncs, infos = env.step({0: 2, 1: 1})
    assert isinstance(rewards[0], float) and isinstance(terms[1], bool)
    # Partial action dict: missing agents are skipped (base.py:403-404).
    before = env._state.agent_dir
    obs, rewards, terms, truncs, infos = env.step({0: 0})
    after = env._state.agent_dir
    assert int(before[1]) == int(after[1])
    # ASCII pretty-print works.
    assert 'W' in str(env)


def test_gym_seeding_determinism():
    env1 = GymAdapter(make('MultiGrid-Empty-Random-5x5-v0', agents=2))
    env2 = GymAdapter(make('MultiGrid-Empty-Random-5x5-v0', agents=2))
    o1, _ = env1.reset(seed=42)
    o2, _ = env2.reset(seed=42)
    np.testing.assert_array_equal(o1[0]['image'], o2[0]['image'])
    for _ in range(5):
        s1 = env1.step({0: 2, 1: 1})
        s2 = env2.step({0: 2, 1: 1})
        np.testing.assert_array_equal(s1[0][0]['image'], s2[0][0]['image'])
        assert s1[1] == s2[1]


def test_gym_registration():
    register_gymnasium_envs()
    env = gymnasium.make('MultiGrid-Empty-5x5-v0', agents=2,
                         disable_env_checker=True)
    obs, infos = env.reset(seed=1)
    assert obs[0]['image'].shape == (7, 7, 3)
    assert set(CONFIGURATIONS) <= set(gymnasium.registry.keys())


def test_pettingzoo_api():
    env = PettingZooWrapper(make('MultiGrid-Empty-5x5-v0', agents=2))
    obs, infos = env.reset(seed=0)
    assert env.agents == ['agent_0', 'agent_1']
    assert env.action_space('agent_0').n == 7
    assert env.observation_space('agent_1')['direction'].n == 4
    obs, rewards, terms, truncs, infos = env.step({'agent_0': 2, 'agent_1': 2})
    assert set(rewards) == {'agent_0', 'agent_1'}
    # Drive agent 0 to the goal: it must drop from the live agents list
    # (pettingzoo/__init__.py:52-57). success mode 'any' ends the episode.
    env.reset(seed=0)
    done_agents = None
    for a in [2, 2, 1, 2, 2]:
        obs, rewards, terms, truncs, infos = env.step(
            {'agent_0': a, 'agent_1': 6})
        if any(terms.values()):
            done_agents = list(env.agents)
            break
    assert done_agents == []  # 'any' mode terminates everyone


def test_pettingzoo_factory():
    cls = to_pettingzoo_env(EmptyEnv, size=5, agents=2)
    env = cls()
    obs, infos = env.reset(seed=0)
    assert len(obs) == 2


def test_rllib_protocol():
    env = RLlibWrapper(make('MultiGrid-Empty-5x5-v0', agents=2))
    obs, infos = env.reset(seed=0)
    obs, rewards, terms, truncs, infos = env.step({0: 2, 1: 2})
    assert '__all__' in terms and '__all__' in truncs
    assert terms['__all__'] is False
    cls = to_rllib_env(EmptyEnv, default_config={'size': 5, 'agents': 2})
    env2 = cls({'agents': 1})
    assert env2.env.num_agents == 1


def test_minigrid_interface():
    env = MiniGridInterface(make('MultiGrid-Empty-5x5-v0'))
    obs, info = env.reset(seed=0)
    assert obs['image'].shape == (7, 7, 3)
    assert tuple(env.agent_pos) == (1, 1) and env.agent_dir == 0
    assert env.carrying is None
    obs, reward, term, trunc, info = env.step(2)
    assert isinstance(reward, float) and not term
    assert env.steps_remaining == env.env.cfg.max_steps - 1
    with pytest.raises(AssertionError):
        MiniGridInterface(make('MultiGrid-Empty-5x5-v0', agents=2))

# ---------------------------------------------------------------- space parity

def _assert_space_match(ours, ref, path=''):
    """Structural space equality: class, shape, bounds, Discrete.n, keys.

    dtype is deliberately not compared — our arrays are int32 where the
    reference declares python int (int64); the reference itself returns
    int64 arrays only incidentally.
    """
    import gymnasium.spaces as sp
    if isinstance(ref, sp.Dict):
        assert isinstance(ours, sp.Dict), f'{path}: {type(ours)} vs Dict'
        assert set(ours.spaces) == set(ref.spaces), (
            f'{path}: keys {set(ours.spaces)} vs {set(ref.spaces)}')
        for k in ref.spaces:
            if str(k) == 'mission':
                continue  # MissionSpace facade; text parity tested elsewhere
            _assert_space_match(ours[k], ref[k], f'{path}/{k}')
    elif isinstance(ref, sp.Box):
        assert isinstance(ours, sp.Box), f'{path}: {type(ours)} vs Box'
        assert ours.shape == ref.shape, (
            f'{path}: shape {ours.shape} vs {ref.shape}')
        assert float(ours.low.min()) == float(ref.low.min()), path
        assert float(ours.high.max()) == float(ref.high.max()), path
    elif isinstance(ref, sp.Discrete):
        assert isinstance(ours, sp.Discrete), f'{path}: {type(ours)} vs Discrete'
        assert ours.n == ref.n, f'{path}: n {ours.n} vs {ref.n}'
    else:  # pragma: no cover
        raise AssertionError(f'{path}: unhandled reference space {type(ref)}')


@pytest.mark.parametrize('wrapper_name', [None, 'OneHotObsWrapper',
                                          'FullyObsWrapper', 'ImgObsWrapper'])
def test_adapter_space_parity_with_reference(wrapper_name):
    """Adapter spaces (base + each wrapper) match the live reference's
    env.observation_space / action_space (base.py:196-228,
    wrappers.py:41-58,139-147)."""
    from .ref_loader import (
        load_reference, make_reference_env, reference_available)
    if not reference_available():
        pytest.skip('reference not importable')
    load_reference()
    import multigrid.wrappers as ref_wrappers

    import multigrid_tpu.wrappers as our_wrappers

    ref_env, _ = make_reference_env('MultiGrid-Empty-8x8-v0', 0, agents=2)
    env = make('MultiGrid-Empty-8x8-v0', agents=2)
    if wrapper_name is not None:
        ref_env = getattr(ref_wrappers, wrapper_name)(ref_env)
        env = getattr(our_wrappers, wrapper_name)(env)
    ours = GymAdapter(env)

    _assert_space_match(ours.action_space, ref_env.action_space, 'action')
    _assert_space_match(
        ours.observation_space, ref_env.observation_space, 'obs')

    # The declared space must also contain what reset/step actually return.
    obs, _ = ours.reset(seed=0)
    img0 = obs[0] if wrapper_name == 'ImgObsWrapper' else obs[0]['image']
    declared = ours.observation_space[0]
    shape = declared.shape if wrapper_name == 'ImgObsWrapper' \
        else declared['image'].shape
    assert tuple(img0.shape) == tuple(shape), (
        f'obs image {img0.shape} not in declared space {shape}')


# ----------------------------------------------- real-library conformance
# These run only where the optional heavy deps are installed (the CI
# adapter-conformance job); offline dev environments skip them.

def test_pettingzoo_parallel_api_conformance():
    pz = pytest.importorskip('pettingzoo')
    if not hasattr(pz, 'ParallelEnv') or pz.ParallelEnv is object:
        pytest.skip('pettingzoo ParallelEnv unavailable')
    from pettingzoo.test import parallel_api_test

    env = PettingZooWrapper(make('MultiGrid-Empty-5x5-v0', agents=2))
    assert isinstance(env, pz.ParallelEnv)
    parallel_api_test(env, num_cycles=30)


def test_rllib_multiagentenv_conformance():
    pytest.importorskip('ray.rllib')
    from ray.rllib.env.multi_agent_env import MultiAgentEnv

    env = RLlibWrapper(make('MultiGrid-Empty-5x5-v0', agents=2))
    assert isinstance(env, MultiAgentEnv)
    obs, infos = env.reset(seed=0)
    assert set(obs) == {0, 1}
    obs, rew, terms, truncs, infos = env.step({0: 2, 1: 1})
    assert terms['__all__'] in (True, False)
    # Auto-registration with ray.tune ran at import (rllib/__init__.py:109-111).
    from ray.tune.registry import _global_registry, ENV_CREATOR
    from multigrid_tpu.adapters.rllib import register_rllib_envs
    register_rllib_envs()
    assert _global_registry.contains(ENV_CREATOR, 'MultiGrid-Empty-8x8-v0')


def test_rllib_multiagentenv_contract_double():
    """RLlib conformance against a vendored contract double.

    Ray is not installable in the offline dev/CI environment, so the real
    ``MultiAgentEnv`` conformance test above has never executed there. This
    test vendors the contract instead — the method/attribute surface and
    behavioral checks of ray 2.x's ``MultiAgentEnv`` and its env pre-checker
    (``ray.rllib.utils.pre_checks.env.check_multiagent_environments``), with
    signatures lifted from the ray source the reference example drives
    (multigrid/scripts/train.py:126-199 builds an ``AlgorithmConfig`` whose
    env runner calls exactly these) — so it FAILS if ``adapters/rllib.py``
    drifts from the real contract, without needing ray at test time.
    """
    import inspect

    env = RLlibWrapper(make('MultiGrid-Empty-5x5-v0', agents=2))

    # --- surface: attributes and method signatures (ray 2.x MultiAgentEnv).
    assert isinstance(env.agents, list) and env.agents == [0, 1]
    assert env.possible_agents == env.agents
    sig = inspect.signature(env.reset)
    assert set(sig.parameters) >= {'seed', 'options'}
    assert all(sig.parameters[p].kind is inspect.Parameter.KEYWORD_ONLY
               for p in ('seed', 'options'))  # reset(*, seed=None, options=None)
    assert len(inspect.signature(env.step).parameters) == 1
    for getter in (env.get_observation_space, env.get_action_space):
        assert len(inspect.signature(getter).parameters) == 1
    for name in ('render', 'close'):
        assert callable(getattr(env, name))

    # --- behavior: ray's pre-checker requirements.
    obs, infos = env.reset(seed=0)
    assert isinstance(obs, dict) and isinstance(infos, dict)
    agent_ids = set(env.possible_agents)
    assert set(obs) <= agent_ids  # obs keyed by (a subset of) agent ids
    for aid in obs:
        space = env.get_observation_space(aid)
        assert space.contains(obs[aid]), (
            f'obs for agent {aid} not in get_observation_space({aid})')

    actions = {aid: env.get_action_space(aid).sample() for aid in env.agents}
    result = env.step(actions)
    assert len(result) == 5
    obs, rewards, terminateds, truncateds, infos = result
    for d in result:
        assert isinstance(d, dict)
    # '__all__' present in both done dicts, and not an agent id.
    assert '__all__' in terminateds and '__all__' in truncateds
    assert isinstance(terminateds['__all__'], bool)
    assert set(obs) - {'__all__'} <= agent_ids
    assert set(rewards) <= agent_ids
    for aid in rewards:
        assert isinstance(rewards[aid], (int, float))
    for aid in set(terminateds) - {'__all__'}:
        assert isinstance(terminateds[aid], bool)
    for aid in obs:
        assert env.get_observation_space(aid).contains(obs[aid])

    # --- the class factory RLlib's env registry consumes takes one config
    # dict (reference rllib/__init__.py:72-105).
    cls = to_rllib_env(EmptyEnv, default_config={'size': 5, 'agents': 2})
    assert len(inspect.signature(cls.__init__).parameters) == 2  # self, config
    env2 = cls(None)
    o, i = env2.reset(seed=1)
    assert set(o) == {0, 1}
