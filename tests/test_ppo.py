"""PPO training step: compiles, runs, updates parameters."""

import jax
import jax.numpy as jnp
import numpy as np

from multigrid_tpu.envs import make
from multigrid_tpu.learn import ActorCritic, PPOConfig, make_train_step, ppo_init
from multigrid_tpu.parallel import VectorEnv


def test_train_step_updates_params():
    venv = VectorEnv(make('MultiGrid-Empty-5x5-v0', agents=2), 4)
    net = ActorCritic(hidden=16)
    config = PPOConfig(rollout_steps=4)
    state, net, config, tx = ppo_init(
        venv, jax.random.key(0), net=net, config=config
    )
    train_step = make_train_step(venv, net, config, tx)

    before = jax.tree.leaves(state.params)[0].copy()
    state, metrics = train_step(state)
    state, metrics = train_step(state)

    assert int(state.update_count) == 2
    assert np.isfinite(float(metrics['loss']))
    assert np.isfinite(float(metrics['entropy']))
    after = jax.tree.leaves(state.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    # Env kept stepping inside the rollout scan.
    assert state.env_state.step_count.shape == (4,)


def test_per_agent_policies():
    """Independent per-agent parameters (the reference's policy_{i},
    scripts/train.py:154-158): stacked params, vmapped application."""
    venv = VectorEnv(make('MultiGrid-Empty-5x5-v0', agents=3), 4)
    net = ActorCritic(hidden=16, encoder='mlp')
    config = PPOConfig(rollout_steps=2, per_agent_policies=True)
    state, net, config, tx = ppo_init(
        venv, jax.random.key(1), net=net, config=config)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.shape[0] == 3  # leading agent axis
    train_step = make_train_step(venv, net, config, tx)
    state, metrics = train_step(state)
    assert np.isfinite(float(metrics['loss']))
    # Every agent's own parameter slice actually trained (not just agent 0's
    # slice receiving everyone's gradients).
    after = state.params
    for a in range(3):
        moved = any(
            not np.allclose(np.asarray(bl)[a], np.asarray(al)[a])
            for bl, al in zip(jax.tree.leaves(before), jax.tree.leaves(after))
        )
        assert moved, f'agent {a} parameters did not update'


def test_per_agent_policies_packed_obs():
    """Per-agent policies over the PACKED obs format (the train.py CLI
    default): the image's agent axis sits at -2 (flat cell axis), not -4 —
    regression test for the moveaxis crash that broke per-agent CLI
    training."""
    venv = VectorEnv(
        make('MultiGrid-Empty-5x5-v0', agents=2), 4, packed_obs=True)
    config = PPOConfig(rollout_steps=2, per_agent_policies=True)
    state, net, config, tx = ppo_init(
        venv, jax.random.key(2), config=config,
        net_kwargs=dict(hidden=16, encoder='mlp'))
    train_step = make_train_step(venv, net, config, tx)
    state, metrics = train_step(state)
    assert np.isfinite(float(metrics['loss']))


def test_minibatched_epochs():
    """RLlib-style shuffled minibatch SGD (PPOConfig.minibatches): the
    (T·E) batch flattens, permutes per epoch and splits; per-minibatch
    advantage normalization; parameters update and metrics stay finite."""
    venv = VectorEnv(make('MultiGrid-Empty-5x5-v0', agents=2), 4)
    net = ActorCritic(hidden=16, encoder='mlp')
    config = PPOConfig(rollout_steps=4, epochs=2, minibatches=4)
    state, net, config, tx = ppo_init(
        venv, jax.random.key(2), net=net, config=config)
    train_step = make_train_step(venv, net, config, tx)

    before = jax.tree.leaves(state.params)[0].copy()
    state, metrics = train_step(state)
    assert np.isfinite(float(metrics['loss']))
    assert not np.allclose(
        np.asarray(before), np.asarray(jax.tree.leaves(state.params)[0]))


def test_minibatched_mission_env():
    """Minibatching + auto mission conditioning together: the mission leaf
    rides the flatten/permute with the rest of the rollout."""
    venv = VectorEnv(make('MultiGrid-BlockedUnlockPickup-v0', agents=2), 4)
    config = PPOConfig(rollout_steps=2, epochs=2, minibatches=2)
    state, net, config, tx = ppo_init(venv, jax.random.key(3), config=config)
    assert net.num_missions == 12  # auto-sized from the env's mission space
    train_step = make_train_step(venv, net, config, tx)
    state, metrics = train_step(state)
    assert np.isfinite(float(metrics['loss']))
    assert int(state.update_count) == 1


def test_centralized_critic():
    """MAPPO-style centralized critic (PPOConfig.centralized_critic): the
    value function conditions on ALL agents' observations while the actors
    stay partial — the named fix for independent-PPO's failure on
    coordination chains under a joint reward (docs/LEARNING.md; beyond the
    reference's fully-independent policy_{i} scheme). Both actor-parameter
    schemes train through it, and BOTH actor and critic parameters move."""
    for per_agent in (False, True):
        venv = VectorEnv(
            make('MultiGrid-BlockedUnlockPickup-v0', agents=2, max_steps=8),
            4, packed_obs=True)
        config = PPOConfig(rollout_steps=4, per_agent_policies=per_agent,
                           centralized_critic=True)
        state, net, config, tx = ppo_init(
            venv, jax.random.key(7), config=config,
            net_kwargs=dict(encoder='mlp', hidden=32))
        assert set(state.params) == {'actor', 'critic'}
        train_step = make_train_step(venv, net, config, tx)
        before_a = jax.tree.leaves(state.params['actor'])[0].copy()
        before_c = jax.tree.leaves(state.params['critic'])[0].copy()
        state, metrics = train_step(state)
        assert np.isfinite(float(metrics['loss'])), per_agent
        assert not np.allclose(
            np.asarray(before_a),
            np.asarray(jax.tree.leaves(state.params['actor'])[0]))
        assert not np.allclose(
            np.asarray(before_c),
            np.asarray(jax.tree.leaves(state.params['critic'])[0]))


def test_centralized_critic_value_is_joint():
    """The centralized value is one joint-observation scalar broadcast to
    every agent (same value per agent), unlike the local critic's
    per-agent values."""
    from multigrid_tpu.learn import make_centralized_critic
    venv = VectorEnv(make('MultiGrid-Empty-5x5-v0', agents=3), 4,
                     packed_obs=True)
    config = PPOConfig(rollout_steps=2, centralized_critic=True)
    state, net, config, tx = ppo_init(
        venv, jax.random.key(8), config=config,
        net_kwargs=dict(encoder='mlp', hidden=16))
    critic = make_centralized_critic(net)
    obs = state.last_obs
    v = critic.apply(state.params['critic'], obs['image'], obs['direction'])
    assert v.shape == (4,)  # one value per env, not per agent
