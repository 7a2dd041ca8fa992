"""Fully fused rollout policy kernel ≡ XLA apply + jax.random.categorical.

Interpret mode (CPU) exercises the exact code path that runs compiled on
TPU; interpret computes in f32 (no bf16 dots on CPU), so log-prob/value
equality is to bf16-vs-f32 rounding while the *sampled actions* must match
``jax.random.categorical`` exactly given the same gumbel draw.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multigrid_tpu.learn.nets import ActorCritic
from multigrid_tpu.ops.fused_policy import policy_sample, supports


def _random_packed(key, b, c):
    kt, kc, ks = jax.random.split(key, 3)
    t = jax.random.randint(kt, (b, c), 0, 11)
    co = jax.random.randint(kc, (b, c), 0, 6)
    s = jax.random.randint(ks, (b, c), 0, 4)
    return ((t << 8) | (co << 4) | s).astype(jnp.int32)


def _setup(num_missions=0, b=128, vs=5):
    # f32 net: interpret mode computes f32 (no bf16 dots on CPU), so exact
    # action equality needs the XLA reference in f32 too — on TPU both paths
    # compute bf16 and remain equal.
    net = ActorCritic(encoder='mlp', packed_obs=True,
                      num_missions=num_missions, dtype=jnp.float32)
    c = vs * vs
    packed = _random_packed(jax.random.key(0), b, c)
    direction = jax.random.randint(jax.random.key(1), (b,), 0, 4)
    mission = (jax.random.randint(jax.random.key(2), (b,), 0, num_missions)
               if num_missions else None)
    params = net.init(jax.random.key(3), packed[:1],
                      direction[:1], mission[:1] if num_missions else None)
    return net, params, packed, direction, mission, c


def _dirf(net, direction, mission):
    theta = direction.astype(net.dtype) * (jnp.pi / 2)
    dirf = jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1).astype(
        jnp.float32)
    if net.num_missions and mission is not None:
        dirf = jnp.concatenate([
            dirf, jax.nn.one_hot(mission, net.num_missions,
                                 dtype=jnp.float32)], axis=-1)
    return dirf


def test_policy_sample_matches_xla_categorical():
    net, params, packed, direction, mission, c = _setup()
    b, vs = packed.shape[0], 5
    logits, value = net.apply(
        params, packed, direction, mission)
    key = jax.random.key(7)
    want_action = jax.random.categorical(key, logits)
    g = jax.random.gumbel(key, logits.shape, jnp.float32)

    action, log_prob, val = policy_sample(
        params, packed, _dirf(net, direction, mission), g,
        num_actions=net.num_actions, interpret=True)

    np.testing.assert_array_equal(np.asarray(action),
                                  np.asarray(want_action))
    want_lp = jnp.take_along_axis(
        jax.nn.log_softmax(logits), want_action[:, None], axis=-1)[:, 0]
    np.testing.assert_allclose(np.asarray(log_prob), np.asarray(want_lp),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(val), np.asarray(value),
                               rtol=2e-2, atol=2e-2)


def test_policy_sample_mission_conditioning():
    net, params, packed, direction, mission, c = _setup(num_missions=12)
    b, vs = packed.shape[0], 5
    logits, value = net.apply(
        params, packed, direction, mission)
    key = jax.random.key(11)
    g = jax.random.gumbel(key, logits.shape, jnp.float32)
    action, _, val = policy_sample(
        params, packed, _dirf(net, direction, mission), g,
        num_actions=net.num_actions, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(action), np.asarray(jax.random.categorical(key, logits)))
    np.testing.assert_allclose(np.asarray(val), np.asarray(value),
                               rtol=2e-2, atol=2e-2)
    # Mission must actually influence the policy: different mission indices
    # change some sampled action or value.
    other = (mission + 1) % net.num_missions
    _, _, val2 = policy_sample(
        params, packed, _dirf(net, direction, other), g,
        num_actions=net.num_actions, interpret=True)
    assert not np.allclose(np.asarray(val2), np.asarray(val))


def test_supports_gate():
    assert supports(16384, 128, 7)
    assert supports(8192, 128, 7)
    assert not supports(100, 128, 7)
    assert not supports(16384, 129, 7)


def test_rollout_fused_vs_unfused_trajectories():
    """End-to-end: make_train_step with the fused rollout (interpret) and
    with the XLA path produce identical metrics from identical seeds."""
    from multigrid_tpu.envs import make
    from multigrid_tpu.learn import PPOConfig, make_train_step, ppo_init
    from multigrid_tpu.learn import ppo as ppo_mod
    from multigrid_tpu.parallel import VectorEnv

    env = make('MultiGrid-Empty-8x8-v0', agents=2)
    venv = VectorEnv(env, 64, packed_obs=True)
    config = PPOConfig(rollout_steps=4)

    def run(flag):
        old = ppo_mod.FUSED_INTERPRET
        ppo_mod.FUSED_INTERPRET = flag
        try:
            state, net, cfg, tx = ppo_init(
                venv, jax.random.key(0), config=config,
                net_kwargs=dict(encoder='mlp', dtype=jnp.float32))
            step = make_train_step(venv, net, cfg, tx)
            state, metrics = step(state)
            return jax.device_get(metrics)
        finally:
            ppo_mod.FUSED_INTERPRET = old

    m_fused = run(True)
    m_plain = run(False)
    # Same sampled actions → same trajectories → same reward statistics.
    np.testing.assert_allclose(m_fused['reward_per_step'],
                               m_plain['reward_per_step'], rtol=1e-6)
    np.testing.assert_allclose(m_fused['entropy'], m_plain['entropy'],
                               rtol=5e-2, atol=5e-3)
