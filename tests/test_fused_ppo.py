"""Fused PPO loss kernel ≡ jax.grad of the same math (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.learn.nets import ActorCritic, one_hot_image
from multigrid_tpu.ops.fused_linear import _NCH
from multigrid_tpu.ops.fused_ppo import ppo_mlp_grads, supports

CLIP, VF, ENT = 0.2, 0.5, 0.01


def _random_packed(key, b, c):
    kt, kc, ks = jax.random.split(key, 3)
    t = jax.random.randint(kt, (b, c), 0, 11)
    co = jax.random.randint(kc, (b, c), 0, 6)
    s = jax.random.randint(ks, (b, c), 0, 4)
    return ((t << 8) | (co << 4) | s).astype(jnp.int32)


def _ref_loss(params, packed, dirf, action, old_logp, adv, target,
              num_actions=7):
    """f32 reference of ActorCritic(mlp, packed) + ppo.loss_fn math."""
    pr = params['params']
    b, c = packed.shape
    feats = one_hot_image(
        packed, dtype=jnp.float32, packed=True
    ).reshape(b, c * _NCH)
    h = feats @ pr['img_kernel']
    d = dirf @ pr['Dense_0']['kernel'] + pr['Dense_0']['bias']
    x1 = jax.nn.relu(h + d)
    x2 = jax.nn.relu(x1 @ pr['Dense_1']['kernel'] + pr['Dense_1']['bias'])
    logits = x2 @ pr['Dense_2']['kernel'] + pr['Dense_2']['bias']
    value = (x2 @ pr['Dense_3']['kernel'] + pr['Dense_3']['bias'])[:, 0]
    log_probs = jax.nn.log_softmax(logits)
    lp = jnp.sum(log_probs * jax.nn.one_hot(action, num_actions), -1)
    ratio = jnp.exp(lp - old_logp)
    pg = -jnp.minimum(
        ratio * adv,
        jnp.clip(ratio, 1 - CLIP, 1 + CLIP) * adv).mean()
    vf = 0.5 * jnp.square(value - target).mean()
    ent = -(jnp.exp(log_probs) * log_probs).sum(-1).mean()
    loss = pg + VF * vf - ENT * ent
    return loss, {'loss': loss, 'pg_loss': pg, 'vf_loss': vf,
                  'entropy': ent}


@pytest.mark.parametrize('num_missions', [0, 5])
def test_grads_match_autodiff(num_missions):
    b, c = 256, 49
    f = 2 + num_missions
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    packed = _random_packed(ks[0], b, c)
    net = ActorCritic(encoder='mlp', packed_obs=True,
                      num_missions=num_missions, dtype=jnp.float32)
    mission0 = jnp.zeros((), jnp.int32) if num_missions else None
    params = net.init(
        ks[1], packed[0], jnp.zeros((), jnp.int32), mission0)
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)

    theta = jax.random.randint(ks[2], (b,), 0, 4).astype(jnp.float32)
    dirf = jnp.stack(
        [jnp.cos(theta * jnp.pi / 2), jnp.sin(theta * jnp.pi / 2)], -1)
    if num_missions:
        mis = jax.random.randint(ks[7], (b,), 0, num_missions)
        dirf = jnp.concatenate(
            [dirf, jax.nn.one_hot(mis, num_missions)], axis=-1)
    action = jax.random.randint(ks[3], (b,), 0, 7)
    # realistic old_logp: current logp + noise → ratios straddle the clip
    loss_grad = jax.value_and_grad(_ref_loss, has_aux=True)
    adv = jax.random.normal(ks[4], (b,))
    adv = (adv - adv.mean()) / (adv.std() + 1e-8)
    target = jax.random.normal(ks[5], (b,))
    old_logp = jnp.log(jnp.full((b,), 1 / 7.0)) + \
        0.3 * jax.random.normal(ks[6], (b,))

    (_, ref_metrics), ref_grads = loss_grad(
        params, packed, dirf, action, old_logp, adv, target)
    got_grads, got_metrics = ppo_mlp_grads(
        params, packed, dirf, action, old_logp, adv, target,
        clip_eps=CLIP, vf_coef=VF, ent_coef=ENT, interpret=True)

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(got_metrics[k]), float(ref_metrics[k]),
            rtol=2e-5, atol=1e-6, err_msg=k)

    flat_ref = jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    flat_got = jax.tree_util.tree_flatten_with_path(got_grads)[0]
    for (path_r, gr), (path_g, gg) in zip(flat_ref, flat_got):
        assert path_r == path_g
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(gr), rtol=5e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path_r))


def test_supports():
    assert supports(262144, 128, 7)
    assert supports(128, 128, 7)
    assert not supports(100, 128, 7)
    assert not supports(262144, 129, 7)


def test_train_step_fused_vs_autodiff_loss():
    """End-to-end wiring check: the fused-loss-kernel train step (interpret
    mode — the exact path compiled on TPU) tracks the jax.grad train step.

    Both steps share the interpret-mode fused ROLLOUT (identical
    trajectories); only the learner differs (Pallas kernel vs autodiff
    through the XLA loss). Loss metrics must agree across several updates —
    a mispaired sample flatten or wrong gradient would compound and
    diverge."""
    from multigrid_tpu.envs import make
    from multigrid_tpu.learn import PPOConfig, make_train_step, ppo_init
    from multigrid_tpu.learn import ppo as ppo_mod
    from multigrid_tpu.parallel import VectorEnv

    venv = VectorEnv(
        make('MultiGrid-Empty-5x5-v0', agents=2), 64, packed_obs=True)
    config = PPOConfig(rollout_steps=4, epochs=2, minibatches=2)

    ppo_mod.FUSED_INTERPRET = True
    try:
        state0, net, config, tx = ppo_init(
            venv, jax.random.key(0),
            net_kwargs=dict(encoder='mlp', hidden=32), config=config)
        step_fused = make_train_step(venv, net, config, tx)

        import multigrid_tpu.ops.fused_ppo as fp
        orig = fp.supports
        fp.supports = lambda *a: False  # force the jax.grad loss path
        try:
            step_plain = make_train_step(venv, net, config, tx)
        finally:
            fp.supports = orig

        sf = sp = state0
        for _ in range(3):
            sf, mf = step_fused(sf)
            sp, mp = step_plain(sp)
            for k in ('loss', 'pg_loss', 'vf_loss', 'entropy'):
                np.testing.assert_allclose(
                    float(mf[k]), float(mp[k]), rtol=0.05, atol=5e-3,
                    err_msg=k)
        # parameters track too (loose: bf16 XLA loss vs f32 kernel)
        for lf, lp_ in zip(jax.tree.leaves(sf.params),
                           jax.tree.leaves(sp.params)):
            np.testing.assert_allclose(
                np.asarray(lf), np.asarray(lp_), rtol=0.2, atol=0.05)
    finally:
        ppo_mod.FUSED_INTERPRET = False


def test_train_step_fused_per_agent_vs_autodiff():
    """Per-agent policies on the fused path: each agent's batch through its
    own loss-kernel instance (vmap → leading Pallas grid axis over stacked
    weight blocks) must track jax.grad through the XLA loss with the same
    per-agent advantage normalization and the 1/(N·B) loss scale."""
    from multigrid_tpu.envs import make
    from multigrid_tpu.learn import PPOConfig, make_train_step, ppo_init
    from multigrid_tpu.learn import ppo as ppo_mod
    from multigrid_tpu.parallel import VectorEnv

    venv = VectorEnv(
        make('MultiGrid-Empty-5x5-v0', agents=2), 64, packed_obs=True)
    config = PPOConfig(rollout_steps=4, epochs=2, minibatches=2,
                       per_agent_policies=True)

    ppo_mod.FUSED_INTERPRET = True
    try:
        state0, net, config, tx = ppo_init(
            venv, jax.random.key(0),
            net_kwargs=dict(encoder='mlp', hidden=32), config=config)
        step_fused = make_train_step(venv, net, config, tx)

        import multigrid_tpu.ops.fused_ppo as fp
        orig = fp.supports
        fp.supports = lambda *a: False  # force the jax.grad loss path
        try:
            step_plain = make_train_step(venv, net, config, tx)
        finally:
            fp.supports = orig

        sf = sp = state0
        for _ in range(3):
            sf, mf = step_fused(sf)
            sp, mp = step_plain(sp)
            for k in ('loss', 'pg_loss', 'vf_loss', 'entropy'):
                np.testing.assert_allclose(
                    float(mf[k]), float(mp[k]), rtol=0.05, atol=5e-3,
                    err_msg=k)
        for lf, lp_ in zip(jax.tree.leaves(sf.params),
                           jax.tree.leaves(sp.params)):
            assert lf.shape == lp_.shape  # stacked leading agent axis
            np.testing.assert_allclose(
                np.asarray(lf), np.asarray(lp_), rtol=0.2, atol=0.05)
    finally:
        ppo_mod.FUSED_INTERPRET = False
