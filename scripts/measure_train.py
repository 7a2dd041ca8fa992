"""Minimal honest trained-throughput measurement.

One warmup call (compile), then `--repeats` timed calls; each timed call
ends with a host transfer of a scalar that depends on the whole update
(params checksum + metrics), the only reliable barrier through the remote
TPU tunnel. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--env', default='MultiGrid-Empty-16x16-v0')
    p.add_argument('--num-agents', type=int, default=4)
    p.add_argument('--num-envs', type=int, default=4096)
    p.add_argument('--encoder', default='mlp')
    p.add_argument('--rollout-steps', type=int, default=16)
    p.add_argument('--updates-per-call', type=int, default=8)
    p.add_argument('--repeats', type=int, default=3)
    p.add_argument('--calls-per-repeat', type=int, default=4)
    p.add_argument('--hidden', type=int, default=128)
    p.add_argument('--minibatches', type=int, default=1)
    p.add_argument('--epochs', type=int, default=1)
    p.add_argument('--no-packed-obs', action='store_true')
    p.add_argument('--per-agent-policies', action='store_true',
                   help="independent policy_{i} parameters per agent (the "
                        "reference example's scheme)")
    p.add_argument('--platform', default=None, choices=['cpu', 'tpu'],
                   help='force a jax platform (sitecustomize already spent '
                        'the JAX_PLATFORMS env var)')
    p.add_argument('--mode', default='full',
                   choices=['full', 'policy-nostore', 'store-nopolicy',
                            'rollout', 'env-only'],
                   help='isolation modes: rollout with policy but no '
                        'trajectory storage / random actions with storage / '
                        'policy AND full trajectory storage, no learner')
    args = p.parse_args()
    if args.platform:
        jax.config.update('jax_platforms', args.platform)

    from multigrid_tpu.envs import make
    from multigrid_tpu.learn import PPOConfig, make_train_loop, ppo_init
    from multigrid_tpu.parallel import VectorEnv

    env = make(args.env, agents=args.num_agents)
    venv = VectorEnv(env, args.num_envs, packed_obs=not args.no_packed_obs)
    config = PPOConfig(rollout_steps=args.rollout_steps,
                       minibatches=args.minibatches, epochs=args.epochs,
                       per_agent_policies=args.per_agent_policies)
    state, net, config, tx = ppo_init(
        venv, jax.random.key(0), config=config,
        net_kwargs=dict(encoder=args.encoder, hidden=args.hidden))
    if args.mode == 'full':
        loop = make_train_loop(venv, net, config, tx, args.updates_per_call)
    else:
        steps = args.rollout_steps * args.updates_per_call
        fused = jax.default_backend() == 'tpu' and not args.no_packed_obs

        @jax.jit
        def loop(state):
            def body(carry, _):
                env_state, obs, key, acc = carry
                key, k = jax.random.split(key)
                if args.mode == 'policy-nostore':
                    logits, value = net.apply(
                        state.params, obs['image'], obs['direction'],
                        obs.get('mission'), fused=fused)
                    action = jax.random.categorical(k, logits).astype(
                        jnp.int32)
                    acc = acc + value.sum()
                    ys = None
                elif args.mode == 'rollout':
                    # The real rollout_phase payload: policy forward,
                    # sampled action + its log-prob, and the full Rollout
                    # tuple stacked across T (what the learner consumes).
                    logits, value = net.apply(
                        state.params, obs['image'], obs['direction'],
                        obs.get('mission'), fused=fused)
                    action = jax.random.categorical(k, logits).astype(
                        jnp.int32)
                    from multigrid_tpu.learn.ppo import _select_log_prob
                    logp = _select_log_prob(logits, action)
                    ys = (obs['image'], obs['direction'], action, logp,
                          value)
                elif args.mode == 'env-only':
                    # Random actions, no trajectory stacking: the same scan
                    # harness as the other modes, so (this - store-nopolicy)
                    # isolates the cost of stacking obs into the T-buffer.
                    action = jax.random.randint(
                        k, (venv.num_envs, venv.num_agents), 0, 7, jnp.int32)
                    acc = acc + jnp.sum(obs['image'][0].astype(jnp.float32))
                    ys = None
                else:
                    action = jax.random.randint(
                        k, (venv.num_envs, venv.num_agents), 0, 7, jnp.int32)
                    ys = (obs['image'], obs['direction'], action)
                obs2, env_state, reward, term, trunc, done, _ = venv.step(
                    env_state, action, refresh=not venv.reset_pool)
                if args.mode == 'rollout':
                    ys = ys + (reward, done[:, None] | term)
                return (env_state, obs2, key, acc + reward.sum()), ys

            (env_state, obs, key, acc), ys = jax.lax.scan(
                body, (state.env_state, state.last_obs, state.key,
                       jnp.zeros(())),
                None, length=steps)
            if venv.reset_pool:
                # Mirror the production rollout's chunked pool refresh.
                env_state = venv.refresh_pool(env_state, steps)
            if ys is not None:
                acc = acc + sum(jnp.sum(y).astype(jnp.float32) for y in
                                jax.tree.leaves(ys))
            return state.replace(env_state=env_state, last_obs=obs, key=key), \
                {'loss': acc}

    @jax.jit
    def checksum(state, metrics):
        # One scalar that depends on the updated params, the env state and
        # the metrics — pulling it to host is the completion barrier.
        s = sum(jnp.sum(l.astype(jnp.float32))
                for l in jax.tree.leaves(state.params))
        s = s + jnp.sum(state.env_state.step_count.astype(jnp.float32))
        return s + metrics['loss']

    steps_per_call = (args.num_envs * args.num_agents
                      * args.rollout_steps * args.updates_per_call)

    t0 = time.perf_counter()
    state, metrics = loop(state)
    float(checksum(state, metrics))
    compile_s = time.perf_counter() - t0

    rates = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        for _ in range(args.calls_per_repeat):
            state, metrics = loop(state)
        float(checksum(state, metrics))
        dt = time.perf_counter() - t0
        rates.append(args.calls_per_repeat * steps_per_call / dt)
    rates.sort()

    roofline = {}
    if args.mode == 'full':
        roofline = _train_roofline(args, venv, net, config, rates[-1])
    print(json.dumps({
        'encoder': args.encoder,
        'hidden': args.hidden,
        'packed_obs': not args.no_packed_obs,
        'minibatches': args.minibatches,
        'epochs': args.epochs,
        'rollout_steps': args.rollout_steps,
        'updates_per_call': args.updates_per_call,
        'trained_agent_steps_per_sec': round(rates[-1]),
        'median': round(rates[len(rates) // 2]),
        'compile_s': round(compile_s, 1),
        **roofline,
    }), flush=True)


def _train_roofline(args, venv, net, config, best_rate: float) -> dict:
    """Analytic lower bounds on the WHOLE train step's HBM traffic and MXU
    FLOPs, divided by the measured update time → achieved GB/s and TFLOP/s
    vs TPU v5e peaks (819 GB/s HBM, 197 bf16 TFLOP/s). Mirrors the env-step
    accounting in bench.py:170-200; this is the "trained headroom
    remaining" number for docs/PERFORMANCE.md.

    The bounds count each array the update must move at least once:
    anything XLA fails to fuse (re-reads, spills, padding) makes the
    *achieved* figure exceed the bound's share of the measured time — so
    utilization is a floor, and 1 − max(utilization) is provable headroom
    only under the bound's fusion assumptions (stated per term below).
    """
    import numpy as np
    e, n, t = args.num_envs, args.num_agents, args.rollout_steps
    env = venv.env
    w, h = env.width, env.height
    vs = env.cfg.view_size
    c = vs * vs
    hid, acts = net.hidden, net.num_actions
    epochs, mb = config.epochs, config.minibatches
    samples = t * e * n

    # --- HBM bytes per update (lower bound) ------------------------------
    from multigrid_tpu.ops.obs_pallas import _row_stride
    grid = e * w * h * 3 * 4
    agents = e * n * 16 * 4
    plane = e * (w + 2 * vs) * _row_stride(h, vs) * 4
    obs_out = e * n * c * 4
    env_step = 2 * grid + 2 * agents + grid + 2 * plane + 2 * obs_out
    # Rollout trajectory: packed image + 6 small (E, N) leaves (+ mission),
    # written once at rollout, read once per learner epoch.
    row = n * (c + 6 + (1 if net.num_missions else 0)) * 4
    traj = t * e * row * (1 + epochs)
    # Minibatched epochs shuffle (T-perm + env-roll): one extra read+write
    # of the batch per epoch.
    shuffle = 2 * t * e * row * epochs if mb > 1 else 0
    # Policy weights: streamed once per rollout step (first-layer blocks in
    # the fused kernel) and per sgd step (read + grad write + adam moments).
    p = (c * 21 + 2 + net.num_missions) * hid + hid * hid + hid * (acts + 1)
    weights = (t + 1) * p * 4 + epochs * mb * p * 4 * 6
    total_bytes = env_step * t + traj + shuffle + weights

    # --- MXU FLOPs per update (lower bound) ------------------------------
    if args.encoder == 'mlp':
        fwd = 2 * ((c * 21 + 2 + net.num_missions) * hid
                   + hid * hid + hid * (acts + 1))
    else:  # reference 3-conv stack on (vs, vs, 21) one-hot planes
        o1, o2, o3 = vs - 2, vs - 4, vs - 6
        fwd = 2 * (o1 * o1 * 9 * 21 * 16 + o2 * o2 * 9 * 16 * 32
                   + o3 * o3 * 9 * 32 * 64          # the 3 convs
                   + (o3 * o3 * 64) * hid           # flatten → trunk Dense
                   + hid * (acts + 1))              # heads
    flops = samples * fwd * (1 + 3 * epochs) + e * n * fwd  # rollout + learner + last_value

    upd_s = samples / best_rate
    gbps = total_bytes / upd_s / 1e9
    tflops = flops / upd_s / 1e12
    return {
        'update_hbm_gb_lower_bound': round(total_bytes / 1e9, 3),
        'achieved_hbm_gbps': round(gbps, 1),
        'hbm_utilization_vs_v5e_peak': round(gbps / 819.0, 3),
        'update_tflop_lower_bound': round(flops / 1e12, 4),
        'achieved_tflops': round(tflops, 1),
        'mxu_utilization_vs_v5e_peak': round(tflops / 197.0, 3),
    }


if __name__ == '__main__':
    main()
