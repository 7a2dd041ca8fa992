"""Throughput benchmark: lockstep batched env stepping on one chip.

Measures agent-steps/sec on the BASELINE.json headline config
(4096 parallel envs, Empty-16x16, 4 agents, auto-reset, random actions,
full observation generation every step) and prints ONE JSON line.

``vs_baseline`` is relative to the reference implementation's measured
throughput on this machine (~4,469 agent-steps/s: MultiGrid-Empty-8x8-v0,
2 agents, random policy, single env, single CPU core, numba shimmed off —
see BASELINE.md; the reference publishes no numbers of its own).
"""

from __future__ import annotations

import argparse
import json
import time

import jax

REFERENCE_AGENT_STEPS_PER_SEC = 4469.0


def _verify_learn_kernels() -> dict:
    """On-hardware checks of the two learner Pallas kernels against their
    XLA counterparts (their interpret-mode equality is covered on CPU by
    tests/test_fused_linear.py and tests/test_fused_ppo.py; this puts the
    compiled-on-chip behavior into the recorded benchmark evidence).

    Tolerances are bf16-rounding-scale: both paths compute the same
    f32-accumulated math from bf16 operands, differing only in accumulation
    order."""
    import jax.numpy as jnp
    import numpy as np

    from multigrid_tpu.learn.nets import ActorCritic, one_hot_image
    from multigrid_tpu.ops.fused_linear import _NCH, onehot_linear_packed
    from multigrid_tpu.ops.fused_ppo import ppo_mlp_grads

    out = {}
    try:
        b, c, hdim = 256, 49, 128
        ks = jax.random.split(jax.random.key(7), 8)
        t = jax.random.randint(ks[0], (b, c), 0, 11)
        co = jax.random.randint(ks[1], (b, c), 0, 6)
        st = jax.random.randint(ks[2], (b, c), 0, 4)
        packed = ((t << 8) | (co << 4) | st).astype(jnp.int32)
        w = jax.random.normal(ks[3], (c * _NCH, hdim), jnp.float32)
        got = np.asarray(onehot_linear_packed(packed, w), np.float32)
        feats = one_hot_image(
            packed, dtype=jnp.bfloat16, packed=True)
        want = np.asarray(
            feats.reshape(b, c * _NCH) @ w.astype(jnp.bfloat16), np.float32)
        err = np.max(np.abs(got - want) / (np.abs(want) + 1.0))
        out['fused_linear'] = 'pass' if err < 2e-2 else 'fail'

        net = ActorCritic(encoder='mlp', packed_obs=True, dtype=jnp.float32)
        params = net.init(
            ks[4], packed[0], jnp.zeros((), jnp.int32))
        theta = jax.random.randint(
            ks[5], (b,), 0, 4).astype(jnp.float32) * (jnp.pi / 2)
        dirf = jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1)
        action = jax.random.randint(ks[6], (b,), 0, 7)
        adv = jax.random.normal(ks[7], (b,))
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        old_logp = jnp.full((b,), float(jnp.log(1 / 7.0)))
        target = jnp.zeros((b,))

        def xla_loss(p):
            logits, value = net.apply(p, packed,
                                      theta / (jnp.pi / 2))
            lp_all = jax.nn.log_softmax(logits)
            lp = jnp.sum(lp_all * jax.nn.one_hot(action, 7), -1)
            ratio = jnp.exp(lp - old_logp)
            pg = -jnp.minimum(
                ratio * adv, jnp.clip(ratio, 0.8, 1.2) * adv).mean()
            vf = 0.5 * jnp.square(value - target).mean()
            ent = -(jnp.exp(lp_all) * lp_all).sum(-1).mean()
            return pg + 0.5 * vf - 0.01 * ent

        ref_grads = jax.grad(xla_loss)(params)
        got_grads, _ = ppo_mlp_grads(
            params, packed, dirf, action, old_logp, adv, target,
            clip_eps=0.2, vf_coef=0.5, ent_coef=0.01)
        rel = max(
            float(np.max(np.abs(np.asarray(g) - np.asarray(r))
                         / (np.abs(np.asarray(r)).max() + 1e-6)))
            for g, r in zip(jax.tree.leaves(got_grads),
                            jax.tree.leaves(ref_grads)))
        out['fused_ppo'] = 'pass' if rel < 5e-2 else 'fail'
    except Exception as exc:  # pragma: no cover - evidence, not control flow
        out['kernel_verify_error'] = f'{type(exc).__name__}: {exc}'
    return out


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--env-id', default='MultiGrid-Empty-16x16-v0')
    parser.add_argument('--agents', type=int, default=4)
    parser.add_argument('--env-config', type=json.loads, default={},
                        help='JSON dict of env constructor overrides '
                             '(e.g. \'{"size": 32}\' — operating-envelope '
                             'benches beyond the registered configs)')
    parser.add_argument('--num-envs', type=int, default=4096)
    parser.add_argument('--steps', type=int, default=256)
    parser.add_argument('--repeats', type=int, default=3)
    parser.add_argument('--mesh', action='store_true',
                        help='shard the env batch over all local devices '
                             '(weak-scaling mode)')
    parser.add_argument('--skip-verify', action='store_true',
                        help='skip the on-hardware Pallas-vs-XLA obs '
                             'bit-equality check')
    args = parser.parse_args()

    from multigrid_tpu.envs import make
    from multigrid_tpu.parallel import VectorEnv, make_mesh

    env = make(args.env_id, agents=args.agents, **args.env_config)
    mesh = make_mesh() if args.mesh else None
    venv = VectorEnv(env, args.num_envs, mesh=mesh)

    key = jax.random.key(0)
    _, state = venv.reset(key)

    # Warmup: compile + one full rollout. A host transfer (int(...)) is the
    # completion barrier — on remote-tunnel backends block_until_ready can
    # return before execution finishes, inflating rates by orders of
    # magnitude.
    state, summary = venv.rollout_random(state, jax.random.key(1), args.steps)
    int(summary['obs_sum'])

    # Per-call fixed costs (dispatch ~30 ms through the tunnel, plus any
    # per-call prologue) are cancelled by LENGTH DIFFERENCING: each repeat
    # times a short and a long rollout and reports marginal steps over
    # marginal time. (A separately-measured 1-step overhead subtraction —
    # the old scheme — inflated rates wildly when the measured overhead
    # drifted within a window: an error of a few ms is amplified by
    # short-run division.)
    steps_short = max(1, args.steps // 4)
    state, s0 = venv.rollout_random(state, jax.random.key(99), steps_short)
    int(s0['obs_sum'])  # compile the short program too

    # On-hardware Pallas-vs-XLA bit-equality over a few stepped states (the
    # kernel's correctness evidence on the real chip; interpret-mode equality
    # is separately covered by tests/test_obs_pallas.py on CPU).
    verify = 'skipped'
    kernel_checks = {}
    if not args.skip_verify and venv.use_pallas_obs and mesh is None:
        import numpy as np
        verify = 'pass'
        for v in range(3):
            pal, xla = venv.obs_both_paths(state)
            if not np.array_equal(np.asarray(pal), np.asarray(xla)):
                verify = 'fail'
                break
            # rollout_random donates state — rebind to advance to new states.
            state, s = venv.rollout_random(
                state, jax.random.key(1000 + v), 17)
            int(s['obs_sum'])
        kernel_checks = _verify_learn_kernels()
        if any(v == 'fail' for v in kernel_checks.values()):
            verify = 'fail'

    # Alternate short/long runs; difference MEDIANS of each group. A
    # per-pair difference amplifies window noise (a slow short run next to
    # a fast long run makes the marginal time collapse — one round produced
    # a physically impossible 1.4x-of-HBM-peak "best"), while group medians
    # cancel the fixed per-call cost without the noise amplification.
    t_short, t_long = [], []
    for r in range(args.repeats):
        t0 = time.perf_counter()
        state, s_short = venv.rollout_random(
            state, jax.random.key(5000 + r), steps_short)
        int(s_short['obs_sum'])
        t1 = time.perf_counter()
        state, summary = venv.rollout_random(
            state, jax.random.key(2 + r), args.steps)
        int(summary['obs_sum'])
        t_short.append(t1 - t0)
        t_long.append(time.perf_counter() - t1)
    t_short.sort()
    t_long.sort()
    marginal_steps = args.num_envs * args.agents * (args.steps - steps_short)

    def rate(ts, tl):
        return marginal_steps / max(1e-9, tl - ts)

    median = rate(t_short[len(t_short) // 2], t_long[len(t_long) // 2])
    # Best CONSISTENT window: fastest long run against the fastest short
    # run (same-direction selection; never pairs a slow short with a fast
    # long). Still optimistic — median is the number of record.
    best = rate(t_short[0], t_long[0])

    # Roofline accounting: analytic lower bound on the step's HBM traffic
    # (each array the step must read from / write to HBM once), divided by
    # the measured step time → achieved GB/s vs the chip's peak. See
    # docs/PERFORMANCE.md "Roofline" for the derivation.
    from multigrid_tpu.ops.obs_pallas import _row_stride
    e, n = args.num_envs, args.agents
    w, h = env.width, env.height
    vs = env.cfg.view_size
    grid_bytes = e * w * h * 3 * 4            # dense grid, int32
    agent_bytes = e * n * 16 * 4              # agent fields (pos/dir/carry/..)
    plane_bytes = e * (w + 2 * vs) * _row_stride(h, vs) * 4  # packed padded
    obs_bytes = e * n * vs * vs * 4           # packed kernel output
    img_bytes = e * n * vs * vs * 3 * 4       # unpacked obs images
    step_bytes = (
        2 * grid_bytes        # step kernel: grid read + write
        + 2 * agent_bytes
        + grid_bytes          # obs prologue: grid read (pack+overlay)
        + plane_bytes         # padded plane write
        + plane_bytes         # kernel: plane read
        + obs_bytes           # kernel: packed obs write
        + obs_bytes           # epilogue: packed read
        + img_bytes           # epilogue: image write
    )
    step_time = e * n / median                # seconds per step (of record)
    achieved_gbps = step_bytes / step_time / 1e9
    peak_gbps = 819.0                         # TPU v5e HBM peak
    hbm = {
        'step_hbm_mb_lower_bound': round(step_bytes / 1e6, 1),
        'achieved_hbm_gbps': round(achieved_gbps, 1),
        'hbm_utilization_vs_v5e_peak': round(achieved_gbps / peak_gbps, 3),
    }

    print(json.dumps({
        'metric': 'agent_steps_per_sec_per_chip',
        'value': round(median),
        'unit': 'agent-steps/s',
        'vs_baseline': round(median / REFERENCE_AGENT_STEPS_PER_SEC, 2),
        'median': round(median),
        'best_window': round(best),
        'verify': verify,
        **kernel_checks,
        **hbm,
    }))


if __name__ == '__main__':
    main()
