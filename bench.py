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


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--env-id', default='MultiGrid-Empty-16x16-v0')
    parser.add_argument('--agents', type=int, default=4)
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

    env = make(args.env_id, agents=args.agents)
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

    # Estimate the fixed per-call dispatch overhead so short runs stay honest.
    # (rollout_random donates its state argument — rebind it.)
    state, s0 = venv.rollout_random(state, jax.random.key(99), 1)
    int(s0['obs_sum'])
    t0 = time.perf_counter()
    state, s0 = venv.rollout_random(state, jax.random.key(100), 1)
    int(s0['obs_sum'])
    overhead = time.perf_counter() - t0

    # On-hardware Pallas-vs-XLA bit-equality over a few stepped states (the
    # kernel's correctness evidence on the real chip; interpret-mode equality
    # is separately covered by tests/test_obs_pallas.py on CPU).
    verify = 'skipped'
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

    rates = []
    for r in range(args.repeats):
        t0 = time.perf_counter()
        state, summary = venv.rollout_random(
            state, jax.random.key(2 + r), args.steps)
        int(summary['obs_sum'])
        dt = max(1e-9, time.perf_counter() - t0 - overhead)
        rates.append(args.num_envs * args.agents * args.steps / dt)
    rates.sort()
    best = rates[-1]
    median = rates[len(rates) // 2]

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
    step_time = e * n / best                  # seconds per step
    achieved_gbps = step_bytes / step_time / 1e9
    peak_gbps = 819.0                         # TPU v5e HBM peak
    hbm = {
        'step_hbm_mb_lower_bound': round(step_bytes / 1e6, 1),
        'achieved_hbm_gbps': round(achieved_gbps, 1),
        'hbm_utilization_vs_v5e_peak': round(achieved_gbps / peak_gbps, 3),
    }

    print(json.dumps({
        'metric': 'agent_steps_per_sec_per_chip',
        'value': round(best),
        'unit': 'agent-steps/s',
        'vs_baseline': round(best / REFERENCE_AGENT_STEPS_PER_SEC, 2),
        'median': round(median),
        'verify': verify,
        **hbm,
    }))


if __name__ == '__main__':
    main()
