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

    print(json.dumps({
        'metric': 'agent_steps_per_sec_per_chip',
        'value': round(best),
        'unit': 'agent-steps/s',
        'vs_baseline': round(best / REFERENCE_AGENT_STEPS_PER_SEC, 2),
        'median': round(median),
    }))


if __name__ == '__main__':
    main()
