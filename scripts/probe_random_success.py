"""Probe random-policy success rates across sparse-reward envs.

Counts episodes that end with a positive reward under uniform-random
actions — the base rate PPO exploration must amplify. Used to pick a
learnable procedural sparse-reward target (docs/LEARNING.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def probe(env_id: str, num_agents: int, num_envs: int, steps: int, seed: int):
    from multigrid_tpu.envs import make
    from multigrid_tpu.core.actions import NUM_ACTIONS
    from multigrid_tpu.parallel import VectorEnv

    env = make(env_id, agents=num_agents)
    venv = VectorEnv(env, num_envs)
    key = jax.random.key(seed)
    rkey, key = jax.random.split(key)
    _, state = venv.reset(rkey)

    def body(carry, _):
        st, k, succ, fail, trunc_n = carry
        k, ak = jax.random.split(k)
        actions = jax.random.randint(
            ak, (num_envs, env.cfg.num_agents), 0, NUM_ACTIONS,
            dtype=jnp.int32)
        _, st, rew, term, trunc, done, success = venv.step(st, actions)
        # Exact task completion (MultiGridEnv.success on the final pre-reset
        # state), not the positive-return proxy — on LockedHallway a random
        # walk frequently unlocks one door (partial reward) without ever
        # completing the task.
        win = done & success
        tr = jnp.any(trunc, axis=-1) & ~jnp.all(term, axis=-1)
        return (st, k, succ + win.sum(), fail + (done & ~win & ~tr).sum(),
                trunc_n + (done & tr).sum()), None

    @jax.jit
    def run(state, key):
        init = (state, key, jnp.zeros((), jnp.int32),
                jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        (st, _, succ, fail, trunc_n), _ = jax.lax.scan(
            body, init, None, length=steps)
        return succ, fail, trunc_n

    succ, fail, trunc_n = map(int, run(state, key))
    total = succ + fail + trunc_n
    return {
        'env': env_id, 'agents': num_agents, 'episodes': total,
        'successes': succ, 'failures': fail, 'truncations': trunc_n,
        'success_rate': succ / max(total, 1),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--envs', nargs='*', default=[
        'MultiGrid-RedBlueDoors-6x6-v0',
        'MultiGrid-RedBlueDoors-8x8-v0',
        'MultiGrid-BlockedUnlockPickup-v0',
        'MultiGrid-LockedHallway-2Rooms-v0',
    ])
    p.add_argument('--num-agents', type=int, default=2)
    p.add_argument('--num-envs', type=int, default=1024)
    p.add_argument('--steps', type=int, default=2048)
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()
    for env_id in args.envs:
        out = probe(env_id, args.num_agents, args.num_envs, args.steps,
                    args.seed)
        print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
