"""True multi-process distributed validation (SURVEY.md §5, distributed row).

Spawns two OS processes that each own 4 virtual CPU devices, wires them into
one 8-device global mesh via ``multigrid_tpu.parallel.distributed.initialize``
(gloo/grpc backend, explicit coordinator), runs the sharded ``VectorEnv``
rollout AND one full PPO train step across both processes, and asserts:

* both workers compute identical global results (SPMD consistency), and
* the integer env-trajectory checksums are bit-identical to the same program
  run single-process on an 8-device mesh — process topology does not change
  trajectories, only where shards live.

A weak-scaling observation (multi-process steps/s vs single-process) is
reported in the JSON for the record; on shared-CPU hosts it measures process
scheduling more than the framework, so it is logged, not asserted.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), '..'))

WORKER = r"""
import json, os, sys, time
import jax
jax.config.update('jax_platforms', 'cpu')
cache = sys.argv[4]
if cache:
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.2)
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from multigrid_tpu.parallel import distributed
distributed.initialize(
    coordinator_address=f'localhost:{port}', num_processes=nproc,
    process_id=pid)
assert jax.process_count() == nproc, distributed.process_summary()

import jax.numpy as jnp
from multigrid_tpu.envs import make
from multigrid_tpu.learn import ActorCritic, PPOConfig, make_train_step, ppo_init
from multigrid_tpu.parallel import VectorEnv, make_mesh

env = make('MultiGrid-Empty-8x8-v0', agents=2)
venv = VectorEnv(env, 16, mesh=make_mesh())
_, state = venv.reset(jax.random.key(0))
state, s1 = venv.rollout_random(state, jax.random.key(1), 8)
obs_sum = int(s1['obs_sum'])
t0 = time.perf_counter()
state, s2 = venv.rollout_random(state, jax.random.key(2), 32)
obs_sum2 = int(s2['obs_sum'])  # host transfer = honest completion barrier
steps_per_sec = 32 / (time.perf_counter() - t0)

tstate, net, config, tx = ppo_init(
    venv, jax.random.key(3), net=ActorCritic(hidden=16),
    config=PPOConfig(rollout_steps=2))
train_step = make_train_step(venv, net, config, tx)
tstate, metrics = train_step(tstate)
print(json.dumps({
    'pid': pid,
    'process_count': jax.process_count(),
    'global_devices': jax.device_count(),
    'obs_sum': obs_sum,
    'obs_sum2': obs_sum2,
    'episodes': int(s1['episodes']) + int(s2['episodes']),
    'loss': float(metrics['loss']),
    'entropy': float(metrics['entropy']),
    'steps_per_sec': steps_per_sec,
}))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _single_process_reference():
    """The same program on this process's own 8-device mesh."""
    import jax

    from multigrid_tpu.envs import make
    from multigrid_tpu.learn import (
        ActorCritic, PPOConfig, make_train_step, ppo_init)
    from multigrid_tpu.parallel import VectorEnv, make_mesh

    env = make('MultiGrid-Empty-8x8-v0', agents=2)
    venv = VectorEnv(env, 16, mesh=make_mesh())
    _, state = venv.reset(jax.random.key(0))
    state, s1 = venv.rollout_random(state, jax.random.key(1), 8)
    state, s2 = venv.rollout_random(state, jax.random.key(2), 32)
    tstate, net, config, tx = ppo_init(
        venv, jax.random.key(3), net=ActorCritic(hidden=16),
        config=PPOConfig(rollout_steps=2))
    train_step = make_train_step(venv, net, config, tx)
    tstate, metrics = train_step(tstate)
    return {
        'obs_sum': int(s1['obs_sum']),
        'obs_sum2': int(s2['obs_sum']),
        'episodes': int(s1['episodes']) + int(s2['episodes']),
        'loss': float(metrics['loss']),
        'entropy': float(metrics['entropy']),
    }


def test_two_process_mesh_matches_single_process():
    port = _free_port()
    # Workers run with NO persistent compilation cache: XLA:CPU AOT entries
    # are compile-context-specific, and reloading them inside the
    # gloo-distributed runtime crashes at value-fetch time (the conftest
    # SIGILL gotcha) — observed for entries written by the single-process
    # suite AND for entries written by a previous distributed run. The
    # ~4 min cold compile per worker is the price of a real multi-process
    # check.
    cache = ''
    workers = []
    for pid in range(2):
        env = dict(
            os.environ,
            PYTHONPATH=REPO + os.pathsep + os.environ.get('PYTHONPATH', ''),
            XLA_FLAGS='--xla_force_host_platform_device_count=4',
        )
        workers.append(subprocess.Popen(
            [sys.executable, '-c', WORKER, str(pid), '2', str(port), cache],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True, cwd=REPO,
        ))
    outs = []
    for w in workers:
        out, err = w.communicate(timeout=1100)
        assert w.returncode == 0, f'worker failed:\n{err[-3000:]}'
        outs.append(json.loads(out.strip().splitlines()[-1]))

    r0, r1 = outs
    assert r0['process_count'] == 2 and r0['global_devices'] == 8
    # SPMD consistency: both processes computed the same global values.
    for k in ('obs_sum', 'obs_sum2', 'episodes'):
        assert r0[k] == r1[k], (k, r0[k], r1[k])
    np.testing.assert_allclose(r0['loss'], r1['loss'], rtol=1e-6)

    # Topology invariance: bit-identical integer trajectory checksums vs the
    # single-process 8-device run of the same program.
    ref = _single_process_reference()
    for k in ('obs_sum', 'obs_sum2', 'episodes'):
        assert r0[k] == ref[k], (k, r0[k], ref[k])
    np.testing.assert_allclose(r0['loss'], ref['loss'], rtol=1e-5)
    np.testing.assert_allclose(r0['entropy'], ref['entropy'], rtol=1e-5)

    print('weak-scaling observation (CPU, informational): '
          f'{r0["steps_per_sec"]:.1f} steps/s across 2 processes')
