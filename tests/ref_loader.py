"""Load the reference implementation for differential testing.

The reference (read-only at /root/reference) depends on ``numba`` and
``aenum``, which are not installed. ``numba.njit`` is shimmed to a no-op
decorator (the kernels are pure Python/numpy and run fine uncompiled, just
slower) and ``aenum`` to the stdlib ``enum`` plus our own ``extend_enum``.

The reference's seeded ``reset`` does not control its layout RNG (the
RandomMixin generator is captured at construction — SURVEY.md §2.4), so
``make_reference_env`` injects a known generator into every stream; this is
the empirically verified recipe that makes reference trajectories
reproducible.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_PATH = '/root/reference'


def install_shims() -> None:
    if 'numba' not in sys.modules:
        nb = types.ModuleType('numba')

        def njit(*args, **kwargs):
            if args and callable(args[0]):
                return args[0]
            return lambda fn: fn

        nb.njit = njit
        sys.modules['numba'] = nb

    if 'aenum' not in sys.modules:
        import enum as _enum

        from multigrid_tpu.utils.enum import extend_enum

        ae = types.ModuleType('aenum')
        ae.Enum = _enum.Enum
        ae.EnumMeta = _enum.EnumMeta
        ae.IntEnum = _enum.IntEnum
        ae.extend_enum = extend_enum
        sys.modules['aenum'] = ae


def load_reference():
    """Import and return the reference ``multigrid`` package."""
    install_shims()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import multigrid  # noqa: F401
    import multigrid.envs  # noqa: F401  (registers gymnasium configs)
    return multigrid


def make_reference_env(env_id: str, seed: int, **kwargs):
    """Construct a reference env with all RNG streams injected from ``seed``.

    Returns the env, already reset (unseeded, so the injected generators are
    kept). Layouts and trajectories are then fully reproducible.
    """
    load_reference()
    from multigrid.envs import CONFIGURATIONS

    env_cls, config = CONFIGURATIONS[env_id]
    env = env_cls(**{**config, **kwargs})
    reseed_reference_env(env, seed)
    obs, infos = env.reset()
    return env, obs


def reseed_reference_env(env, seed: int) -> None:
    """Inject a single known generator into all reference RNG streams."""
    rng = np.random.default_rng(seed)
    env._np_random = rng
    env._RandomMixin__np_random = rng
    env.mission_space.seed(seed)


# --------------------------------------------------------------------------
# Golden traces: recorded reference trajectories, so the differential harness
# keeps running when /root/reference is not mounted. Record with
#   RECORD_GOLDEN=1 ./run_tests.sh
# which writes tests/golden/*.npz while the live reference is available.

import hashlib
import os

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), 'golden')
RECORDING = bool(os.environ.get('RECORD_GOLDEN'))


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, 'multigrid'))


def _case_path(env_id: str, seed: int, num_agents: int, kwargs: dict) -> str:
    extra = ''
    if kwargs:
        blob = repr(sorted(kwargs.items())).encode()
        extra = '-' + hashlib.sha1(blob).hexdigest()[:8]
    return os.path.join(
        GOLDEN_DIR, f'{env_id}-s{seed}-n{num_agents}{extra}.npz')


class LiveReference:
    """The reference env, optionally recording its trajectory to golden."""

    def __init__(self, env_id, seed, num_agents, **kwargs):
        self.env, obs = make_reference_env(
            env_id, seed, agents=num_agents, **kwargs)
        self.num_agents = num_agents
        self.reset_obs = obs
        self._path = _case_path(env_id, seed, num_agents, kwargs)
        self._rows = [self._obs_row(obs)] if RECORDING else None
        self._rews, self._terms, self._truncs = [], [], []

    def _obs_row(self, obs):
        return (
            np.stack([np.asarray(obs[i]['image']) for i in range(self.num_agents)]),
            np.asarray([int(obs[i]['direction']) for i in range(self.num_agents)]),
        )

    def step(self, actions):
        obs, rew, term, trunc, _ = self.env.step(actions)
        if self._rows is not None:
            self._rows.append(self._obs_row(obs))
            n = self.num_agents
            self._rews.append([float(rew[i]) for i in range(n)])
            self._terms.append([bool(term[i]) for i in range(n)])
            self._truncs.append([bool(trunc[i]) for i in range(n)])
        return obs, rew, term, trunc

    def finish(self):
        if self._rows is None:
            return
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(
            self._path,
            images=np.stack([r[0] for r in self._rows]).astype(np.int8),
            directions=np.stack([r[1] for r in self._rows]).astype(np.int8),
            rewards=np.asarray(self._rews, dtype=np.float32),
            terms=np.asarray(self._terms),
            truncs=np.asarray(self._truncs),
        )


class GoldenReference:
    """Replays a recorded reference trajectory as if it were the live env."""

    def __init__(self, env_id, seed, num_agents, **kwargs):
        import pytest
        path = _case_path(env_id, seed, num_agents, kwargs)
        if not os.path.exists(path):
            pytest.skip(f'no live reference and no golden trace at {path}')
        data = np.load(path)
        self.num_agents = num_agents
        self._images = data['images']
        self._directions = data['directions']
        self._rews = data['rewards']
        self._terms = data['terms']
        self._truncs = data['truncs']
        self._t = 0
        self.reset_obs = self._obs(0)

    def _obs(self, t):
        return {
            i: {'image': self._images[t, i],
                'direction': int(self._directions[t, i])}
            for i in range(self.num_agents)
        }

    def step(self, actions):
        t = self._t
        assert t < len(self._rews), 'golden trace exhausted'
        self._t += 1
        n = self.num_agents
        return (
            self._obs(t + 1),
            {i: float(self._rews[t, i]) for i in range(n)},
            {i: bool(self._terms[t, i]) for i in range(n)},
            {i: bool(self._truncs[t, i]) for i in range(n)},
        )

    def finish(self):
        pass


def open_reference(env_id, seed, num_agents, **kwargs):
    """Live reference when mounted, golden replay otherwise."""
    if reference_available():
        return LiveReference(env_id, seed, num_agents, **kwargs)
    return GoldenReference(env_id, seed, num_agents, **kwargs)
