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
