"""Checkpoint / resume via orbax.

The reference delegates checkpointing entirely to RLlib's Tuner
(multigrid/scripts/train.py:184-195); here env state is a pytree of arrays,
so training state (params, optimizer state, env batch, RNG) checkpoints and
restores as a single atomic orbax save — including mid-episode environment
state, which the reference cannot capture at all.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def _is_key(x) -> bool:
    return hasattr(x, 'dtype') and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key)


#: Stand-in stored for zero-size leaves (orbax refuses to serialize them;
#: box-free envs carry a (0, 0, 3) box_contents table). The restore target
#: supplies the real zero-size array, so only a marker needs to round-trip.
_EMPTY_SENTINEL = np.zeros((1,), np.int32)


def save_checkpoint(path: str, state: Any) -> str:
    """Atomically save a pytree (TrainState or env state) to ``path``.

    Typed PRNG keys are stored as their raw key data (orbax/numpy cannot
    serialize extended dtypes) and re-wrapped on restore; zero-size leaves
    are stored as a sentinel and re-synthesized from the restore target.
    """
    path = os.path.abspath(path)

    def plain_leaf(x):
        if _is_key(x):
            return np.asarray(jax.random.key_data(x))
        x = np.asarray(x)
        return _EMPTY_SENTINEL if x.size == 0 else x

    plain = jax.tree.map(plain_leaf, state)
    _checkpointer().save(path, plain, force=True)
    return path


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``target`` supplies the structure/dtypes (e.g. a freshly-initialized
    TrainState); restored leaves are placed like the target's.
    """
    def plain_leaf(x):
        if _is_key(x):
            return np.asarray(jax.random.key_data(x))
        if hasattr(x, 'size') and x.size == 0:
            return _EMPTY_SENTINEL
        return x

    plain_target = jax.tree.map(plain_leaf, target)
    restored = _checkpointer().restore(
        os.path.abspath(path), item=plain_target)

    def place(t, r):
        if _is_key(t):
            return jax.random.wrap_key_data(
                jax.numpy.asarray(r),
                impl=jax.random.key_impl(t),
            )
        if hasattr(t, 'dtype'):
            r_arr = np.asarray(r)
            if t.size == 0:
                # Sentinel round-trip: keep the target's zero-size array.
                # A restored leaf with real data here means the checkpoint
                # was written under a different env config (e.g. a
                # uses_boxes=True env restored into a box-free one).
                if r_arr.size > 1:
                    raise ValueError(
                        f'checkpoint/env-config mismatch: stored leaf has '
                        f'shape {r_arr.shape} but the restore target expects '
                        f'a zero-size array (shape {t.shape}); the '
                        f'checkpoint was likely written under a different '
                        f'environment configuration')
                return t
            if r_arr.shape != t.shape:
                raise ValueError(
                    f'checkpoint/env-config mismatch: stored leaf has shape '
                    f'{r_arr.shape} but the restore target expects '
                    f'{t.shape}; the checkpoint was likely written under a '
                    f'different environment configuration')
            return jax.device_put(jax.numpy.asarray(r)).astype(t.dtype)
        return r

    return jax.tree.map(place, target, restored)


def restore_params(path: str, target_params: Any) -> Any:
    """Restore ONLY the model parameters from a TrainState checkpoint.

    Evaluation/visualization need the params, not the optimizer state —
    and the opt_state pytree structure depends on training-time optimizer
    config (``--lr-anneal`` wraps adam in a schedule, adding a state leaf),
    so a whole-TrainState restore would force eval-side flags to mirror
    irrelevant training flags. Reads the checkpoint without a target,
    extracts the ``params`` subtree, and places it against
    ``target_params`` (shape-checked like :func:`restore_checkpoint`).
    """
    raw = _checkpointer().restore(os.path.abspath(path))
    if not isinstance(raw, dict) or 'params' not in raw:
        raise ValueError(
            f'{path} does not look like a TrainState checkpoint '
            f'(top-level keys: {list(raw) if isinstance(raw, dict) else raw})')

    def place(t, r):
        r_arr = np.asarray(r)
        if r_arr.shape != t.shape:
            raise ValueError(
                f'checkpoint/model mismatch: stored parameter has shape '
                f'{r_arr.shape} but the target expects {t.shape}')
        return jax.device_put(jax.numpy.asarray(r)).astype(t.dtype)

    return jax.tree.map(place, target_params, raw['params'])


def latest_checkpoint(directory: str) -> str | None:
    """Most recent ``step_*`` checkpoint under ``directory``, or None."""
    if not os.path.isdir(directory):
        return None
    steps = [
        d for d in os.listdir(directory)
        if d.startswith('step_') and d.split('_')[-1].isdigit()
    ]
    if not steps:
        return None
    best = max(steps, key=lambda d: int(d.split('_')[-1]))
    return os.path.join(directory, best)
