"""Fully fused rollout policy step: one Pallas kernel from packed cells to
(action, log-prob, value).

After the first layer moved into a Pallas kernel (ops/fused_linear.py), the
remaining per-rollout-step policy cost was the XLA tail: the (B, H)
activation round trips for the trunk/heads, the log-softmax, the categorical
sample, and the log-prob gather — a dozen (B, ·) HBM tensors per step that
XLA cannot fuse across the kernel-call boundary. The whole mlp
``ActorCritic`` forward is small enough to run per batch block in VMEM, so
this kernel fuses the entire rollout-time policy evaluation:

    one-hot(packed) → dense(+dir/mission) → relu → dense → relu
        → actor head → +gumbel → argmax → selected log-prob
        → value head

HBM traffic per step collapses to: packed cells in (B·C·4 B), direction
features + pre-drawn gumbel noise in, and ONE (8, B) f32 output whose rows
are [action, log-prob, value] (the (B, A) logits never reach HBM).

Sampling matches ``jax.random.categorical(key, logits)`` bit-exactly when
fed ``jax.random.gumbel(key, logits.shape)``: jax's categorical IS
argmax(logits + gumbel) with first-index tie-breaking (jax/_src/random.py),
which the kernel reproduces as ``min(row where z == max z)``.

Forward math mirrors ``learn.nets.ActorCritic`` (encoder='mlp',
packed_obs=True) exactly — same parameters, so the learner's gradients
apply unchanged. Used by ``learn.ppo``'s rollout; equality against the XLA
path is tested in interpret mode (tests/test_fused_policy.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_linear import (
    _NCH,
    _onehot_m,
    pad_cells,
    pad_dir_features,
    prep_actor_critic,
)

_BLOCK = 1024
_NEG = -1e9


def supports(batch: int, hidden: int, num_actions: int) -> bool:
    block = min(_BLOCK, batch)
    return (
        batch % 128 == 0
        and batch % block == 0
        and hidden % 8 == 0
        and num_actions <= 8
    )


def _kernel(
    p_ref, d_ref, g_ref,
    w1r_ref, wd_ref, w1t_ref, b1_ref,
    wat_ref, ba_ref, wvt_ref, bv_ref,
    o_ref,
    *, num_actions: int, compute_dtype,
):
    f32 = jnp.float32

    m = _onehot_m(p_ref[:, :], compute_dtype)            # (21·C, TB)

    dirf = d_ref[:, :].astype(compute_dtype)             # (Fp, TB)
    h = jnp.dot(w1r_ref[:, :].astype(compute_dtype), m,
                preferred_element_type=f32)              # (H, TB)
    h += jnp.dot(wd_ref[:, :].astype(compute_dtype), dirf,
                 preferred_element_type=f32)
    x1 = jnp.maximum(h, 0.0).astype(compute_dtype)

    x2p = jnp.dot(w1t_ref[:, :].astype(compute_dtype), x1,
                  preferred_element_type=f32) + b1_ref[:, :]
    x2 = jnp.maximum(x2p, 0.0).astype(compute_dtype)

    logits = jnp.dot(wat_ref[:, :].astype(compute_dtype), x2,
                     preferred_element_type=f32) + ba_ref[:, :]  # (8, TB)
    vrow = jnp.dot(wvt_ref[:, :].astype(compute_dtype), x2,
                   preferred_element_type=f32) + bv_ref[:, :]

    arow = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    act_mask = arow < num_actions
    logits = jnp.where(act_mask, logits, _NEG)

    # Gumbel-max sample with jnp.argmax's first-max tie-breaking.
    zg = jnp.where(act_mask, logits + g_ref[:, :], _NEG)
    zg_max = jnp.max(zg, axis=0, keepdims=True)
    action = jnp.min(
        jnp.where(zg == zg_max, arow, 8), axis=0, keepdims=True)  # (1, TB)

    zmax = jnp.max(logits, axis=0, keepdims=True)
    ez = jnp.exp(logits - zmax)
    sez = jnp.sum(ez, axis=0, keepdims=True)
    logp = logits - zmax - jnp.log(sez)
    lp = jnp.sum(
        jnp.where(arow == action, logp, 0.0), axis=0, keepdims=True)

    value = vrow[0:1, :]
    o_ref[:, :] = jnp.where(
        arow == 0, action.astype(f32),
        jnp.where(arow == 1, lp, jnp.where(arow == 2, value, 0.0)))


@functools.partial(
    jax.jit, static_argnames=('num_actions', 'interpret'))
def policy_sample(
    params: dict,
    packed: jax.Array,      # (B, C) int32 packed cells
    dirf: jax.Array,        # (B, F) direction(+mission) features
    gumbel: jax.Array,      # (B, A) gumbel noise, A = num_actions
    *,
    num_actions: int = 7,
    interpret: bool = False,
):
    """One fused rollout policy step.

    Returns ``(action int32 (B,), log_prob f32 (B,), value f32 (B,))`` —
    identical to applying ``ActorCritic`` then
    ``jax.random.categorical`` with the gumbel noise's key.
    """
    w = prep_actor_critic(params['params'], packed.shape[1], dirf.shape[1])
    return policy_sample_prepped(
        w, packed, dirf, gumbel, num_actions=num_actions,
        interpret=interpret)


@functools.partial(
    jax.jit, static_argnames=('num_actions', 'interpret'))
def policy_sample_prepped(
    w: dict,
    packed: jax.Array,
    dirf: jax.Array,
    gumbel: jax.Array,
    *,
    num_actions: int = 7,
    interpret: bool = False,
):
    """:func:`policy_sample` with the weight blocks already prepared by
    :func:`fused_linear.prep_actor_critic` — lets a rollout scan hoist the
    pad/reorder work out of the loop (params are scan-invariant but XLA's
    loop-invariant code motion does not hoist it reliably; measured
    ~30 µs/step at B=16384)."""
    b, c = packed.shape
    # Static dims from operand shapes (the dict's int entries would be
    # traced when this function is jitted with ``w`` as an argument).
    h, cp = w['w1r'].shape[0], w['w1r'].shape[1] // _NCH
    fp = w['wd'].shape[1]
    block = min(_BLOCK, b)
    assert interpret or supports(b, h, num_actions), (b, h, num_actions)
    compute_dtype = jnp.float32 if interpret else jnp.bfloat16

    packed = pad_cells(packed, cp)
    dirf_p = pad_dir_features(dirf, fp)
    g8 = jnp.concatenate([
        gumbel.astype(jnp.float32),
        jnp.zeros((b, 8 - gumbel.shape[1]), jnp.float32)], axis=1)

    rows = _NCH * cp
    const = lambda i: (0, 0)  # noqa: E731
    grid_spec = pl.GridSpec(
        grid=(b // block,),
        in_specs=[
            pl.BlockSpec((cp, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fp, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, rows), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, fp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), const, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )
    f32 = jnp.float32
    out = pl.pallas_call(
        functools.partial(
            _kernel, num_actions=num_actions,
            compute_dtype=compute_dtype),
        out_shape=jax.ShapeDtypeStruct((8, b), f32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        packed.T, dirf_p.T, g8.T,
        w['w1r'].astype(compute_dtype), w['wd'].astype(compute_dtype),
        w['w1'].T.astype(compute_dtype), w['b1'][:, None].astype(f32),
        w['wa_p'].T.astype(compute_dtype), w['ba_p'].astype(f32),
        w['wv_p'].T.astype(compute_dtype), w['bv_p'].astype(f32),
    )
    return (
        out[0].astype(jnp.int32),
        out[1],
        out[2],
    )
