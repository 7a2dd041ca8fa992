"""Fully fused PPO loss forward+backward for the mlp policy (one kernel).

The learner update was the last big cost in the trained-throughput profile
(docs/PERFORMANCE.md): the whole-batch loss forward+backward materializes
tens of (B, hidden) activation/residual tensors in HBM — at the flagship
batch (B = 262144 samples per update) that is ~5 GB of traffic for ~0.26 GFLOP
of useful matmul work per 1k samples. The mlp net is small enough that the
ENTIRE loss — one-hot feature construction, both dense trunk layers, actor
and value heads, the clipped-PPO surrogate, and every weight gradient — fits
in VMEM per batch block. HBM traffic collapses to: packed observation cells
in (B·C·4 bytes), a per-sample f32 bundle (action/old-logp/advantage/target,
16 B), the direction features, and the (tiny, block-accumulated) weight
gradients out. Nothing of size (B, hidden) ever touches HBM.

Forward math mirrors ``learn.nets.ActorCritic`` (encoder='mlp',
packed_obs=True) exactly; loss math mirrors ``learn.ppo``'s ``loss_fn``
(the functional equivalent of the reference's RLlib PPO loss,
multigrid/scripts/train.py:126-199). Advantages arrive pre-normalized
(the batch mean/std is a trivial (B,) reduction, done outside).

Layout: batch in lanes (the obs/fused-linear kernel convention), features
in sublanes. Weight-gradient contractions over the batch axis are NT
``dot_general``s (contract dim 1 of both operands) — lane-axis contractions
the MXU executes directly. Scalar loss metrics accumulate in SMEM across
grid steps.

Backward notes (where they differ from naive autodiff):
* ``min(r·A, clip(r)·A)`` routes the gradient through the unclipped branch
  when it is the argmin; at the ubiquitous tie ``r == 1`` both branches have
  identical gradients, so the ``u1 <= u2`` predicate matches ``jax.grad``.
* entropy: dH/dz = -p·(log p + H).
* padded logits rows (actions 7, value rows 1-7) are masked to -1e9 /
  zero-gradient so the 8-row sublane padding never leaks into the loss.
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

_BLOCK = 4096
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
    # inputs (per-block): packed cells, direction features, sample bundle
    p_ref, d_ref, s_ref,
    # weights (constant blocks)
    w1r_ref, wd_ref, w1t_ref, w1_ref, b1_ref,
    wat_ref, wa_ref, ba_ref, wvt_ref, wv_ref, bv_ref,
    # outputs: weight grads (accumulated) + scalar metric sums
    dw1r_ref, dwd_ref, dw1_ref, db1_ref,
    dwa_ref, dba_ref, dwv_ref, dbv_ref,
    pg_ref, vf_ref, ent_ref,
    *, num_actions: int, inv_b: float,
    clip_eps: float, vf_coef: float, ent_coef: float, compute_dtype,
):
    i = pl.program_id(0)
    f32 = jnp.float32

    # ---- forward -------------------------------------------------------
    # one-hot feature matrix, channel-major rows (fused_linear convention)
    m = _onehot_m(p_ref[:, :], compute_dtype)

    dirf = d_ref[:, :].astype(compute_dtype)             # (Fp, TB)
    h = jnp.dot(w1r_ref[:, :].astype(compute_dtype), m,
                preferred_element_type=f32)              # (H, TB)
    h += jnp.dot(wd_ref[:, :].astype(compute_dtype), dirf,
                 preferred_element_type=f32)
    x1 = jnp.maximum(h, 0.0).astype(compute_dtype)       # relu

    x2p = jnp.dot(w1t_ref[:, :].astype(compute_dtype), x1,
                  preferred_element_type=f32) + b1_ref[:, :]
    x2 = jnp.maximum(x2p, 0.0).astype(compute_dtype)

    logits = jnp.dot(wat_ref[:, :].astype(compute_dtype), x2,
                     preferred_element_type=f32) + ba_ref[:, :]  # (8, TB)
    vrow = jnp.dot(wvt_ref[:, :].astype(compute_dtype), x2,
                   preferred_element_type=f32) + bv_ref[:, :]    # (8, TB)

    arow = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    act_mask = arow < num_actions
    logits = jnp.where(act_mask, logits, _NEG)

    zmax = jnp.max(logits, axis=0, keepdims=True)
    ez = jnp.exp(logits - zmax)
    sez = jnp.sum(ez, axis=0, keepdims=True)
    logp = logits - zmax - jnp.log(sez)                  # (8, TB) f32
    prob = ez / sez

    action = s_ref[0:1, :].astype(jnp.int32)             # (1, TB)
    old_lp = s_ref[1:2, :]
    adv = s_ref[2:3, :]
    target = s_ref[3:4, :]

    onehot = (arow == action).astype(f32)
    lp = jnp.sum(logp * onehot, axis=0, keepdims=True)   # (1, TB)
    ratio = jnp.exp(lp - old_lp)
    u1 = ratio * adv
    u2 = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps) * adv

    value = vrow[0:1, :]
    verr = value - target
    ent = -jnp.sum(jnp.where(act_mask, prob * logp, 0.0),
                   axis=0, keepdims=True)                # (1, TB)

    # ---- loss scalars (sums; /B applied outside) -----------------------
    pg_sum = jnp.sum(-jnp.minimum(u1, u2))
    vf_sum = jnp.sum(0.5 * verr * verr)
    ent_sum = jnp.sum(ent)

    @pl.when(i == 0)
    def _init_scalars():
        pg_ref[0, 0] = pg_sum
        vf_ref[0, 0] = vf_sum
        ent_ref[0, 0] = ent_sum

    @pl.when(i > 0)
    def _acc_scalars():
        pg_ref[0, 0] += pg_sum
        vf_ref[0, 0] += vf_sum
        ent_ref[0, 0] += ent_sum

    # ---- backward ------------------------------------------------------
    coef_pg = jnp.where(u1 <= u2, -inv_b * adv * ratio, 0.0)   # (1, TB)
    dlogits = coef_pg * (onehot - prob)
    dlogits += (ent_coef * inv_b) * prob * (logp + ent)        # -c·(-dH/dz)
    dlogits = jnp.where(act_mask, dlogits, 0.0)

    dvrow = jnp.where(arow == 0, (vf_coef * inv_b) * verr, 0.0)

    dl16 = dlogits.astype(compute_dtype)
    dv16 = dvrow.astype(compute_dtype)
    dx2 = jnp.dot(wa_ref[:, :].astype(compute_dtype), dl16,
                  preferred_element_type=f32)
    dx2 += jnp.dot(wv_ref[:, :].astype(compute_dtype), dv16,
                   preferred_element_type=f32)
    dx2p = jnp.where(x2p > 0.0, dx2, 0.0).astype(compute_dtype)  # (H, TB)

    dx1 = jnp.dot(w1_ref[:, :].astype(compute_dtype), dx2p,
                  preferred_element_type=f32)
    dx1p = jnp.where(h > 0.0, dx1, 0.0).astype(compute_dtype)    # (H, TB)

    nt = (((1,), (1,)), ((), ()))  # contract lanes (batch) of both operands

    def _acc(ref, val):
        @pl.when(i == 0)
        def _():
            ref[:, :] = val

        @pl.when(i > 0)
        def _():
            ref[:, :] += val

    _acc(dw1r_ref, jax.lax.dot_general(
        dx1p, m, dimension_numbers=nt, preferred_element_type=f32))
    _acc(dwd_ref, jax.lax.dot_general(
        dx1p, dirf, dimension_numbers=nt, preferred_element_type=f32))
    _acc(dw1_ref, jax.lax.dot_general(
        dx2p, x1, dimension_numbers=nt, preferred_element_type=f32))
    _acc(db1_ref, jnp.sum(dx2p.astype(f32), axis=1, keepdims=True))
    _acc(dwa_ref, jax.lax.dot_general(
        dl16, x2, dimension_numbers=nt, preferred_element_type=f32))
    _acc(dba_ref, jnp.sum(dlogits, axis=1, keepdims=True))
    _acc(dwv_ref, jax.lax.dot_general(
        dv16, x2, dimension_numbers=nt, preferred_element_type=f32))
    _acc(dbv_ref, jnp.sum(dvrow, axis=1, keepdims=True))


@functools.partial(
    jax.jit,
    static_argnames=(
        'clip_eps', 'vf_coef', 'ent_coef', 'num_actions', 'interpret'))
def ppo_mlp_grads(
    params: dict,
    packed: jax.Array,      # (B, C) int32 packed cells
    dirf: jax.Array,        # (B, F) direction(+mission) features, bias NOT included
    action: jax.Array,      # (B,) int32
    old_logp: jax.Array,    # (B,) f32
    adv: jax.Array,         # (B,) f32, pre-normalized
    target: jax.Array,      # (B,) f32
    *,
    clip_eps: float,
    vf_coef: float,
    ent_coef: float,
    num_actions: int = 7,
    interpret: bool = False,
):
    """Gradients + metrics of the clipped-PPO loss in one Pallas kernel.

    Returns ``(grads, metrics)`` where ``grads`` matches the flax param tree
    of ``ActorCritic(encoder='mlp', packed_obs=True)`` and ``metrics`` has
    the same keys as ``learn.ppo``'s ``loss_fn`` aux.
    """
    pr = params['params']
    w_img = pr['img_kernel']                     # (C·21, H) f32
    w0, b0 = pr['Dense_0']['kernel'], pr['Dense_0']['bias']   # (F, H), (H,)
    w1, b1 = pr['Dense_1']['kernel'], pr['Dense_1']['bias']   # (H, H), (H,)
    wa, ba = pr['Dense_2']['kernel'], pr['Dense_2']['bias']   # (H, A), (A,)
    wv, bv = pr['Dense_3']['kernel'], pr['Dense_3']['bias']   # (H, 1), (1,)

    b, c = packed.shape
    f = dirf.shape[1]
    wp = prep_actor_critic(pr, c, f)
    h, cp, fp = wp['h'], wp['cp'], wp['fp']
    w1r, wd = wp['w1r'], wp['wd']
    wa_p, ba_p, wv_p, bv_p = wp['wa_p'], wp['ba_p'], wp['wv_p'], wp['bv_p']
    block = min(_BLOCK, b)
    assert interpret or supports(b, h, num_actions), (b, h, num_actions)
    compute_dtype = jnp.float32 if interpret else jnp.bfloat16

    # (Measured dead end: accepting pre-transposed (C, B) inputs to skip
    # these relayouts is NOT faster — XLA fuses pad+transpose into one
    # cheap relayout that overlaps adjacent work.)
    packed_t = pad_cells(packed, cp).T
    dirf_t = pad_dir_features(dirf, fp).T

    samp = jnp.stack([
        action.astype(jnp.float32), old_logp.astype(jnp.float32),
        adv.astype(jnp.float32), target.astype(jnp.float32),
        jnp.zeros_like(old_logp), jnp.zeros_like(old_logp),
        jnp.zeros_like(old_logp), jnp.zeros_like(old_logp)], axis=0)

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
            pl.BlockSpec((h, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 8), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), const, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((h, rows), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, fp), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((h, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
    )
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(
            _kernel, num_actions=num_actions, inv_b=1.0 / b,
            clip_eps=clip_eps, vf_coef=vf_coef, ent_coef=ent_coef,
            compute_dtype=compute_dtype),
        out_shape=[
            jax.ShapeDtypeStruct((h, rows), f32),
            jax.ShapeDtypeStruct((h, fp), f32),
            jax.ShapeDtypeStruct((h, h), f32),
            jax.ShapeDtypeStruct((h, 1), f32),
            jax.ShapeDtypeStruct((8, h), f32),
            jax.ShapeDtypeStruct((8, 1), f32),
            jax.ShapeDtypeStruct((8, h), f32),
            jax.ShapeDtypeStruct((8, 1), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=(None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)),
    )(
        packed_t, dirf_t, samp,
        w1r.astype(compute_dtype), wd.astype(compute_dtype),
        w1.T.astype(compute_dtype), w1.astype(compute_dtype),
        b1[:, None].astype(f32),
        wa_p.T.astype(compute_dtype), wa_p.astype(compute_dtype),
        ba_p.astype(f32),
        wv_p.T.astype(compute_dtype), wv_p.astype(compute_dtype),
        bv_p.astype(f32),
    )
    (dw1r, dwd, dw1, db1, dwa, dba, dwv, dbv,
     pg_sum, vf_sum, ent_sum) = outs

    # un-reorder the img-kernel grad: (H, 21·Cp) → (C·21, H)
    d_img = (
        dw1r.T.reshape(_NCH, cp, h).transpose(1, 0, 2)[:c]
        .reshape(c * _NCH, h)
    )
    dwd_t = dwd.T                                        # (Fp, H)
    grads = {'params': {
        'img_kernel': d_img.astype(w_img.dtype),
        'Dense_0': {'kernel': dwd_t[:f].astype(w0.dtype),
                    'bias': dwd_t[f].astype(b0.dtype)},
        'Dense_1': {'kernel': dw1.T.astype(w1.dtype),
                    'bias': db1[:, 0].astype(b1.dtype)},
        'Dense_2': {'kernel': dwa.T[:, :wa.shape[1]].astype(wa.dtype),
                    'bias': dba[:ba.shape[0], 0].astype(ba.dtype)},
        'Dense_3': {'kernel': dwv.T[:, :wv.shape[1]].astype(wv.dtype),
                    'bias': dbv[:bv.shape[0], 0].astype(bv.dtype)},
    }}
    pg = pg_sum[0, 0] / b
    vf = vf_sum[0, 0] / b
    ent = ent_sum[0, 0] / b
    loss = pg + vf_coef * vf - ent_coef * ent
    metrics = {'loss': loss, 'pg_loss': pg, 'vf_loss': vf, 'entropy': ent}
    return grads, metrics
