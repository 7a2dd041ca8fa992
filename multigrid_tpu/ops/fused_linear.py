"""Fused one-hot → dense Pallas kernel for the policy's first layer.

The PPO rollout's dominant cost (measured via XLA cost analysis at the
flagship batch) is not the MXU matmul but the HBM traffic of materializing
the 21-channel one-hot feature tensor: XLA keeps ~8 copies of the
(B, vs·vs·21) expansion live per step (~0.5 GB/step at B = 16384). This
kernel contracts the one-hot expansion against the layer weights entirely in
VMEM: HBM traffic collapses to the packed cells in (B·C·4 bytes) and the
activations out (B·H·2 bytes).

Layout: **batch in lanes, features in sublanes** (the obs kernel's
convention). The one-hot matrix is built channel-major — row r = ch·C + cell
— built as 21 scalar compares of the pre-split bit fields concatenated
along sublanes (no in-kernel gathers, which Mosaic lacks):

    M[ch·C + cell, b] = (field(ch)(packed[cell, b]) == channel_value(ch))

The weights arrive pre-transposed/reordered to (H, 21·C) so the kernel is a
single MXU dot per block: out = W_r @ M → (H, block) f32 → bf16.

Used for rollout-time inference only (the learner's forward/backward runs
the standard XLA expression, whose cost is amortized once per update), so no
custom VJP is needed. Bit-compatibility with the XLA path is not required —
both compute the same f32-accumulated matmul — but equality holds to bf16
rounding and is tested in interpret mode (tests/test_fused_linear.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: One-hot channel widths (type, color, max(state, direction)) — must match
#: learn/nets.OBS_CHANNELS (frozen wire format, multigrid/wrappers.py:139-147).
_WIDTHS = (11, 6, 4)
_NCH = sum(_WIDTHS)

_BLOCK = 2048  # lanes per kernel invocation (~16 MB VMEM working set)


def supports_batch(b: int) -> bool:
    block = min(_BLOCK, b)
    return b % 128 == 0 and b % block == 0


#: Packed-cell pad value no one-hot channel comparison matches (type 0x7FF,
#: color/state 15) — padded cells contribute all-zero one-hot rows.
_PAD_CELL = (0x7FF << 8) | (15 << 4) | 15


def _onehot_m(p, dtype):
    """Channel-major one-hot feature matrix from a (C, TB) packed block:
    row r = ch·C + cell. Splits the three fields once (3 cheap ops on the
    small block) and emits each channel slab as a direct scalar compare —
    2 VPU ops/output element and no (21·C, TB) int32 replica, vs 3 ops +
    the replica for the masked-compare form (measured perf-neutral on the
    fused PPO kernel — Mosaic was already folding the masked form — but
    strictly less VMEM and simpler)."""
    t = p >> 8
    col = (p >> 4) & 15
    st = p & 15
    return jnp.concatenate(
        [(t == ch).astype(dtype) for ch in range(_WIDTHS[0])]
        + [(col == ch).astype(dtype) for ch in range(_WIDTHS[1])]
        + [(st == ch).astype(dtype) for ch in range(_WIDTHS[2])]
    )


def pad_cells(packed: jax.Array, cp: int) -> jax.Array:
    """Pad (B, C) packed cells to a sublane tile of ``cp`` columns."""
    b, c = packed.shape
    if cp == c:
        return packed
    return jnp.concatenate(
        [packed, jnp.full((b, cp - c), _PAD_CELL, packed.dtype)], axis=1)


def pad_dir_features(dirf: jax.Array, fp: int) -> jax.Array:
    """(B, F) direction(+mission) features → (B, Fp) with a constant-1 bias
    column appended (folds the dir-dense bias into the weight block)."""
    b, f = dirf.shape
    return jnp.concatenate([
        dirf.astype(jnp.float32), jnp.ones((b, 1), jnp.float32),
        jnp.zeros((b, fp - f - 1), jnp.float32)], axis=1)


def prep_actor_critic(pr: dict, c: int, f: int) -> dict:
    """Pad/reorder ``ActorCritic(encoder='mlp', packed_obs=True)`` params
    into batch-in-lanes kernel operand blocks (shared by the fused policy
    forward and the fused PPO loss kernels).

    Returns a dict with padded shapes ``cp``/``fp`` and weight blocks:
    ``w1r`` (H, 21·Cp) channel-major first layer, ``wd`` (H, Fp) dir dense
    with bias folded, trunk ``w1``/``b1``, and 8-row-padded heads
    ``wa_p``/``ba_p``/``wv_p``/``bv_p``.
    """
    w_img = pr['img_kernel']                                   # (C·21, H)
    w0, b0 = pr['Dense_0']['kernel'], pr['Dense_0']['bias']    # (F, H), (H,)
    w1, b1 = pr['Dense_1']['kernel'], pr['Dense_1']['bias']    # (H, H), (H,)
    wa, ba = pr['Dense_2']['kernel'], pr['Dense_2']['bias']    # (H, A), (A,)
    wv, bv = pr['Dense_3']['kernel'], pr['Dense_3']['bias']    # (H, 1), (1,)
    h = w_img.shape[1]
    assert w_img.shape[0] == c * _NCH

    cp = (c + 7) // 8 * 8
    w3 = w_img.reshape(c, _NCH, h)
    if cp != c:
        w3 = jnp.concatenate(
            [w3, jnp.zeros((cp - c, _NCH, h), w3.dtype)], axis=0)
    w1r = w3.transpose(1, 0, 2).reshape(_NCH * cp, h).T        # (H, 21·Cp)

    fp = (f + 1 + 7) // 8 * 8
    wd = jnp.concatenate([
        w0, b0[None, :],
        jnp.zeros((fp - f - 1, h), w0.dtype)], axis=0).T       # (H, Fp)

    wa_p = jnp.concatenate(
        [wa, jnp.zeros((h, 8 - wa.shape[1]), wa.dtype)], axis=1)
    ba_p = jnp.concatenate(
        [ba, jnp.zeros((8 - ba.shape[0],), ba.dtype)])[:, None]
    wv_p = jnp.concatenate(
        [wv, jnp.zeros((h, 8 - wv.shape[1]), wv.dtype)], axis=1)
    bv_p = jnp.concatenate(
        [bv, jnp.zeros((8 - bv.shape[0],), bv.dtype)])[:, None]
    return dict(h=h, cp=cp, fp=fp, w1r=w1r, wd=wd, w1=w1, b1=b1,
                wa_p=wa_p, ba_p=ba_p, wv_p=wv_p, bv_p=bv_p)


def _kernel(p_ref, w_ref, o_ref, *, compute_dtype):
    # p_ref: (C, TB) int32 packed cells; w_ref: (H, 21·C) (reordered);
    # o_ref: (H, TB) bf16. compute_dtype is bf16 on TPU (MXU); the CPU
    # interpreter cannot execute bf16 dots, so tests run f32.
    m = _onehot_m(p_ref[:, :], compute_dtype)   # (21·C, TB), row r=ch·C+cell
    out = jnp.dot(
        w_ref[:, :].astype(compute_dtype), m,
        preferred_element_type=jnp.float32)
    o_ref[:, :] = out.astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=('interpret',))
def onehot_linear_packed(
    packed: jax.Array, w: jax.Array, interpret: bool = False
) -> jax.Array:
    """ReLU-less first-layer pre-activation from packed observation cells.

    Parameters
    ----------
    packed : (B, C) int32 — C cells per row, ``type<<8|color<<4|state``
    w : (C·21, H) — the flax Dense kernel over the flattened one-hot
        features (feature index = cell·21 + ch)

    Returns
    -------
    (B, H) bfloat16, equal (to bf16 rounding) to
    ``one_hot_image(packed).reshape(B, C·21) @ w``.
    """
    b, c = packed.shape
    h = w.shape[1]
    assert w.shape[0] == c * _NCH, (w.shape, c)
    block = min(_BLOCK, b)
    assert interpret or supports_batch(b), (
        f'batch {b} does not tile into {block}-lane blocks')
    # Pad the cell count to a sublane tile (8) so each of the kernel's 21
    # concatenated channel slabs is tile-aligned (unaligned sublane concats
    # choke Mosaic). Pad cells carry a value no channel comparison matches
    # (type 0x7FF, color/state 15) → their one-hot rows are all-zero and the
    # matching zero rows padded into the weights contribute nothing.
    cp = (c + 7) // 8 * 8
    if cp != c:
        pad_val = (0x7FF << 8) | (15 << 4) | 15
        packed = jnp.concatenate([
            packed,
            jnp.full((b, cp - c), pad_val, dtype=packed.dtype),
        ], axis=1)
    # Reorder weights feature-major → channel-major rows, transpose to
    # (H, 21·Cp): one small XLA op per step (~264 KB).
    w3 = w.reshape(c, _NCH, h)
    if cp != c:
        w3 = jnp.concatenate(
            [w3, jnp.zeros((cp - c, _NCH, h), w3.dtype)], axis=0)
    w_r = (
        w3.transpose(1, 0, 2)
        .reshape(_NCH * cp, h)
        .T.astype(jnp.bfloat16)
    )
    c = cp
    grid_spec = pl.GridSpec(
        grid=(b // block,),
        in_specs=[
            pl.BlockSpec((c, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, _NCH * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((h, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            compute_dtype=jnp.float32 if interpret else jnp.bfloat16),
        out_shape=jax.ShapeDtypeStruct((h, b), jnp.bfloat16),
        grid_spec=grid_spec,
        interpret=interpret,
    )(packed.T, w_r)
    return out.T


def _grad_kernel(p_ref, g_ref, o_ref, *, compute_dtype):
    # p_ref: (C, TB) packed cells; g_ref: (TB, H) upstream cotangent;
    # o_ref: (21·C, H) f32 — accumulated across grid steps (same block
    # every step: zero-init on the first, add after).
    i = pl.program_id(0)
    m = _onehot_m(p_ref[:, :], compute_dtype)
    dw = jnp.dot(m, g_ref[:, :].astype(compute_dtype),
                 preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init():
        o_ref[:, :] = dw

    @pl.when(i > 0)
    def _acc():
        o_ref[:, :] += dw


def _onehot_linear_grad_w(
    packed: jax.Array, g: jax.Array, interpret: bool = False
) -> jax.Array:
    """dL/dw for :func:`onehot_linear_packed`: ``one_hot(packed)ᵀ @ g``,
    with the one-hot built in VMEM exactly like the forward."""
    b, c = packed.shape
    h = g.shape[-1]
    block = min(_BLOCK, b)
    cp = (c + 7) // 8 * 8
    if cp != c:
        pad_val = (0x7FF << 8) | (15 << 4) | 15
        packed = jnp.concatenate([
            packed,
            jnp.full((b, cp - c), pad_val, dtype=packed.dtype),
        ], axis=1)
    grid_spec = pl.GridSpec(
        grid=(b // block,),
        in_specs=[
            pl.BlockSpec((cp, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_NCH * cp, h), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    dw_r = pl.pallas_call(
        functools.partial(
            _grad_kernel,
            compute_dtype=jnp.float32 if interpret else jnp.bfloat16),
        out_shape=jax.ShapeDtypeStruct((_NCH * cp, h), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(packed.T, g.astype(jnp.bfloat16))
    # channel-major rows (ch·Cp + cell) → feature-major (cell·21 + ch),
    # dropping the zero pad cells.
    dw = dw_r.reshape(_NCH, cp, h).transpose(1, 0, 2)[:c]
    return dw.reshape(c * _NCH, h)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def onehot_linear(packed: jax.Array, w: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """Differentiable wrapper: forward and dW both run as Pallas kernels
    with the one-hot expansion confined to VMEM. dL/d(packed) is zero
    (integer data); dL/dw = one_hot(packed)ᵀ @ g."""
    return onehot_linear_packed(packed, w, interpret=interpret)


def _fwd(packed, w, interpret):
    # zero-length dtype witness: residuals must be jax types
    return onehot_linear_packed(packed, w, interpret=interpret), \
        (packed, jnp.zeros((0,), w.dtype))


def _bwd(interpret, res, g):
    packed, w_witness = res
    dw = _onehot_linear_grad_w(packed, g, interpret=interpret)
    return (
        jnp.zeros(packed.shape, dtype=jax.dtypes.float0),
        dw.astype(w_witness.dtype),
    )


onehot_linear.defvjp(_fwd, _bwd)
