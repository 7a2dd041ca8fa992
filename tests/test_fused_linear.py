"""Fused one-hot→dense kernel ≡ the XLA expression (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.learn.nets import ActorCritic, one_hot_image
from multigrid_tpu.ops.fused_linear import _NCH, onehot_linear_packed


def _random_packed(key, b, c):
    kt, kc, ks = jax.random.split(key, 3)
    t = jax.random.randint(kt, (b, c), 0, 11)
    co = jax.random.randint(kc, (b, c), 0, 6)
    s = jax.random.randint(ks, (b, c), 0, 4)
    return ((t << 8) | (co << 4) | s).astype(jnp.int32)


def test_kernel_matches_xla_expression():
    b, c, h = 64, 49, 128
    packed = _random_packed(jax.random.key(0), b, c)
    w = jax.random.normal(jax.random.key(1), (c * _NCH, h), jnp.float32)
    got = onehot_linear_packed(packed, w, interpret=True)
    feats = one_hot_image(
        packed, dtype=jnp.bfloat16, packed=True)
    want = feats.reshape(b, c * _NCH) @ w.astype(jnp.bfloat16)
    # Same math, same bf16 operands, f32 accumulation on both paths.
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=1e-2)


def test_actorcritic_fused_apply_matches_unfused():
    net = ActorCritic(encoder='mlp', packed_obs=True)
    packed = _random_packed(jax.random.key(2), 8, 49).reshape(4, 2, 49)
    direction = jax.random.randint(jax.random.key(3), (4, 2), 0, 4)
    params = net.init(jax.random.key(4), packed[0, 0], direction[0, 0])
    lo_ref, v_ref = net.apply(params, packed, direction)
    lo_fused, v_fused = net.apply(params, packed, direction,
                                  fused='interpret')
    np.testing.assert_allclose(np.asarray(lo_fused), np.asarray(lo_ref),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(v_fused), np.asarray(v_ref),
                               rtol=2e-2, atol=2e-2)


def test_supports_batch_gate():
    from multigrid_tpu.ops.fused_linear import supports_batch
    assert supports_batch(16384) and supports_batch(128)
    assert not supports_batch(100)
    with pytest.raises(AssertionError):
        onehot_linear_packed(
            _random_packed(jax.random.key(0), 100, 49),
            jnp.zeros((49 * _NCH, 8), jnp.float32))


def test_custom_vjp_grad_matches_xla():
    """dL/dw through the Pallas backward kernel == autodiff of the XLA
    expression (both bf16-operand, f32-accumulated)."""
    from multigrid_tpu.ops.fused_linear import onehot_linear
    b, c, h = 64, 49, 32
    packed = _random_packed(jax.random.key(5), b, c)
    w = jax.random.normal(jax.random.key(6), (c * _NCH, h), jnp.float32) * 0.1
    g_tgt = jax.random.normal(jax.random.key(7), (b, h), jnp.float32)

    def loss_fused(w):
        return jnp.sum(
            onehot_linear(packed, w, True).astype(jnp.float32) * g_tgt)

    def loss_xla(w):
        feats = one_hot_image(
            packed, dtype=jnp.bfloat16, packed=True)
        hh = feats.reshape(b, c * _NCH) @ w.astype(jnp.bfloat16)
        return jnp.sum(hh.astype(jnp.float32) * g_tgt)

    gw_fused = jax.grad(loss_fused)(w)
    gw_xla = jax.grad(loss_xla)(w)
    np.testing.assert_allclose(
        np.asarray(gw_fused), np.asarray(gw_xla), rtol=5e-2, atol=5e-2)
