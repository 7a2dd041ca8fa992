"""Fused Pallas obs kernel ≡ XLA obs path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multigrid_tpu.envs import make
from multigrid_tpu.ops.obs import gen_obs_grid_encoding
from multigrid_tpu.ops.obs_pallas import gen_obs_batched_pallas
from multigrid_tpu.parallel import VectorEnv


@pytest.mark.parametrize('env_id,agents', [
    ('MultiGrid-Empty-8x8-v0', 2),
    ('MultiGrid-BlockedUnlockPickup-v0', 3),
    ('MultiGrid-Empty-16x16-v0', 1),
    ('MultiGrid-LockedHallway-6Rooms-v0', 2),  # 13x25 non-square grid
])
@pytest.mark.parametrize('stw', [False, True])
def test_pallas_matches_xla(env_id, agents, stw):
    env = make(env_id, agents=agents)
    venv = VectorEnv(env, 8, auto_reset=True)
    _, state = venv.reset(jax.random.key(0))

    key = jax.random.key(1)
    for _ in range(3):  # advance into interesting configurations
        key, ak = jax.random.split(key)
        acts = jax.random.randint(ak, (8, agents), 0, 7, dtype=jnp.int32)
        _, state, *_ = venv.step(state, acts)

    vs = env.cfg.view_size
    ref = jax.vmap(
        lambda s: gen_obs_grid_encoding(s, vs, stw)
    )(state)
    got = gen_obs_batched_pallas(state, vs, stw, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # packed=True skips the unpack epilogue; fields must match bit-exactly.
    packed = gen_obs_batched_pallas(
        state, vs, stw, interpret=True, packed=True)
    repack = (ref[..., 0] << 8) | (ref[..., 1] << 4) | ref[..., 2]
    repack = repack.reshape(repack.shape[:-2] + (-1,))  # flat cell axis
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(repack))


@pytest.mark.parametrize('view_size', [3, 5, 9, 11, 13])
def test_pallas_view_sizes(view_size):
    """The kernel is parameterized over view size (odd, >= 3).

    view_size >= 11 exercises the 4-bit top_y realignment chain (a fixed
    3-bit chain silently corrupted d = -top_y > 7 — round-5 advisor fix).
    """
    env = make('MultiGrid-Empty-8x8-v0', agents=2,
               agent_view_size=view_size)
    venv = VectorEnv(env, 8, auto_reset=True)
    _, state = venv.reset(jax.random.key(4))
    key = jax.random.key(5)
    for _ in range(2):
        key, ak = jax.random.split(key)
        acts = jax.random.randint(ak, (8, 2), 0, 7, dtype=jnp.int32)
        _, state, *_ = venv.step(state, acts)
    ref = jax.vmap(
        lambda s: gen_obs_grid_encoding(s, view_size, False)
    )(state)
    got = gen_obs_batched_pallas(state, view_size, False, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_full_lane_blocks_for_shipped_grids():
    """Every shipped grid size must keep the kernel at full 512-lane blocks.

    Regression guard: the slice-select x-chain's trailing wall pad once grew
    the 19x19 Playground plane past the VMEM working-set reference, silently
    halving its lane block to 256 (~8% end-to-end loss) with no functional
    signal. pick_block now derives from the kernel's structural working-set
    model (ops/obs_pallas.py:working_set_bytes) — pin the zoo's grids AND
    the operating envelope beyond them.
    """
    from multigrid_tpu.envs import CONFIGURATIONS
    from multigrid_tpu.ops.obs_pallas import pick_block

    sizes = set()
    for env_id in CONFIGURATIONS:
        env = make(env_id, agents=2)
        sizes.add((env.cfg.width, env.cfg.height))
    assert len(sizes) >= 8  # the whole zoo, not a stub registry
    for w, h in sorted(sizes):
        assert pick_block(w, h, 7) == 512, (w, h, pick_block(w, h, 7))
    # Envelope beyond the shipped zoo: unshipped sizes keep full blocks up
    # to 40x40 even at the conservative n=8 default.
    for w, h in [(32, 32), (40, 40), (25, 13)]:
        assert pick_block(w, h, 7) == 512, (w, h)


def test_lane_block_downgrade_is_loud():
    """A grid whose working set exceeds scoped VMEM must downgrade its lane
    block — and VectorEnv must WARN about it, never silently halve
    (round-4 verdict: the 'silent halving' trap must be structurally
    impossible)."""
    import warnings

    from multigrid_tpu.ops.obs_pallas import (
        _MAX_BLOCK, _VMEM_LIMIT, pick_block, working_set_bytes)

    # The structural model: working set grows with the grid, so some size
    # must exceed the limit at 512 lanes and drop the block.
    assert working_set_bytes(96, 96, 7, 4, 512) > _VMEM_LIMIT
    assert pick_block(96, 96, 7, 4) < _MAX_BLOCK

    env = make('MultiGrid-Empty-16x16-v0', agents=4, size=96)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter('always')
        venv = VectorEnv(env, 512, use_pallas_obs=True)
    msgs = [str(w.message) for w in caught]
    assert any('lane block downgraded' in m for m in msgs), msgs


def test_pool_pack_roundtrip():
    """The reserve pool's bit-packed storage format round-trips exactly
    (grid and box_contents through one flat int32 plane)."""
    env = make('MultiGrid-BlockedUnlockPickup-v0', agents=2)
    venv = VectorEnv(env, 8)
    assert venv._pool_packed
    state = jax.vmap(env.reset_core)(jax.random.split(jax.random.key(3), 8))
    assert state.box_contents.size  # BUP layouts contain a Box
    packed = venv._pool_pack(state)
    assert packed.grid.ndim == 2 and packed.box_contents.size == 0
    back = venv._pool_unpack(packed, state)
    np.testing.assert_array_equal(np.asarray(back.grid),
                                  np.asarray(state.grid))
    np.testing.assert_array_equal(np.asarray(back.box_contents),
                                  np.asarray(state.box_contents))
