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


@pytest.mark.parametrize('view_size', [3, 5, 9])
def test_pallas_view_sizes(view_size):
    """The kernel is parameterized over view size (odd, >= 3)."""
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
    signal. pick_block is pure geometry, so pin it for the zoo's grids.
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
