"""Policy/value networks for gridworld observations.

The architecture mirrors the reference's RLlib module — a 3-layer CNN encoder
over the one-hot observation image with the direction broadcast-concatenated
as (cos, sin) feature planes (multigrid/scripts/train.py:56-83), feeding
independent actor and critic heads (scripts/train.py:86-120) — expressed as a
single flax module in TPU-friendly dtypes (bfloat16 compute, float32 params).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.constants import Color, State, Type

#: One-hot channel widths per encoding slot: type, color, max(state, direction)
#: (multigrid/wrappers.py:139-147).
OBS_CHANNELS = (len(Type), len(Color), max(len(State), 4))


def one_hot_image(
    image: jax.Array, dtype=jnp.bfloat16, packed: bool = False
) -> jax.Array:
    """Observation image → one-hot feature planes.

    ``packed=False``: (..., vs, vs, 3) int channel triples →
    (..., vs, vs, 21) planes.
    ``packed=True``: (..., vs·vs) bit-packed int32 cells
    (``type<<8 | color<<4 | state``, the obs kernel's native encoding —
    storing rollouts packed carries 1/3 the HBM traffic of the triples,
    and the flat cell axis avoids the (8, 128) minor-tile padding of a
    trailing (vs, vs)) → (..., vs·vs, 21) planes, same cell-major
    feature order once flattened.

    The construction is ONE fused elementwise comparison against per-channel
    (shift, mask, value) constants — building three per-field one-hots and
    concatenating them materializes the 21-channel tensor three times over
    in HBM, which XLA does not fuse away and which dominated the measured
    PPO rollout cost (~300 MB/step at the flagship batch).
    """
    widths = OBS_CHANNELS
    edges = (widths[0], widths[0] + widths[1])
    ch = jnp.arange(sum(widths), dtype=jnp.int32)
    if packed:
        shift = jnp.where(ch < edges[0], 8, jnp.where(ch < edges[1], 4, 0))
        mask = jnp.where(ch < edges[0], -1, 15)
        cmp = ch - jnp.where(
            ch < edges[0], 0, jnp.where(ch < edges[1], edges[0], edges[1]))
        return (
            ((image[..., None] >> shift) & mask) == cmp
        ).astype(dtype)
    field = jnp.where(
        ch < edges[0], 0, jnp.where(ch < edges[1], 1, 2))
    cmp = ch - jnp.where(
        ch < edges[0], 0, jnp.where(ch < edges[1], edges[0], edges[1]))
    return (jnp.take(image, field, axis=-1) == cmp).astype(dtype)


class ActorCritic(nn.Module):
    """Encoder + categorical actor + value critic.

    Inputs are a single agent's observation dict pieces; batching over agents
    and envs is the caller's ``vmap``/leading-axes concern.

    Encoders:

    * ``'cnn'`` (default) — the reference example's architecture: 3×Conv+ReLU
      over one-hot feature planes with (cos, sin) direction channels
      (multigrid/scripts/train.py:56-83).
    * ``'mlp'`` — TPU-throughput encoder: the same one-hot features flattened
      into one wide Dense layer. 3×3 convs on 7×7 inputs utilize a fraction
      of the MXU; one (batch, 1031)×(1031, hidden) matmul runs ~an order of
      magnitude faster at equal parameter scale.
    """

    num_actions: int = 7
    hidden: int = 128
    encoder: str = 'cnn'
    dtype: jnp.dtype = jnp.bfloat16
    #: Size of the env's mission space; 0 disables mission conditioning.
    #: Mission-parameterized envs (e.g. BlockedUnlockPickup) surface the
    #: per-episode mission index in the obs dict (the reference's obs carry
    #: the mission string, base.py:368-376) — it enters the encoder as a
    #: one-hot feature vector.
    num_missions: int = 0
    #: Expect bit-packed observation images (``VectorEnv(packed_obs=True)``'s
    #: kernel-native format) instead of (vs, vs, 3) triples.
    packed_obs: bool = False

    @nn.compact
    def __call__(
        self,
        image: jax.Array,
        direction: jax.Array,
        mission: jax.Array | None = None,
        *,
        fused: bool | str = False,
    ):
        """``fused`` routes the first layer through the Pallas
        one-hot→dense kernel (ops/fused_linear.py) — rollout-time inference
        only (no VJP); pass ``'interpret'`` for the CPU equality tests.
        Requires ``packed_obs`` and the mlp encoder; parameters are shared
        with the XLA expression, so the learner's gradients apply."""
        theta = direction.astype(self.dtype) * (jnp.pi / 2)
        dir_feats = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
        if self.num_missions > 0 and mission is not None:
            dir_feats = jnp.concatenate([
                dir_feats,
                jax.nn.one_hot(mission, self.num_missions, dtype=self.dtype),
            ], axis=-1)

        # The direction/mission features enter the first layer as an ADDITIVE
        # dense contribution instead of a channel concat: concatenating a
        # 2-channel plane onto the (vs, vs, 21) one-hot forces a full copy of
        # the feature tensor per step (and broadcasting constant planes, as
        # the reference does at scripts/train.py:56-63, is mathematically a
        # per-position bias — W·[x; d] == W_x·x + W_d·d).
        if self.encoder == 'cnn':
            if self.packed_obs:
                # Restore the (vs, vs) spatial view the convs need; packed
                # images carry a flat cell axis.
                vs = int(round(image.shape[-1] ** 0.5))
                image = image.reshape(image.shape[:-1] + (vs, vs))
            x = one_hot_image(image, self.dtype, packed=self.packed_obs)
            h = nn.Conv(16, (3, 3), padding='VALID', dtype=self.dtype)(x)
            d = nn.Dense(16, use_bias=False, dtype=self.dtype)(dir_feats)
            x = nn.relu(h + d[..., None, None, :])
            for feat in (32, 64):
                x = nn.Conv(feat, (3, 3), padding='VALID', dtype=self.dtype)(x)
                x = nn.relu(x)
            x = x.reshape(x.shape[:-3] + (-1,))
        else:
            if self.packed_obs:
                c = image.shape[-1]
            else:
                c = image.shape[-2] * image.shape[-3]
            from ..ops.fused_linear import _NCH
            w = self.param(
                'img_kernel', nn.initializers.lecun_normal(),
                (c * _NCH, self.hidden), jnp.float32)
            if fused:
                assert self.packed_obs, 'fused path needs packed observations'
                from ..ops.fused_linear import onehot_linear
                flat = image.reshape((-1, c))
                h = onehot_linear(flat, w, fused == 'interpret')
                h = h.reshape(image.shape[:-1] + (self.hidden,))
            else:
                x = one_hot_image(image, self.dtype, packed=self.packed_obs)
                # Packed images carry (…, vs², 21) planes (flat cell axis),
                # triples (…, vs, vs, 21); either way features flatten
                # cell-major.
                lead = 2 if self.packed_obs else 3
                h = x.reshape(x.shape[:-lead] + (-1,)) @ w.astype(self.dtype)
            d = nn.Dense(self.hidden, dtype=self.dtype)(dir_feats)
            x = nn.relu(h + d)
        # The wide dense layer is the natural tensor-parallel shard point;
        # the training step constrains its output over the 'model' mesh axis.
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))

        # Heads compute in bf16 like the trunk (f32 head compute makes the
        # backward materialize f32 (batch, hidden) tensors — 2x the traffic
        # of the entire bf16 trunk); only the small outputs are promoted, so
        # log-softmax and the value loss still run in f32.
        logits = nn.Dense(
            self.num_actions, dtype=self.dtype)(x).astype(jnp.float32)
        value = nn.Dense(1, dtype=self.dtype)(x).astype(jnp.float32)
        return logits, value.squeeze(-1)


class CentralizedCritic(nn.Module):
    """Joint-observation value function for MAPPO-style training.

    Conditions on ALL agents' observations and directions at once (the
    actors stay partial): V(o_1..o_N) instead of per-agent V(o_i). This is
    the fix for the independent-PPO failure mode on coordination chains
    (BlockedUnlockPickup with per-agent policies: independently normalized
    advantages under a joint reward de-correlate the agents' credit —
    docs/LEARNING.md) — a capability the reference example does not have
    (its ``policy_{i}`` modules are fully independent,
    multigrid/scripts/train.py:154-158).

    Inputs are one env's joint observation; batching is the caller's
    leading-axes concern (the module is written elementwise over the
    trailing (N, cells) axes).
    """

    hidden: int = 128
    dtype: jnp.dtype = jnp.bfloat16
    num_missions: int = 0
    packed_obs: bool = False

    @nn.compact
    def __call__(
        self,
        images: jax.Array,
        directions: jax.Array,
        mission: jax.Array | None = None,
    ) -> jax.Array:
        """images: (..., N, vs·vs) packed or (..., N, vs, vs, 3) triples;
        directions: (..., N); mission: (..., N) episode mission indices
        (identical across agents — agent 0's is used). Returns (...,)."""
        x = one_hot_image(images, self.dtype, packed=self.packed_obs)
        lead = 3 if self.packed_obs else 4  # (N, cells[, vs], channels)
        x = x.reshape(x.shape[:-lead] + (-1,))
        theta = directions.astype(self.dtype) * (jnp.pi / 2)
        dirf = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
        dirf = dirf.reshape(dirf.shape[:-2] + (-1,))  # (..., 2N)
        if self.num_missions > 0 and mission is not None:
            dirf = jnp.concatenate([
                dirf,
                jax.nn.one_hot(mission[..., 0], self.num_missions,
                               dtype=self.dtype),
            ], axis=-1)
        h = nn.Dense(self.hidden, dtype=self.dtype)(x)
        d = nn.Dense(self.hidden, use_bias=False, dtype=self.dtype)(dirf)
        x = nn.relu(h + d)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        value = nn.Dense(1, dtype=self.dtype)(x).astype(jnp.float32)
        return value.squeeze(-1)
