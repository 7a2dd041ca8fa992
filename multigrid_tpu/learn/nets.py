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

    ``packed=False``: (..., vs, vs, 3) int channel triples.
    ``packed=True``: (..., vs, vs) bit-packed int32 cells
    (``type<<8 | color<<4 | state``, the obs kernel's native encoding —
    storing rollouts packed carries 1/3 the HBM traffic of the triples).
    Both produce identical (..., vs, vs, 21) planes.
    """
    if packed:
        fields = (image >> 8, (image >> 4) & 15, image & 15)
    else:
        fields = tuple(image[..., i] for i in range(3))
    planes = [
        jax.nn.one_hot(f, n, dtype=dtype)
        for f, n in zip(fields, OBS_CHANNELS)
    ]
    return jnp.concatenate(planes, axis=-1)


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
    ):
        x = one_hot_image(image, self.dtype, packed=self.packed_obs)
        theta = direction.astype(self.dtype) * (jnp.pi / 2)
        dir_feats = jnp.stack([jnp.cos(theta), jnp.sin(theta)], axis=-1)
        if self.num_missions > 0 and mission is not None:
            dir_feats = jnp.concatenate([
                dir_feats,
                jax.nn.one_hot(mission, self.num_missions, dtype=self.dtype),
            ], axis=-1)

        if self.encoder == 'cnn':
            # Direction (and mission) as constant feature planes
            # (scripts/train.py:56-63).
            dir_planes = jnp.broadcast_to(
                dir_feats[..., None, None, :],
                x.shape[:-1] + (dir_feats.shape[-1],)
            )
            x = jnp.concatenate([x, dir_planes], axis=-1)
            for feat in (16, 32, 64):
                x = nn.Conv(feat, (3, 3), padding='VALID', dtype=self.dtype)(x)
                x = nn.relu(x)
            x = x.reshape(x.shape[:-3] + (-1,))
        else:
            x = jnp.concatenate(
                [x.reshape(x.shape[:-3] + (-1,)), dir_feats], axis=-1
            )
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        # The wide dense layer is the natural tensor-parallel shard point;
        # the training step constrains its output over the 'model' mesh axis.
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))

        logits = nn.Dense(self.num_actions, dtype=jnp.float32)(x)
        value = nn.Dense(1, dtype=jnp.float32)(x)
        return logits, value.squeeze(-1)
