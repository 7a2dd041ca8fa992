"""Observation wrappers over the functional env API.

Functional counterparts of the reference's gym wrappers
(multigrid/wrappers.py): each wrapper delegates ``reset``/``step`` to the
wrapped environment and maps the observation pytree through a pure, jittable
transformation — so wrapped envs still ``vmap`` into
:class:`~multigrid_tpu.parallel.VectorEnv` batches and shard over meshes
unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .core.config import EnvConfig
from .core.constants import Color, State, Type
from .core.state import MultiGridState
from .envs.env import MultiGridEnv
from .ops.obs import gen_obs  # noqa: F401  (re-export convenience)

#: One-hot channel widths: type, color, max(state, direction)
#: (multigrid/wrappers.py:139-147) → 11 + 6 + 4 = 21 channels.
ONE_HOT_DIMS = (len(Type), len(Color), max(len(State), 4))


class ObservationWrapper:
    """Base wrapper: delegates everything, transforms observations.

    Equivalent role to ``gym.ObservationWrapper`` in the reference wrappers
    (multigrid/wrappers.py:17,61,101); here the transformation must be a pure
    function of ``(obs, state)`` so it stays inside the jitted step.
    """

    def __init__(self, env: MultiGridEnv):
        self.env = env

    # -- delegation ---------------------------------------------------------

    @property
    def cfg(self) -> EnvConfig:
        return self.env.cfg

    @property
    def num_agents(self) -> int:
        return self.env.num_agents

    @property
    def width(self) -> int:
        return self.env.width

    @property
    def height(self) -> int:
        return self.env.height

    def __getattr__(self, name):
        return getattr(self.env, name)

    # -- functional API ------------------------------------------------------

    def observation(self, obs, state: MultiGridState):
        raise NotImplementedError

    def transform_obs(self, obs, state: MultiGridState):
        """Composed wrapper chain (inner transforms first) — the hook batched
        execution applies after generating raw observations once."""
        return self.observation(self.env.transform_obs(obs, state), state)

    def observation_space(self, agent_space):
        """Per-agent observation-space rewrite for this wrapper alone
        (identity by default). The reference wrappers mutate each agent's
        ``observation_space`` in ``__init__`` (multigrid/wrappers.py:41-58,
        139-147); here adapters ask the wrapper chain via
        :meth:`transform_space`."""
        return agent_space

    def transform_space(self, agent_space):
        """Composed per-agent space transform (inner wrappers first) —
        consumed by the Gym/RLlib/PettingZoo adapters so wrapped envs report
        the space their observations actually inhabit."""
        return self.observation_space(self.env.transform_space(agent_space))

    def reset(self, key: jax.Array):
        obs, state = self.env.reset(key)
        return self.observation(obs, state), state

    def step(self, state: MultiGridState, actions: jax.Array,
             action_mask: jax.Array | None = None):
        obs, state, rew, term, trunc = self.env.step(
            state, actions, action_mask)
        return self.observation(obs, state), state, rew, term, trunc

    def step_with_order(self, state, actions, order, action_mask=None):
        obs, state, rew, term, trunc = self.env.step_with_order(
            state, actions, order, action_mask
        )
        return self.observation(obs, state), state, rew, term, trunc

    def observe(self, state: MultiGridState):
        return self.observation(self.env.observe(state), state)


def fully_obs_image(state: MultiGridState) -> jax.Array:
    """Full-grid encoding with live agents overlaid (wrappers.py:41-55).

    Agents are written in index order (later index wins on overlap),
    skipping terminated agents, matching the reference's loop. Delegates to
    the obs kernel's one-hot masked overlay — per-env traced positions must
    never reach ``.at[x, y].set`` (a scatter per env under vmap; this runs
    inside the jitted VectorEnv step)."""
    from .ops.obs import _overlay_agents
    return _overlay_agents(state)


class FullyObsWrapper(ObservationWrapper):
    """Fully observable global image for every agent (wrappers.py:17-58).

    Each agent's ``image`` becomes the full ``(W, H, 3)`` grid encoding with
    all live agents overlaid (identical across agents, as in the reference).
    """

    def observation(self, obs, state):
        img = fully_obs_image(state)
        n = self.num_agents
        image = jnp.broadcast_to(img, (n,) + img.shape)
        return {**obs, 'image': image}

    def observation_space(self, agent_space):
        from gymnasium import spaces
        import numpy as np
        d = dict(agent_space.spaces)
        # Reference declares (height, width, 3) (wrappers.py:43-44) though
        # the arrays are grid-state-shaped (width, height, 3); mirror the
        # actual array shape so the space is truthful.
        d['image'] = spaces.Box(
            0, 255, (self.env.width, self.env.height, 3), dtype=np.int32)
        return spaces.Dict(d)


class ImgObsWrapper(ObservationWrapper):
    """Image-only observations as uint8 (wrappers.py:61-98)."""

    def observation(self, obs, state):
        return obs['image'].astype(jnp.uint8)

    def observation_space(self, agent_space):
        from gymnasium import spaces
        import numpy as np
        img = agent_space['image']
        # The reference keeps the image Box and forces uint8
        # (wrappers.py:86-89).
        return spaces.Box(img.low.min(), img.high.max(), img.shape,
                          dtype=np.uint8)


def one_hot(image: jax.Array, dtype=jnp.uint8) -> jax.Array:
    """(..., 3) int encodings → (..., 21) one-hot planes (wrappers.py:158-190)."""
    planes = [
        jax.nn.one_hot(image[..., i], n, dtype=dtype)
        for i, n in enumerate(ONE_HOT_DIMS)
    ]
    return jnp.concatenate(planes, axis=-1)


class OneHotObsWrapper(ObservationWrapper):
    """One-hot encode the image channels (wrappers.py:101-190).

    ``(vs, vs, 3)`` int → ``(vs, vs, 21)`` uint8, dims
    ``[len(Type)=11, len(Color)=6, max(len(State), len(Direction))=4]``.
    """

    def observation(self, obs, state):
        return {**obs, 'image': one_hot(obs['image'])}

    def observation_space(self, agent_space):
        from gymnasium import spaces
        import numpy as np
        d = dict(agent_space.spaces)
        vh, vw, _ = d['image'].shape
        # (wrappers.py:142-147): Box(0, 1, (vh, vw, 21), uint8).
        d['image'] = spaces.Box(
            0, 1, (vh, vw, sum(ONE_HOT_DIMS)), dtype=np.uint8)
        return spaces.Dict(d)


class SingleAgentWrapper(ObservationWrapper):
    """Strip the agent axis from a single-agent environment
    (wrappers.py:193-233): obs/reward/termination become scalars."""

    def __init__(self, env: MultiGridEnv):
        assert env.num_agents == 1, 'SingleAgentWrapper requires 1 agent'
        super().__init__(env)

    def observation(self, obs, state):
        return jax.tree.map(lambda x: jnp.squeeze(x, 0), obs)

    def step(self, state, actions):
        actions = jnp.asarray(actions, dtype=jnp.int32).reshape((1,))
        obs, state, rew, term, trunc = self.env.step(state, actions)
        squeeze = lambda x: jnp.squeeze(x, 0)
        return (
            jax.tree.map(squeeze, obs), state,
            squeeze(rew), squeeze(term), squeeze(trunc),
        )
