"""MiniGrid compatibility facade (reference:
multigrid/utils/minigrid_interface.py:12-188).

A single-agent view over the Gymnasium adapter so code written against
Farama ``minigrid.MiniGridEnv`` ports by changing imports: scalar
reset/step and the single-agent convenience properties
(``agent_pos``/``agent_dir``/``carrying``), with multi-agent asserts.
"""

from __future__ import annotations

import numpy as np

from ..adapters.gym import GymAdapter
from ..envs.env import MultiGridEnv


class MiniGridInterface(GymAdapter):
    """Single-agent scalar facade over the multi-agent dict API.

    >>> env = MiniGridInterface(make('MultiGrid-Empty-8x8-v0'))
    >>> obs, info = env.reset(seed=0)          # scalar obs dict
    >>> obs, reward, term, trunc, info = env.step(2)
    """

    def __init__(self, env: MultiGridEnv, render_mode: str | None = None):
        assert env.num_agents == 1, (
            'MiniGridInterface requires a single-agent environment '
            '(minigrid_interface.py:33-38)'
        )
        super().__init__(env, render_mode=render_mode)

    def reset(self, **kwargs):
        obs, infos = super().reset(**kwargs)
        return obs[0], infos[0]

    def step(self, action):
        obs, rewards, terms, truncs, infos = super().step({0: int(action)})
        return obs[0], rewards[0], terms[0], truncs[0], infos[0]

    # Single-agent properties (minigrid_interface.py:61-188).

    @property
    def observation_space(self):
        return self._agent_observation_space()

    @property
    def action_space(self):
        from gymnasium import spaces

        from ..core.actions import Action
        return spaces.Discrete(len(Action))

    @property
    def agent_pos(self) -> np.ndarray:
        return np.asarray(self._state.agent_pos[0])

    @property
    def agent_dir(self) -> int:
        return int(self._state.agent_dir[0])

    @property
    def carrying(self) -> np.ndarray | None:
        """Encoding triple of the carried object, or None."""
        from ..core.constants import TYPE_EMPTY
        enc = np.asarray(self._state.agent_carrying[0])
        return None if enc[0] == TYPE_EMPTY else enc

    @property
    def steps_remaining(self) -> int:
        return int(self.env.cfg.max_steps) - int(self._state.step_count)
