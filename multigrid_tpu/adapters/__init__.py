"""Host-side framework adapters.

Thin stateful views over the functional batched core, re-creating the
reference's integration surface: Gymnasium (multigrid/base.py:36 as a
``gym.Env``), PettingZoo (multigrid/pettingzoo/__init__.py), and RLlib
(multigrid/rllib/__init__.py). Heavy compute stays jitted on device; the
adapters only shuttle small dicts across the host boundary.
"""

from .gym import GymAdapter, register_gymnasium_envs
from .pettingzoo import PettingZooWrapper, to_pettingzoo_env
from .rllib import RLlibWrapper, to_rllib_env

__all__ = [
    'GymAdapter', 'PettingZooWrapper', 'RLlibWrapper',
    'register_gymnasium_envs', 'to_pettingzoo_env', 'to_rllib_env',
]
