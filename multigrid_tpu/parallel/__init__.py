"""Batched lockstep execution and multi-chip sharding.

The scaling axis of this framework is the **environment batch**: thousands of
environments run in lockstep via ``vmap`` on one chip and shard across chips
and hosts over the ``env`` axis of a ``jax.sharding.Mesh``. (The reference
delegates rollout parallelism to Ray worker processes,
multigrid/scripts/train.py:147-151; here it is a device mesh dimension.)
"""

from .mesh import env_sharding, make_mesh, replicated_sharding
from .vector import VectorEnv

__all__ = ['VectorEnv', 'env_sharding', 'make_mesh', 'replicated_sharding']
