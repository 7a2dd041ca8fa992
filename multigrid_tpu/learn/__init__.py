"""Co-located RL training on the env mesh.

The reference's training path hands rollouts to Ray/RLlib worker processes and
a torch learner (multigrid/scripts/train.py). Here rollout generation and the
PPO learner are one jit-compiled program on the same device mesh: envs shard
over the ``'env'`` axis, parameters are replicated (gradient ``psum`` is the
only cross-chip collective, inserted by XLA), and the policy's dense layers
may additionally shard over ``'model'``.
"""

from .nets import ActorCritic, CentralizedCritic
from .ppo import (
    PPOConfig,
    Rollout,
    TrainState,
    make_centralized_critic,
    make_train_loop,
    make_train_step,
    ppo_init,
)

__all__ = [
    'ActorCritic', 'CentralizedCritic', 'PPOConfig', 'Rollout', 'TrainState',
    'make_centralized_critic', 'make_train_loop', 'make_train_step',
    'ppo_init',
]
