"""Jitted environment kernels: transition, observation, placement."""

from .obs import gen_obs, gen_obs_grid, gen_obs_grid_encoding, get_vis_mask
from .step import handle_actions, sample_order, step_with_order

__all__ = [
    'gen_obs', 'gen_obs_grid', 'gen_obs_grid_encoding', 'get_vis_mask',
    'handle_actions', 'sample_order', 'step_with_order',
]
