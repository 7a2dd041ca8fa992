"""Core state model: constants, actions, dense state pytree, static config."""

from .actions import Action
from .config import EnvConfig
from .constants import Color, Direction, State, Type, TILE_PIXELS
from .state import MultiGridState, init_state, state_from_numpy

__all__ = [
    'Action', 'Color', 'Direction', 'EnvConfig', 'MultiGridState', 'State',
    'TILE_PIXELS', 'Type', 'init_state', 'state_from_numpy',
]
