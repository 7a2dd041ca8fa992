"""Core state model: constants, actions, dense state pytree, static config.

Import parity with ``multigrid.core`` (reference core/__init__.py): the
``Grid``/``WorldObj`` names resolve to the host-side imperative builders
(utils/minigrid_builder.py) used for porting — on-device state is the dense
:class:`MultiGridState` pytree.
"""

from .actions import Action
from .config import EnvConfig
from .constants import Color, Direction, State, Type, TILE_PIXELS
from .mission import Mission, MissionSpace
from .state import MultiGridState, init_state, state_from_numpy


def __getattr__(name):
    # Lazy: the builder imports envs/layout which imports constants — avoid
    # a cycle at package-import time.
    _builder_names = {
        'Grid', 'WorldObj', 'Wall', 'Floor', 'Goal', 'Lava', 'Key', 'Ball',
        'Box', 'Door',
    }
    if name in _builder_names:
        from ..utils import minigrid_builder
        return getattr(minigrid_builder, name)
    raise AttributeError(f'module {__name__!r} has no attribute {name!r}')


__all__ = [
    'Action', 'Ball', 'Box', 'Color', 'Direction', 'Door', 'EnvConfig',
    'Floor', 'Goal', 'Grid', 'Key', 'Lava', 'Mission', 'MissionSpace',
    'MultiGridState', 'State', 'TILE_PIXELS', 'Type', 'Wall', 'WorldObj',
    'init_state', 'state_from_numpy',
]
