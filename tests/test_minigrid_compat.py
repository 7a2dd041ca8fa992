"""MiniGrid compat: a real Farama-minigrid env ported through the shim.

``DoorKeyEnv`` below is the Farama ``minigrid.envs.DoorKeyEnv`` generator
logic, unchanged except for imports (the porting recipe the reference
documents at multigrid/utils/minigrid_interface.py:20-38) — it exercises the
imperative ``Grid``/``WorldObj`` builder surface, rejection-sampling
``place_obj``/``place_agent``, the ``_rand_*`` helpers, and the full
single-agent facade (setters, ``dir_vec``/``front_pos``) end-to-end through
the jitted dynamics.
"""

import numpy as np
import pytest

from multigrid_tpu.core.actions import Action
from multigrid_tpu.core.constants import (
    STATE_LOCKED,
    STATE_OPEN,
    TYPE_DOOR,
    TYPE_GOAL,
    TYPE_KEY,
)
from multigrid_tpu.utils.minigrid_builder import (
    Door,
    Goal,
    Grid,
    Key,
    MiniGridCompatEnv,
)
from multigrid_tpu.utils.minigrid_interface import MiniGridInterface


class DoorKeyEnv(MiniGridCompatEnv):
    """Farama minigrid DoorKeyEnv, imports swapped (minigrid/envs/doorkey.py)."""

    mission = "use the key to open the door and then get to the goal"

    def __init__(self, size=8, max_steps=None, **kwargs):
        if max_steps is None:
            max_steps = 10 * size**2
        super().__init__(grid_size=size, max_steps=max_steps, **kwargs)

    def _gen_grid(self, width, height):
        # Create an empty grid
        self.grid = Grid(width, height)

        # Generate the surrounding walls
        self.grid.wall_rect(0, 0, width, height)

        # Place a goal in the bottom-right corner
        self.put_obj(Goal(), width - 2, height - 2)

        # Create a vertical splitting wall
        splitIdx = self._rand_int(2, width - 2)
        self.grid.vert_wall(splitIdx, 0)

        # Place the agent at a random position and orientation
        # on the left side of the splitting wall
        self.place_agent(size=(splitIdx, height))

        # Place a door in the wall
        doorIdx = self._rand_int(1, width - 2)
        self.put_obj(Door("yellow", is_locked=True), splitIdx, doorIdx)

        # Place a yellow key on the left side
        self.place_obj(obj=Key("yellow"), top=(0, 0), size=(splitIdx, height))

        self.mission = "use the key to open the door and then get to the goal"


def _find(grid: np.ndarray, type_idx: int) -> tuple[int, int]:
    xs, ys = np.nonzero(grid[:, :, 0] == type_idx)
    assert len(xs) == 1
    return int(xs[0]), int(ys[0])


def _empty_neighbor_facing(grid, x, y):
    """(pos, dir) of an empty cell adjacent to (x, y), facing it."""
    from multigrid_tpu.core.constants import TYPE_EMPTY
    for (nx, ny), d in [((x - 1, y), 0), ((x, y - 1), 1),
                        ((x + 1, y), 2), ((x, y + 1), 3)]:
        if grid[nx, ny, 0] == TYPE_EMPTY:
            return (nx, ny), d
    raise AssertionError('no empty neighbor')


@pytest.fixture(scope='module')
def env():
    e = MiniGridInterface(DoorKeyEnv(size=6))
    yield e
    e.close()


def test_doorkey_layout(env):
    obs, _ = env.reset(seed=3)
    grid = np.asarray(env._state.grid)
    assert obs['image'].shape == (7, 7, 3)
    assert obs['mission'] == DoorKeyEnv.mission
    kx, ky = _find(grid, TYPE_KEY)
    dx, dy = _find(grid, TYPE_DOOR)
    gx, gy = _find(grid, TYPE_GOAL)
    assert (gx, gy) == (4, 4)
    assert grid[dx, dy, 2] == STATE_LOCKED
    # Key and agent are both strictly left of the splitting wall.
    assert kx < dx and env.agent_pos[0] < dx


def test_doorkey_solve(env):
    """Pick up the key, unlock the door, reach the goal — full dynamics."""
    env.reset(seed=3)
    grid = np.asarray(env._state.grid)
    kx, ky = _find(grid, TYPE_KEY)
    dx, dy = _find(grid, TYPE_DOOR)

    # Teleport next to the key (exercises the pos/dir setters) and pick up.
    pos, d = _empty_neighbor_facing(grid, kx, ky)
    env.agent_pos = pos
    env.agent_dir = d
    np.testing.assert_array_equal(env.front_pos, [kx, ky])
    env.step(Action.pickup)
    assert env.carrying is not None and env.carrying[0] == TYPE_KEY

    # Unlock the door with one toggle (world_object.py:458-474 semantics).
    env.agent_pos = (dx - 1, dy)
    env.agent_dir = 0  # facing right
    np.testing.assert_array_equal(env.dir_vec, [1, 0])
    env.step(Action.toggle)
    grid = np.asarray(env._state.grid)
    assert grid[dx, dy, 2] == STATE_OPEN

    # Walk through the open door.
    _, reward, term, trunc, _ = env.step(Action.forward)
    np.testing.assert_array_equal(env.agent_pos, [dx, dy])

    # Step onto the goal from above.
    env.agent_pos = (4, 3)
    env.agent_dir = 1  # facing down
    _, reward, term, trunc, _ = env.step(Action.forward)
    assert term and reward > 0


def test_place_agent_respects_region(env):
    env.reset(seed=5)
    grid = np.asarray(env._state.grid)
    dx, _ = _find(grid, TYPE_DOOR)
    for _ in range(5):
        x, y = env.place_agent(size=(dx, env.env.height))
        assert 0 < x < dx


def test_space_setters(env):
    import gymnasium.spaces as sp
    env.reset(seed=0)
    assert isinstance(env.action_space, sp.Discrete)
    custom = sp.Discrete(3)
    env.action_space = custom
    assert env.action_space is custom
    env.action_space = None
    obs_space = env.observation_space
    env.observation_space = sp.Box(0, 1, (2,))
    assert env.observation_space.shape == (2,)
    env.observation_space = None
    assert type(env.observation_space) is type(obs_space)


def test_grid_encode_decode_roundtrip(env):
    """Builder-Grid encode/decode/slice (multigrid/core/grid.py:310-347)."""
    env.reset(seed=3)
    grid = env.env.grid  # the host-side builder Grid from the last reset
    enc = grid.encode()
    assert enc.shape == (grid.width, grid.height, 3)
    decoded, vis = Grid.decode(enc)
    assert vis.all()
    np.testing.assert_array_equal(decoded.data, grid.data)

    # Masked encode marks invisible cells unseen; decode recovers the mask.
    mask = np.ones((grid.width, grid.height), dtype=bool)
    mask[0, :] = False
    enc_m = grid.encode(mask)
    assert (enc_m[0, :, 0] == 0).all()  # unseen type index
    _, vis2 = Grid.decode(enc_m)
    np.testing.assert_array_equal(vis2, mask)

    # slice: in-bounds cells copied, out-of-bounds read as walls.
    sub = grid.slice(-1, -1, 3, 3)
    assert sub.data[0, 0, 0] == 2  # wall
    np.testing.assert_array_equal(sub.data[1, 1], grid.data[0, 0])


def test_rand_color_is_name(env):
    from multigrid_tpu.core.constants import Color
    names = {c.value for c in Color}
    for _ in range(10):
        c = env.env._rand_color()
        assert isinstance(c, str) and c in names
    # WorldObj constructors accept the name, and it formats bare in missions.
    assert f'pick up the {env.env._rand_color()} ball'.count('Color.') == 0
    Key(env.env._rand_color())
