"""Pixel-exact render parity against the live reference.

Frames from our tile renderer (multigrid_tpu/render.py) must be bit-equal to
the reference's ``MultiGridEnv.get_frame`` (base.py:758-783 → Grid.render,
core/grid.py:259-308, per-type world_object renderers) on identical states —
the same golden standard the trajectory suite applies to observations.
States are matched via the ParityRunner RNG-injection recipe (SURVEY.md
§2.4); the view-cone highlight mask is included (highlight=True exercises
gen_obs + the world-coordinate cone, base.py:707-756).
"""

import numpy as np
import pytest

from multigrid_tpu.envs import make
from multigrid_tpu.envs.parity import ParityRunner
from multigrid_tpu.render import render_state

from .ref_loader import open_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(),
    reason='live reference required for frame comparison',
)


def assert_frames_equal(ref_frame, our_frame, label):
    ref_frame = np.asarray(ref_frame)
    our_frame = np.asarray(our_frame)
    assert ref_frame.shape == our_frame.shape, (
        label, ref_frame.shape, our_frame.shape)
    if not np.array_equal(ref_frame, our_frame):
        diff = np.argwhere((ref_frame != our_frame).any(-1))
        px = tuple(diff[0])
        raise AssertionError(
            f'{label}: {len(diff)} differing pixels, first at {px}: '
            f'ref={ref_frame[px]} ours={our_frame[px]}')


@pytest.mark.parametrize('env_id,num_agents,steps', [
    ('MultiGrid-Empty-8x8-v0', 2, 6),
    ('MultiGrid-BlockedUnlockPickup-v0', 2, 10),
    ('MultiGrid-RedBlueDoors-6x6-v0', 2, 8),
    ('MultiGrid-LockedHallway-2Rooms-v0', 2, 8),
    ('MultiGrid-Playground-v0', 2, 6),
])
@pytest.mark.parametrize('highlight', [True, False])
def test_frame_parity(env_id, num_agents, steps, highlight):
    seed = 12
    ref = open_reference(env_id, seed, num_agents)
    env = make(env_id, agents=num_agents)
    runner = ParityRunner(env, seed)
    runner.reset()

    assert_frames_equal(
        ref.env.get_frame(highlight=highlight, tile_size=32),
        render_state(env, runner.state, highlight=highlight, tile_size=32),
        f'{env_id} t=reset highlight={highlight}',
    )

    rng = np.random.default_rng(seed + 1000)
    for t in range(steps):
        actions = {i: int(rng.integers(0, 7)) for i in range(num_agents)}
        ref.step(actions)
        runner.step(actions)
    assert_frames_equal(
        ref.env.get_frame(highlight=highlight, tile_size=32),
        render_state(env, runner.state, highlight=highlight, tile_size=32),
        f'{env_id} t={steps} highlight={highlight}',
    )


def test_frame_parity_tile_size_16():
    """Supersampling + downsample path at a non-default tile size."""
    seed = 3
    ref = open_reference('MultiGrid-Empty-8x8-v0', seed, 2)
    env = make('MultiGrid-Empty-8x8-v0', agents=2)
    runner = ParityRunner(env, seed)
    runner.reset()
    assert_frames_equal(
        ref.env.get_frame(highlight=True, tile_size=16),
        render_state(env, runner.state, highlight=True, tile_size=16),
        'tile_size=16',
    )
