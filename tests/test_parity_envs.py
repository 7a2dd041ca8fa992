"""Cross-sim differential harness for the full env zoo.

Every shipped environment's layout and trajectories must match the reference
bit-exactly under the injected-RNG parity recipe (SURVEY.md §2.4). Actions
are random, so these cover door lock/unlock, pickup/drop, ball-blocking,
post-step reward hooks, and termination logic incidentally; the scripted
tests in test_interactions.py cover them deliberately.
"""

import numpy as np
import pytest

from .test_parity_empty import run_differential


@pytest.mark.parametrize('seed', [0, 7, 123, 2024])
@pytest.mark.parametrize('num_agents', [1, 2])
def test_blockedunlockpickup(seed, num_agents):
    run_differential(
        'MultiGrid-BlockedUnlockPickup-v0', seed, num_agents, num_steps=150)


@pytest.mark.parametrize('seed', [0, 7, 99])
@pytest.mark.parametrize('num_agents', [1, 3])
def test_redbluedoors(seed, num_agents):
    run_differential(
        'MultiGrid-RedBlueDoors-6x6-v0', seed, num_agents, num_steps=150)


@pytest.mark.parametrize('seed', [0, 5])
def test_redbluedoors_8x8(seed):
    run_differential('MultiGrid-RedBlueDoors-8x8-v0', seed, 2, num_steps=150)


@pytest.mark.parametrize('seed', [0, 11, 77])
@pytest.mark.parametrize('num_agents', [2])
def test_locked_hallway_2rooms(seed, num_agents):
    run_differential(
        'MultiGrid-LockedHallway-2Rooms-v0', seed, num_agents, num_steps=150)


@pytest.mark.parametrize('seed', [0, 3])
def test_locked_hallway_4rooms(seed):
    run_differential(
        'MultiGrid-LockedHallway-4Rooms-v0', seed, 2, num_steps=120)


@pytest.mark.parametrize('seed', [0])
def test_locked_hallway_6rooms(seed):
    run_differential(
        'MultiGrid-LockedHallway-6Rooms-v0', seed, 4, num_steps=100)


@pytest.mark.parametrize('seed', [0, 13, 55])
@pytest.mark.parametrize('num_agents', [1, 2])
def test_playground(seed, num_agents):
    run_differential('MultiGrid-Playground-v0', seed, num_agents, num_steps=100)


@pytest.mark.parametrize('seed', [21])
def test_playground_many_agents(seed):
    run_differential('MultiGrid-Playground-v0', seed, 6, num_steps=100)


@pytest.mark.parametrize('seed', [3])
def test_playground_large_team(seed):
    """N > 8 exercises the scanned (non-unrolled) sub-step path."""
    run_differential('MultiGrid-Playground-v0', seed, 10, num_steps=60)


# ------------------------- non-default observation parameters
# The reference parameterizes view size and see-through-walls
# (multigrid/base.py:93-94); one differential case each closes the
# default-params-only gap in the round-1 suite.


@pytest.mark.parametrize('seed', [2, 31])
def test_view_size_5(seed):
    run_differential(
        'MultiGrid-Empty-8x8-v0', seed, 2, num_steps=120, agent_view_size=5)


@pytest.mark.parametrize('seed', [4])
def test_view_size_5_roomgrid(seed):
    run_differential(
        'MultiGrid-BlockedUnlockPickup-v0', seed, 2, num_steps=120,
        agent_view_size=5)


@pytest.mark.parametrize('seed', [6, 17])
def test_see_through_walls(seed):
    run_differential(
        'MultiGrid-Empty-8x8-v0', seed, 2, num_steps=120,
        see_through_walls=True)


@pytest.mark.parametrize('seed', [8])
def test_see_through_walls_view_9(seed):
    run_differential(
        'MultiGrid-RedBlueDoors-6x6-v0', seed, 2, num_steps=120,
        see_through_walls=True, agent_view_size=9)
