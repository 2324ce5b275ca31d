"""Checkpoint / resume round-trips for solver and closed-loop state."""

import numpy as np

from demo_wholebody_qref import build_world
from mmmpc_tpu.runtime.checkpoint import LoopState, SolverState, load, save


def test_solver_state_roundtrip(tmp_path):
    world = build_world(0, N=10, physical_sim=False)
    # run a few ticks to populate warm-start state
    world.current_state = world.x_start
    world.task_flag = "move"
    world.is_active = True
    for _ in range(3):
        world.pseudoTimer()
    st = SolverState.capture(world.controller)
    path = tmp_path / "solver.npz"
    save(path, st)
    st2 = load(path)
    np.testing.assert_allclose(st2.u_latest, np.asarray(st.u_latest))
    assert st2.terminal_eq_mask == st.terminal_eq_mask


def test_loop_state_roundtrip_and_resume(tmp_path):
    world = build_world(0, N=10, physical_sim=False)
    world.current_state = world.x_start
    world.task_flag = "move"
    world.is_active = True
    for _ in range(5):
        world.pseudoTimer()
    snap = LoopState.capture(world)
    path = tmp_path / "loop.npz"
    save(path, snap)

    # continue the original for 3 more ticks
    for _ in range(3):
        world.pseudoTimer()
    state_a = world.current_state.copy()

    # restore a fresh world from disk and replay the same 3 ticks
    world2 = build_world(0, N=10, physical_sim=False)
    load(path).restore(world2)
    world2.is_active = True
    for _ in range(3):
        world2.pseudoTimer()
    np.testing.assert_allclose(world2.current_state, state_a, atol=1e-10)
