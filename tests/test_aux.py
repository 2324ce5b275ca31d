"""Auxiliary subsystems: debugging helpers, profiling timers, metrics sink,
long-horizon capability."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from mmmpc_tpu.controllers import MPCWholeBody
from mmmpc_tpu.models.obstacles import Obstacles
from mmmpc_tpu.models.robots import MobileManipulator
from mmmpc_tpu.utils.configs import SolverConfig
from mmmpc_tpu.utils.debugging import assert_finite_result, describe_result
from mmmpc_tpu.utils.profiling import SectionTimer


def test_long_horizon_solve():
    """The 'sequence length' analogue: a 60-step horizon (3x the demo's)
    solves in the same compiled structure (SURVEY.md §5 long-context row)."""
    N = 60
    mpc = MPCWholeBody(MobileManipulator(0.1), [Obstacles(2.0, 0.3, 0.4)],
                       [], N=N, solver_config=SolverConfig(al_iters=6,
                                                           ilqr_iters=25))
    x0 = np.zeros(9)
    x0[6:] = [0, -1.0, 1.0]
    target = np.concatenate([[3.0, 0.5, 0, 0, 0, 0], x0[6:]])
    traj = np.linspace(x0, target, N + 1)
    u0 = mpc.solve(x0, traj, np.zeros((N, 5)))
    res = mpc.last_result
    assert res.U.shape == (N, 5)
    assert_finite_result(res)
    assert float(res.max_violation) < 1e-4
    # makes real progress over the long horizon
    assert float(res.X[-1, 0]) > 2.0


def test_describe_result_formats():
    mpc = MPCWholeBody(MobileManipulator(0.1), [], [], N=5,
                       solver_config=SolverConfig(al_iters=2, ilqr_iters=4))
    x0 = np.zeros(9)
    x0[6:] = [0, -1.0, 1.0]
    traj = np.tile(x0, (6, 1))
    mpc.solve(x0, traj, np.zeros((5, 5)))
    s = describe_result(mpc.last_result)
    assert "cost=" in s and "converged=" in s


def test_section_timer():
    t = SectionTimer()
    with t.section("a"):
        sum(range(1000))
    with t.section("a"):
        sum(range(1000))
    s = t.summary()
    assert s["a"]["count"] == 2
    assert s["a"]["total_s"] > 0


def test_metrics_dump(tmp_path):
    from demo_wholebody_qref import build_world
    world = build_world(0, N=10, physical_sim=False)
    world.current_state = world.x_start
    world.task_flag = "move"
    world.is_active = True
    for _ in range(3):
        world.timerCallback()   # one MPC solve per call
    path = tmp_path / "metrics.json"
    world.metrics.dump_json(path)
    records = json.loads(path.read_text())
    assert len(records) == 3
    assert {"step", "task_flag", "cost", "max_violation", "converged",
            "solve_latency_s"} <= set(records[0])


def test_worst_scenario_report():
    """Forensics helper surfaces the argmax-violation scenario with a
    per-constraint-group breakdown (reference failure dump analogue)."""
    import jax.numpy as jnp
    import numpy as np

    from mmmpc_tpu.solver.batched import al_ilqr_solve_batched
    from mmmpc_tpu.utils.configs import SolverConfig
    from mmmpc_tpu.utils.debugging import worst_scenario_report
    from tests.test_solver import make_demo_ocp

    N = 10
    ocp = make_demo_ocp(N=N)
    params = {"X_ref": jnp.tile(jnp.array([3.0, 0.0]), (N + 1, 1)),
              "U_ref": jnp.zeros((N, 1))}
    # starve the solver so some scenarios stay infeasible w.r.t. the v-limit
    cfg = SolverConfig(al_iters=1, ilqr_iters=2)
    x0_b = jnp.stack([jnp.array([0.0, 0.0]), jnp.array([-3.0, 0.0])])
    res = al_ilqr_solve_batched(ocp, x0_b, jnp.zeros((2, N, 1)), params, cfg)
    rep = worst_scenario_report(ocp, res, params, top_k=2)
    assert "scenario" in rep and "stage ineq" in rep
    # the worst scenario leads the report
    worst = int(np.argmax(np.asarray(res.max_violation)))
    assert f"-- scenario {worst}:" in rep.splitlines()[1]


def test_report_unconverged_fires_on_forced_failure():
    """The failure dump is WIRED, not just implemented: a batch with a
    starved budget (some scenarios unconverged) makes report_unconverged
    print the worst-scenario forensics; a converged batch keeps it silent."""
    import io

    import jax.numpy as jnp
    import numpy as np

    from mmmpc_tpu.solver.batched import al_ilqr_solve_batched
    from mmmpc_tpu.utils.configs import SolverConfig
    from mmmpc_tpu.utils.debugging import report_unconverged
    from tests.test_solver import make_demo_ocp

    N = 10
    ocp = make_demo_ocp(N=N)
    params = {"X_ref": jnp.tile(jnp.array([3.0, 0.0]), (N + 1, 1)),
              "U_ref": jnp.zeros((N, 1))}
    cfg = SolverConfig(al_iters=1, ilqr_iters=2)   # starved on purpose
    x0_b = jnp.stack([jnp.array([0.0, 0.0]), jnp.array([-3.0, 0.0])])
    res = al_ilqr_solve_batched(ocp, x0_b, jnp.zeros((2, N, 1)), params, cfg)
    assert not bool(np.asarray(res.converged).all())
    buf = io.StringIO()
    fired = report_unconverged(ocp, res, params, top_k=2, file=buf)
    assert fired
    out = buf.getvalue()
    assert "unconverged" in out and "-- scenario" in out

    # easy problem + adequate budget -> all converged -> silent
    params_easy = {"X_ref": jnp.zeros((N + 1, 2)), "U_ref": jnp.zeros((N, 1))}
    cfg_ok = SolverConfig(al_iters=4, ilqr_iters=12)
    res_ok = al_ilqr_solve_batched(
        ocp, jnp.zeros((2, 2)), jnp.zeros((2, N, 1)), params_easy, cfg_ok)
    assert bool(np.asarray(res_ok.converged).all())
    buf2 = io.StringIO()
    assert not report_unconverged(ocp, res_ok, params_easy, file=buf2)
    assert buf2.getvalue() == ""


def test_rollout_failure_report_fires():
    """Closed-loop twin: the engine driver dumps worst rollouts when a tick
    violates the tolerance (forced via an impossible tolerance)."""
    import io

    import jax
    import jax.numpy as jnp

    from mmmpc_tpu.sim.batch_engine import (
        make_batch_closed_loop, run_with_failure_report,
    )
    from mmmpc_tpu.utils.configs import SolverConfig
    from tests.test_solver import make_demo_ocp

    N, T, B = 5, 3, 2
    ocp = make_demo_ocp(N=N)
    cfg = SolverConfig(al_iters=2, ilqr_iters=4)
    run = jax.jit(make_batch_closed_loop(ocp, cfg, {}, [0], n_ticks=T))
    x0_b = jnp.array([[0.0, 0.0], [-2.0, 0.0]])
    traj = jnp.tile(jnp.array([3.0, 0.0]), (B, 12, 1))
    u_ref = jnp.zeros((B, 11, 1))

    buf = io.StringIO()
    log = run_with_failure_report(run, x0_b, traj, u_ref,
                                  constraint_tol=-1.0, file=buf)  # forced
    assert log.X.shape == (B, T + 1, 2)
    assert "worst-scenario report" in buf.getvalue()

    buf2 = io.StringIO()
    run_with_failure_report(run, x0_b, traj, u_ref, constraint_tol=1e9,
                            file=buf2)
    assert buf2.getvalue() == ""
