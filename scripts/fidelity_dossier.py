"""Fidelity dossier: quantify solver agreement with independent oracles for
every BASELINE.json config, per-solve and closed-loop.

Writes FIDELITY.md.  CasADi/IPOPT cannot be installed in this image
(`pip install casadi` -> "no matching distribution", zero-egress), so the
oracles are scipy ``trust-constr`` (interior-point family, same as IPOPT)
and L-BFGS-B, both run on the SAME OCP functions with exact JAX derivatives
in float64 (mmmpc_tpu/verify/oracle.py).  Three measurements per config:

1. per-solve: max|dU| and relative cost gap vs the oracle on a
   representative solve of that formulation;
2. closed-loop divergence: roll the model plant T ticks with the framework
   solver vs with the oracle as the controller; report the max state
   deviation along the trajectory (the metric that matters for control);
3. tight-tolerance self-consistency at the demo horizon N=20: the
   production solve vs a 3x-budget f64 solve of the same problem.

Run on CPU:  JAX_PLATFORMS=cpu python scripts/fidelity_dossier.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mmmpc_tpu.controllers import (  # noqa: E402
    MPCBase, MPCManipulator3DoF, MPCWholeBody, MPCWholeBodyMovingObs,
)
from mmmpc_tpu.models.obstacles import Obstacles  # noqa: E402
from mmmpc_tpu.models.robots import (  # noqa: E402
    Base, ManipulatorPanda3DoF, MobileManipulator,
)
from mmmpc_tpu.solver import al_ilqr_solve  # noqa: E402
from mmmpc_tpu.utils.configs import SolverConfig, make_scenario  # noqa: E402
from mmmpc_tpu.verify.oracle import lbfgs_solve, scipy_solve  # noqa: E402

DT = 0.1
TIGHT = SolverConfig(al_iters=10, ilqr_iters=25, ilqr_iters_later=15,
                     constraint_tol=1e-6)


def scenario_cfgs():
    """The five BASELINE.json configs as (name, controller, x0, traj, u_ref,
    closed_loop_T)."""
    out = []
    for s in (0, 1, 2):
        sc = make_scenario(s, N=8)
        hp = [(sc.hp_points[j], sc.hp_normals[j][None, :])
              for j in range(int(sc.hp_mask.sum()))]
        obstacles = [Obstacles(*row) for row in sc.ground_obstacles]
        mpc = MPCWholeBody(MobileManipulator(DT), obstacles, hp, N=8,
                           solver_config=TIGHT)
        x0 = np.array(sc.x_start, dtype=float)
        # a move-phase window toward the stand-off target
        tgt = np.concatenate([[sc.global_pose_target[0] - 0.6,
                               sc.global_pose_target[1], 0, 0, 0, 0],
                              x0[6:]])
        traj = np.linspace(x0, x0 + 0.12 * (tgt - x0), 9)
        out.append((f"demo scenario {s} (wholebody qref)", mpc, x0, traj,
                    np.zeros((8, 5)), 10))

    base = MPCBase(Base(DT), [Obstacles(1.2, 0.1, 0.3)], N=12,
                   solver_config=TIGHT)
    x0b = np.zeros(6)
    trajb = np.linspace(x0b, np.array([2.5, 0, 0, 0, 0, 0]), 13)
    out.append(("base-only (MPCBase)", base, x0b, trajb,
                np.zeros((12, 2)), 10))

    arm = MPCManipulator3DoF(ManipulatorPanda3DoF(DT), [], [], N=10,
                             solver_config=TIGHT)
    q0 = np.array([0.3, -1.2, 1.2])
    trajq = np.linspace(q0, np.array([0.0, -0.6, 0.9]), 11)
    out.append(("arm-only (MPCManipulator3DoF)", arm, q0, trajq,
                np.zeros((10, 3)), 10))

    sc1 = make_scenario(1, N=8)
    obstacles = [Obstacles(*row) for row in sc1.ground_obstacles]
    mov = MPCWholeBodyMovingObs(MobileManipulator(DT), obstacles, [], N=8,
                                solver_config=TIGHT)
    mov.observe_obstacles(np.asarray(sc1.ground_obstacles)[:, :2],
                          np.tile([0.05, 0.0], (len(obstacles), 1)))
    x0m = np.array(sc1.x_start, dtype=float)
    tgtm = np.concatenate([[1.2, 0.4, 0, 0, 0, 0], x0m[6:]])
    trajm = np.linspace(x0m, x0m + 0.12 * (tgtm - x0m), 9)
    out.append(("moving-obs (MPCWholeBodyMovingObs)", mov, x0m, trajm,
                np.zeros((8, 5)), 10))
    return out


def _oracle_violation(ocp, x0, U, params):
    """Max hard-constraint violation of an oracle solution (the oracles do
    not all enforce every constraint: L-BFGS-B is a RELAXATION that ignores
    state/rate boxes — see verify/oracle.py docstring)."""
    from mmmpc_tpu.verify.oracle import _plain_rollout
    ks = jnp.arange(ocp.N)
    X = _plain_rollout(ocp, jnp.asarray(x0, jnp.float64), U)
    parts = []
    cs = jax.vmap(lambda x, u, k: ocp.stage_ineq(x, u, k, params))(
        X[:-1], U, ks)
    if cs.size:
        parts.append(jnp.max(cs))
    ct = ocp.terminal_ineq(X[-1], params)
    if ct.size:
        parts.append(jnp.max(ct))
    return float(max(map(float, parts))) if parts else 0.0


ORACLE_FEAS_TOL = 1e-6


def per_solve_row(mpc, x0, traj, u_ref):
    u0 = mpc.solve(x0, traj, u_ref)
    res = mpc.last_result
    N, nu = mpc.ocp.N, mpc.ocp.nu
    params = dict(mpc.make_params(traj, u_ref), U_last=jnp.zeros((N, nu)))
    U_l, X_l, cost_l, _ = lbfgs_solve(mpc.ocp, jnp.asarray(x0),
                                      jnp.zeros((N, nu)), params)
    viol_l = _oracle_violation(mpc.ocp, x0, U_l, params)
    try:
        U_t, X_t, cost_t, _ = scipy_solve(mpc.ocp, jnp.asarray(x0),
                                          jnp.zeros((N, nu)), params,
                                          maxiter=2000)
        viol_t = _oracle_violation(mpc.ocp, x0, U_t, params)
    except Exception:
        U_t, cost_t, viol_t = None, np.inf, np.inf
    # compare against the best FEASIBLE oracle.  Comparing raw costs would
    # systematically select the L-BFGS-B relaxation whenever a state/rate
    # constraint is active at the optimum (round-3 arm row: the "better"
    # L-BFGS-B cost violated the |du|<=0.5 rate bound by exactly the
    # reported dU=4.8e-2; the feasible trust-constr oracle agrees with this
    # solver to 1.2e-6).
    cands = []
    if viol_l <= ORACLE_FEAS_TOL:
        cands.append((cost_l, U_l, viol_l, "L-BFGS-B"))
    if U_t is not None and viol_t <= ORACLE_FEAS_TOL:
        cands.append((cost_t, U_t, viol_t, "trust-constr"))
    if not cands:   # no feasible oracle: fall back to the least infeasible
        cands = [(cost_l, U_l, viol_l, "L-BFGS-B (infeasible)")]
        if U_t is not None:
            cands.append((cost_t, U_t, viol_t, "trust-constr (infeasible)"))
        cands.sort(key=lambda c: c[2])
        cands = cands[:1]
    cost_o, U_o, viol_o, which = min(cands, key=lambda c: c[0])
    dU = float(np.max(np.abs(np.asarray(res.U) - np.asarray(U_o))))
    dcost = float(res.cost - cost_o) / max(abs(cost_o), 1e-12)
    return dU, dcost, which, float(res.max_violation), viol_o


def closed_loop_row(mpc, x0, traj, u_ref, T, which="L-BFGS-B"):
    """Max state deviation between framework-in-the-loop and
    oracle-in-the-loop rollouts of the model plant.  Uses the oracle that
    won the per-solve row (the relaxation is wrong whenever a state/rate
    constraint is active along the loop)."""
    N, nu = mpc.ocp.N, mpc.ocp.nu
    dyn = mpc.ocp.dynamics

    x_f = jnp.asarray(x0, jnp.float64)
    mpc.reset_warmstart()
    xs_f = [np.asarray(x_f)]
    for _ in range(T):
        u0 = mpc.solve(np.asarray(x_f), traj, u_ref)
        x_f = dyn(x_f, jnp.asarray(u0))
        xs_f.append(np.asarray(x_f))

    oracle = (scipy_solve if which.startswith("trust-constr")
              else lbfgs_solve)
    x_o = jnp.asarray(x0, jnp.float64)
    U_warm = jnp.zeros((N, nu), jnp.float64)
    xs_o = [np.asarray(x_o)]
    for _ in range(T):
        params = dict(mpc.make_params(traj, u_ref), U_last=U_warm)
        U_o, _, _, _ = oracle(mpc.ocp, x_o, U_warm, params)
        x_o = dyn(x_o, jnp.asarray(U_o[0]))
        U_warm = jnp.asarray(U_o)
        xs_o.append(np.asarray(x_o))
    dev = np.max(np.abs(np.stack(xs_f) - np.stack(xs_o)))
    return float(dev)


def self_consistency_n20():
    """Production config vs 3x-budget f64 solve at the demo horizon N=20."""
    sc = make_scenario(1, N=20)
    hp = [(sc.hp_points[j], sc.hp_normals[j][None, :])
          for j in range(int(sc.hp_mask.sum()))]
    obstacles = [Obstacles(*row) for row in sc.ground_obstacles]
    mpc = MPCWholeBody(MobileManipulator(DT), obstacles, hp, N=20)
    x0 = np.array([4.45, 5.06, -np.pi, 0, 0, 0, -np.pi / 4, -np.pi, np.pi])
    traj = np.linspace(x0, np.concatenate([x0[:6], [0.3, -1.0, 1.0]]), 21)
    u_ref = np.zeros((20, 5))
    params = dict(mpc.make_params(traj, u_ref), U_last=jnp.zeros((20, 5)))

    prod = SolverConfig(al_iters=8, ilqr_iters=20, ilqr_iters_later=12,
                        cost_scale=1e5, constraint_tol=1e-3, n_alpha=3,
                        alpha_decay=0.35)
    xtreme = SolverConfig(al_iters=14, ilqr_iters=40, constraint_tol=1e-6)
    r1 = al_ilqr_solve(mpc.ocp, jnp.asarray(x0), jnp.zeros((20, 5)),
                       params, prod)
    r2 = al_ilqr_solve(mpc.ocp, jnp.asarray(x0), jnp.zeros((20, 5)),
                       params, xtreme)
    dU = float(jnp.max(jnp.abs(r1.U - r2.U)))
    dc = float(abs(r1.cost - r2.cost) / abs(r2.cost))
    return dU, dc, float(r2.max_violation)


# Per-config acceptance bounds, enforced by main() (non-zero exit on
# regression).  Values are ~10x the measured round-4 numbers (FIDELITY.md
# table) — tight enough to catch a real fidelity break, loose enough for
# solver-tolerance noise.  dU is vs the best FEASIBLE oracle.
ACCEPTANCE = {
    "demo scenario 0 (wholebody qref)": dict(dU=1e-3, viol=1e-6),
    "demo scenario 1 (wholebody qref)": dict(dU=1e-3, viol=1e-6),
    "demo scenario 2 (wholebody qref)": dict(dU=1e-3, viol=1e-6),
    "base-only (MPCBase)": dict(dU=1e-4, viol=1e-6),
    "arm-only (MPCManipulator3DoF)": dict(dU=1e-4, viol=1e-6),
    "moving-obs (MPCWholeBodyMovingObs)": dict(dU=1e-4, viol=1e-6),
}
# Self-consistency (N=20 qref, production vs 3x-budget f64): the acceptance
# metric is relative cost at feasibility, NOT dU — scripts/
# fidelity_analysis.py shows the landscape has near-equal minima O(1) apart
# in U (tight-polishing the production iterate lands 2.9 away from it and
# 1.3 away from the tight-from-scratch solution at rel dcost -6e-5).
SELF_CONSISTENCY_RELDC = 5e-3


def run_config(i: int):
    """One config's rows (run in its own process; see main's fan-out)."""
    name, mpc, x0, traj, u_ref, T = scenario_cfgs()[i]
    dU, dcost, which, viol, oviol = per_solve_row(mpc, x0, traj, u_ref)
    dev = closed_loop_row(mpc, x0, traj, u_ref, T, which)
    return {"name": name, "dU": dU, "dcost": dcost, "oracle": which,
            "viol": viol, "oracle_viol": oviol, "dev": dev}


def main():
    import json
    import subprocess

    if "--config" in sys.argv:
        print("JSON:" + json.dumps(
            run_config(int(sys.argv[sys.argv.index("--config") + 1]))))
        return
    if "--self" in sys.argv:
        dU, dc, viol2 = self_consistency_n20()
        print("JSON:" + json.dumps({"dU": dU, "dc": dc, "viol2": viol2}))
        return

    # fan out: one process per config (the oracles are single-threaded
    # scipy; the box has plenty of cores)
    n_cfg = len(scenario_cfgs())
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), flag, str(i)],
        stdout=subprocess.PIPE, text=True)
        for flag, i in [("--config", i) for i in range(n_cfg)]
        + [("--self", 0)]]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=3600)
        assert p.returncode == 0, out
        outs.append(json.loads(
            [ln for ln in out.splitlines() if ln.startswith("JSON:")][-1][5:]))
    rows, selfrow = outs[:n_cfg], outs[n_cfg]

    lines = [
        "# FIDELITY — solver agreement with independent oracles",
        "",
        "Generated by `scripts/fidelity_dossier.py` (float64, CPU).  CasADi/",
        "IPOPT cannot be installed in this image (`pip install casadi`:",
        "no matching distribution, zero-egress environment), so the oracles",
        "are scipy trust-constr (interior-point, IPOPT's family) and",
        "L-BFGS-B on the same OCP functions with exact JAX derivatives —",
        "agreement between unrelated solvers on the identical problem.",
        "The comparison oracle per row is the best FEASIBLE one (max",
        "violation <= 1e-6): L-BFGS-B ignores state/rate boxes by design",
        "(verify/oracle.py), so whenever one of those is active its lower",
        "cost is a relaxation bound, not a solution (this mislabeled the",
        "round-3 arm row: the relaxation violated the |du| <= 0.5 rate",
        "bound by exactly the reported dU = 4.8e-2).",
        "",
        "| Config | per-solve max dU | rel dcost | oracle | oracle viol |"
        " our viol | closed-loop max dev (T=10) | accept dU |",
        "|---|---|---|---|---|---|---|---|",
    ]
    failures = []
    for r in rows:
        acc = ACCEPTANCE[r["name"]]
        lines.append(f"| {r['name']} | {r['dU']:.2e} | {r['dcost']:+.2e} |"
                     f" {r['oracle']} | {r['oracle_viol']:.1e} |"
                     f" {r['viol']:.1e} | {r['dev']:.2e} |"
                     f" {acc['dU']:.0e} |")
        print(lines[-1], flush=True)
        if r["dU"] > acc["dU"]:
            failures.append(f"{r['name']}: dU {r['dU']:.2e} > {acc['dU']:g}")
        if r["viol"] > acc["viol"]:
            failures.append(f"{r['name']}: viol {r['viol']:.2e} "
                            f"> {acc['viol']:g}")

    dU, dc, viol2 = selfrow["dU"], selfrow["dc"], selfrow["viol2"]
    if dc > SELF_CONSISTENCY_RELDC:
        failures.append(f"self-consistency rel dcost {dc:.2e} "
                        f"> {SELF_CONSISTENCY_RELDC:g}")
    lines += [
        "",
        f"Self-consistency at the demo horizon (N=20, scenario-1 stack,"
        f" manipulate-phase start): production config vs 3x-budget f64"
        f" tight-tolerance solve — max|dU| {dU:.2e}, rel dcost {dc:.2e}"
        f" (tight solve violation {viol2:.1e}).  **Acceptance metric: rel"
        f" dcost <= {SELF_CONSISTENCY_RELDC:g} at feasibility — NOT dU.**"
        f" The redundantly-actuated whole-body problem has near-equal"
        f" minima far apart in U-space: tight-polishing the production"
        f" iterate in f64 lands max|dU| 2.9 from the production iterate and"
        f" 1.3 from the tight-from-scratch solution while reaching rel"
        f" dcost -6e-5 vs the latter (scripts/fidelity_analysis.py) —"
        f" i.e. three near-identical-cost feasible solutions, pairwise O(1)"
        f" apart.  The production budget's 0.35% cost gap at its 1e-3"
        f" violation tolerance is the schedule's speed/accuracy tradeoff.",
        "",
        "Negative rel dcost = our solution is *better* (lower cost at"
        " feasibility) than the oracle's.",
        "",
        "Acceptance bounds (enforced by this script; non-zero exit on"
        " regression): per-config dU columns above, our viol <= 1e-6,"
        f" self-consistency rel dcost <= {SELF_CONSISTENCY_RELDC:g}.",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "FIDELITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote", out)
    if failures:
        print("FIDELITY ACCEPTANCE FAILURES:", file=sys.stderr)
        for fmsg in failures:
            print("  " + fmsg, file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
