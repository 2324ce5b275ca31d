"""Diff-drive base point-tracking MPC with ground-obstacle avoidance.

Reference: /root/reference/controllers/mpc_base.py.  Peculiarities kept:
- the yaw tracking error uses the wrap-aware angle difference in the cost
  (mpc_base.py:146-150),
- the 5-wide xlim is applied as boxes on (x, y) and on (dx, dy, dpsi) — the
  yaw itself is unbounded (mpc_base.py:16,155-156),
- obstacle circles use the shared per-step slack with weight M, i.e. the
  exact penalty M * relu(max g)^2 here,
- warm-started U, no U_last / input-rate term in this controller.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from mmmpc_tpu.controllers.common import (
    ControllerBase, as_weight_matrix, scalar_weight, weight_sqrt,
)
from mmmpc_tpu.models.base import base_step
from mmmpc_tpu.models.obstacles import ground_obstacle_array
from mmmpc_tpu.ocp import OCP
from mmmpc_tpu.ocp.constraints import ground_circle_g, relu_max, relu_max_penalty
from mmmpc_tpu.utils.configs import SolverConfig
from mmmpc_tpu.utils.math import angle_diff

PI = math.pi


class MPCBase(ControllerBase):
    NX, NU = 6, 2

    def __init__(self, robot, obstacle_list, N=10,
                 Q=np.diag([5.0, 5.0, 0.0, 0, 0, 1.0]),
                 P=np.diag([5.0, 5.0, 0.0, 0, 0, 1.0]),
                 R=np.diag([1.0, 1.0]),
                 M=np.diag([1e5]),
                 ulim=np.array([[-2, -PI], [2, PI]]),
                 xlim=np.array([[-100, -100, -2, -2, -PI],
                                [100, 100, 2, 2, PI]]),
                 solver_config: SolverConfig | None = None):
        self.dt = robot.dt
        self.base_radius = robot.base_radius()
        self.obstacle_list = obstacle_list
        self.Q_value = as_weight_matrix(Q, self.NX)
        self.P_value = as_weight_matrix(P, self.NX)
        self.R_value = as_weight_matrix(R, self.NU)
        self.M_value = scalar_weight(M)
        self.ulim = np.asarray(ulim, dtype=float)
        self.xlim = np.asarray(xlim, dtype=float)
        obs = ground_obstacle_array(obstacle_list)
        self.obstacles_value = jnp.asarray(obs)
        base_radius = self.base_radius
        dt = self.dt
        xlim_j = jnp.asarray(self.xlim)

        def dynamics(x, u):
            return base_step(x, u, dt)

        def state_error(x, x_ref):
            return jnp.concatenate([
                x[:2] - x_ref[:2],
                angle_diff(x[2], x_ref[2])[None],
                x[3:] - x_ref[3:],
            ])

        def slack_pen(x, p):
            g = ground_circle_g(x[0], x[1], p["obstacles"], base_radius)
            return relu_max_penalty(g, p["M"])

        def stage_cost(x, u, k, p):
            e = state_error(x, p["X_ref"][k])
            eu = u - p["U_ref"][k]
            return e @ p["Q"] @ e + eu @ p["R"] @ eu + slack_pen(x, p)

        def terminal_cost(x, p):
            e = state_error(x, p["X_ref"][N])
            return e @ p["P"] @ e + slack_pen(x, p)

        def box6(x):
            # xlim columns: [x, y, (dx, dy, dpsi)] — yaw unbounded
            v = jnp.concatenate([x[:2], x[3:]])
            lim = xlim_j.astype(v.dtype)   # dtype-preserving (f32 hot path)
            return jnp.concatenate([v - lim[1], lim[0] - v])

        def stage_ineq(x, u, k, p):
            return box6(x)

        def terminal_ineq(x, p):
            return box6(x)

        def slack_res(x, p):
            g = ground_circle_g(x[0], x[1], p["obstacles"], base_radius)
            smax = relu_max(g)
            return (p["M_sqrt"] * smax)[None]

        def stage_residuals(x, u, k, p):
            e = state_error(x, p["X_ref"][k])
            eu = u - p["U_ref"][k]
            return jnp.concatenate(
                [p["Q_s"] @ e, p["R_s"] @ eu, slack_res(x, p)])

        def terminal_residuals(x, p):
            e = state_error(x, p["X_ref"][N])
            return jnp.concatenate([p["P_s"] @ e, slack_res(x, p)])

        # ---- fully-structured AL expansion (solver's fastest generic
        # path): tracking JtJ is the weight matrix itself (the wrap-aware
        # yaw error has unit slope a.e.), the slack group contributes one
        # rank-1 outer product from a single reverse-mode pass, and the box
        # rows are pure diagonal updates.  Mirrors the flagship qref
        # expansion (wholebody_qref.py) — measured ~9x the residual-Jacobian
        # GN path on v5e at batch 1024.
        import jax as _jax

        _box_idx = jnp.asarray([0, 1, 3, 4, 5])

        def _slack_vg(x, p):
            return _jax.value_and_grad(lambda xx: relu_max(ground_circle_g(
                xx[0], xx[1], p["obstacles"], base_radius)))(x)

        def stage_al_expansion(x, u, k, p, lam_k, mu, inv_scale):
            e = state_error(x, p["X_ref"][k])
            eu = u - p["U_ref"][k]
            smax, sx = _slack_vg(x, p)
            M = p["M"]
            two_s = 2.0 * inv_scale
            gx = two_s * (p["Q"] @ e + M * smax * sx)
            gu = two_s * (p["R"] @ eu)
            Hxx = two_s * (p["Q"] + M * jnp.outer(sx, sx))
            Huu = two_s * p["R"]
            Hux = jnp.zeros((2, 6), x.dtype)

            c = box6(x)                      # rows [v - hi (5), lo - v (5)]
            t = jnp.maximum(0.0, lam_k + mu * c)
            act = ((lam_k + mu * c) > 0).astype(x.dtype)
            gx = gx.at[_box_idx].add(t[:5] - t[5:])
            Hxx = Hxx.at[_box_idx, _box_idx].add(mu * (act[:5] + act[5:]))
            return gx, gu, Hxx, Huu, Hux

        def terminal_al_expansion(x, p, lam_t, lam_e, mu, inv_scale):
            e = state_error(x, p["X_ref"][N])
            smax, sx = _slack_vg(x, p)
            M = p["M"]
            two_s = 2.0 * inv_scale
            gx = two_s * (p["P"] @ e + M * smax * sx)
            Hxx = two_s * (p["P"] + M * jnp.outer(sx, sx))
            t = jnp.maximum(0.0, lam_t + mu * box6(x))
            act = (t > 0).astype(x.dtype)
            gx = gx.at[_box_idx].add(t[:5] - t[5:])
            Hxx = Hxx.at[_box_idx, _box_idx].add(mu * (act[:5] + act[5:]))
            return gx, Hxx

        def dynamics_jacobians(x, u):
            from mmmpc_tpu.models.base import base_jacobians
            return base_jacobians(x, u, dt)

        n_obs = int(self.obstacles_value.shape[0])
        ulim_np = self.ulim

        def lanes_fwd_factory(cfg):
            from mmmpc_tpu.ops import generic_fwd as gf
            xlo = [float(v) for v in self.xlim[0]]   # 5-wide (x,y,dx,dy,dpsi)
            xhi = [float(v) for v in self.xlim[1]]

            def dyn(x, u):
                c, s = jnp.cos(x[2]), jnp.sin(x[2])
                return [x[0] + dt * x[3],
                        x[1] + dt * x[4],
                        x[2] + dt * x[5],
                        x[3] + dt * (u[0] * c - x[4] * x[5]),
                        x[4] + dt * (u[0] * s + x[3] * x[5]),
                        x[5] + dt * u[1]]

            def state_err(x, sm, row):
                return [x[0] - sm["X_ref"][row, 0],
                        x[1] - sm["X_ref"][row, 1],
                        gf.wrap_pi_t(x[2] - sm["X_ref"][row, 2]),
                        x[3] - sm["X_ref"][row, 3],
                        x[4] - sm["X_ref"][row, 4],
                        x[5] - sm["X_ref"][row, 5]]

            def slack_pen(x, sm):
                if n_obs == 0:
                    return 0.0
                gs = gf.ground_circles_t(x[0], x[1], sm["obstacles"], n_obs,
                                         base_radius)
                smax = gf.relu_max_t(gs)
                return sm["M"][0, 0] * smax * smax

            def box6(x):
                v = [x[0], x[1], x[3], x[4], x[5]]
                return ([v[i] - xhi[i] for i in range(5)]
                        + [xlo[i] - v[i] for i in range(5)])

            def stage(x, u, sm, g):
                e = state_err(x, sm, g)
                eu = [u[0] - sm["U_ref"][g, 0], u[1] - sm["U_ref"][g, 1]]
                raw = (gf.qform_t(sm["Q"], e) + gf.qform_t(sm["R"], eu)
                       + slack_pen(x, sm))
                return raw, box6(x)

            def terminal(x, sm):
                e = state_err(x, sm, N)
                raw = gf.qform_t(sm["P"], e) + slack_pen(x, sm)
                return raw, box6(x), []

            def pack(p):
                out = {k: p[k] for k in ("Q", "R", "P", "M", "X_ref",
                                         "U_ref")}
                out["obstacles"] = (p["obstacles"] if n_obs
                                    else jnp.zeros((1, 3)))
                return out

            hooks = gf.LanesHooks(
                nc=10, nct=10, ne=0,
                smem_shapes={"Q": (6, 6), "R": (2, 2), "P": (6, 6),
                             "M": (1, 1), "X_ref": (N + 1, 6),
                             "U_ref": (N, 2),
                             "obstacles": (max(n_obs, 1), 3)},
                pack=pack, dyn=dyn, stage=stage, terminal=terminal)
            alphas = [cfg.alpha_decay ** i for i in range(cfg.n_alpha)]
            return gf.make_generic_fwd_linesearch(
                nx=6, nu=2, N=N, u_clamp=(ulim_np[0], ulim_np[1]),
                alphas=alphas, inv_scale=1.0 / cfg.cost_scale, hooks=hooks)

        def lanes_bwd_factory(cfg):
            from mmmpc_tpu.ops import generic_bwd as gb
            from mmmpc_tpu.ops import generic_fwd as gf
            from mmmpc_tpu.ops.wholebody_bwd import (
                _mul, _relu_max_grad,
            )
            two_s = 2.0 / cfg.cost_scale
            dt_f = float(dt)
            xlo = [float(v) for v in self.xlim[0]]
            xhi = [float(v) for v in self.xlim[1]]
            # state indices covered by the 5-wide box (yaw unbounded)
            BOX = (0, 1, 3, 4, 5)

            def ground_slack(x, sm):
                """(smax, [sx0, sx1, 0, 0, 0, 0]) of relu(max ground-circle
                g), tie-splitting matching _slack_vg's jnp.max VJP."""
                if n_obs == 0:
                    return 0.0, [0.0] * 6
                vals, grads = [], []
                for o in range(n_obs):
                    dx = x[0] - sm["obstacles"][o, 0]
                    dy = x[1] - sm["obstacles"][o, 1]
                    d = jnp.sqrt(dx * dx + dy * dy + 1e-9)
                    vals.append((sm["obstacles"][o, 2] + base_radius) - d)
                    inv = -1.0 / d
                    grads.append([dx * inv, dy * inv, 0.0, 0.0, 0.0, 0.0])
                return _relu_max_grad(vals, grads, 6)

            def tracking(x, sm, row, Wt):
                e = [x[0] - sm["X_ref"][row, 0],
                     x[1] - sm["X_ref"][row, 1],
                     gf.wrap_pi_t(x[2] - sm["X_ref"][row, 2]),
                     x[3] - sm["X_ref"][row, 3],
                     x[4] - sm["X_ref"][row, 4],
                     x[5] - sm["X_ref"][row, 5]]
                smax, sx = ground_slack(x, sm)
                M = sm["M"][0, 0]
                Msm = M * smax
                We = [None] * 6
                for i in range(6):
                    acc = None
                    for j in range(6):
                        t = Wt[i, j] * e[j]
                        acc = t if acc is None else acc + t
                    We[i] = acc
                gx = [_mul(two_s, We[i] + _mul(Msm, sx[i]))
                      for i in range(6)]
                Hxx = [[_mul(two_s, Wt[i, j]
                             + _mul(M, _mul(sx[i], sx[j])))
                        for j in range(6)] for i in range(6)]
                return gx, Hxx

            def box_rows(x):
                rows = []
                for r, i in enumerate(BOX):
                    g = [0.0] * 6
                    g[i] = 1.0
                    rows.append((x[i] - xhi[r], g))
                for r, i in enumerate(BOX):
                    g = [0.0] * 6
                    g[i] = -1.0
                    rows.append((xlo[r] - x[i], g))
                return rows

            def stage_quad(x, u, sm, k):
                lx, lxx = tracking(x, sm, k, sm["Q"])
                eu = [u[0] - sm["U_ref"][k, 0], u[1] - sm["U_ref"][k, 1]]
                lu = [_mul(two_s, sm["R"][i, 0] * eu[0]
                           + sm["R"][i, 1] * eu[1]) for i in range(2)]
                luu = [[two_s * sm["R"][i, j] for j in range(2)]
                       for i in range(2)]
                lux = [[0.0] * 6 for _ in range(2)]
                cons = [(v, g, [0.0, 0.0]) for v, g in box_rows(x)]
                return lx, lu, lxx, luu, lux, cons

            def term_quad(x, sm):
                gx, Hxx = tracking(x, sm, N, sm["P"])
                return gx, Hxx, box_rows(x), []

            def dyn_jac(x, u, sm, k):
                c2, s2 = jnp.cos(x[2]), jnp.sin(x[2])
                A = [[1.0 if i == j else 0.0 for j in range(6)]
                     for i in range(6)]
                A[0][3] = A[1][4] = A[2][5] = dt_f
                A[3][2] = -dt_f * (u[0] * s2)
                A[3][4] = -dt_f * x[5]
                A[3][5] = -dt_f * x[4]
                A[4][2] = dt_f * (u[0] * c2)
                A[4][3] = dt_f * x[5]
                A[4][5] = dt_f * x[3]
                Bm = [[0.0, 0.0] for _ in range(6)]
                Bm[3][0] = dt_f * c2
                Bm[4][0] = dt_f * s2
                Bm[5][1] = dt_f
                return A, Bm

            def pack(p):
                out = {k: p[k] for k in ("Q", "R", "P", "M", "X_ref",
                                         "U_ref")}
                out["obstacles"] = (p["obstacles"] if n_obs
                                    else jnp.zeros((1, 3)))
                return out

            hooks = gb.BwdHooks(
                nc=10, nct=10, ne=0,
                smem_shapes={"Q": (6, 6), "R": (2, 2), "P": (6, 6),
                             "M": (1, 1), "X_ref": (N + 1, 6),
                             "U_ref": (N, 2),
                             "obstacles": (max(n_obs, 1), 3)},
                pack=pack, dyn_jac=dyn_jac,
                stage_quad=stage_quad, term_quad=term_quad)
            return gb.make_generic_bwd_fused(nx=6, nu=2, N=N, hooks=hooks)

        ocp = OCP(nx=self.NX, nu=self.NU, N=N, dynamics=dynamics,
                  stage_cost=stage_cost, terminal_cost=terminal_cost,
                  stage_ineq=stage_ineq, terminal_ineq=terminal_ineq,
                  u_lower=jnp.asarray(self.ulim[0]),
                  u_upper=jnp.asarray(self.ulim[1]),
                  stage_residuals=stage_residuals,
                  terminal_residuals=terminal_residuals,
                  dynamics_jacobians=dynamics_jacobians,
                  stage_al_expansion=stage_al_expansion,
                  terminal_al_expansion=terminal_al_expansion,
                  lanes_fwd_factory=lanes_fwd_factory,
                  lanes_bwd_factory=lanes_bwd_factory)
        super().__init__(ocp, solver_config or SolverConfig())
        self.reset()

    def reset(self):
        self.reset_warmstart()

    def setWeight(self, Q=None, R=None, P=None, M=None):
        if Q is not None:
            self.Q_value = as_weight_matrix(Q, self.NX)
        if R is not None:
            self.R_value = as_weight_matrix(R, self.NU)
        if P is not None:
            self.P_value = as_weight_matrix(P, self.NX)
        if M is not None:
            self.M_value = scalar_weight(M)

    def angleDiff(self, a, b):
        return angle_diff(a, b)

    def make_params(self, traj_ref, u_ref):
        return {"X_ref": jnp.asarray(traj_ref), "U_ref": jnp.asarray(u_ref),
                "Q": self.Q_value, "R": self.R_value, "P": self.P_value,
                "M": self.M_value, "obstacles": self.obstacles_value,
                "Q_s": weight_sqrt(self.Q_value),
                "R_s": weight_sqrt(self.R_value),
                "P_s": weight_sqrt(self.P_value),
                "M_sqrt": jnp.sqrt(self.M_value)}

    def solve(self, x_init, traj_ref, u_ref):
        return self._solve_impl(np.asarray(x_init, dtype=float),
                                self.make_params(traj_ref, u_ref))
