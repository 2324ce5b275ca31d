"""MFU / roofline dossier for the flagship qref solver (VERDICT r3 #3).

Converts the headline "solves/s vs a 10-solves/s CPU budget" into absolute
hardware terms:

- exact implementation FLOPs of both fused Pallas kernels, counted from
  their kernel jaxprs (every float elementwise primitive x its element
  count, per grid step — the kernels do identical work every step);
- HBM bytes per kernel call from the pallas_call operand/result avals
  (tiled arrays stream HBM<->VMEM once per call; SMEM params are noise);
- glue FLOPs (everything outside the kernels: AL re-basing, constraint
  evaluation, candidate selection, stats) from XLA's own cost model, which
  EXCLUDES custom calls — i.e. it is exactly the non-kernel remainder;
- peaks used (TPU v5e / "v5 lite", public numbers): HBM 819 GB/s; MXU
  197 TFLOP/s bf16 (not the relevant ceiling here: the solver is tiny-matrix
  VPU work, its only matmuls are 9x9 at "highest" precision); VPU f32
  ~= 1024 lanes x 4 ALUs x ~1.5 e9 Hz ~= 6.1 TFLOP/s (upper estimate; at
  the conservative 0.94 GHz clock used by older gen it is 3.9 TFLOP/s).

Run on the TPU:  python scripts/roofline.py [batch] [reps]
Emits one JSON dossier on stdout (consumed by BASELINE.md).

``python scripts/roofline.py --peak`` measures the ACTUAL VPU f32 ceiling of
the attached chip with a max-FMA Pallas microkernel (round-5, VERDICT r4 #2:
the 53-83% MFU *range* existed only because the VPU peak was a lane x ALU x
clock-guess product; a measured ceiling collapses it to one number).  The
dossier run then uses the measured peak automatically when present.
"""

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

# --- kernel-jaxpr FLOP accounting -----------------------------------------

FLOP_PRIMS = {
    "add": 1, "sub": 1, "mul": 1, "div": 1, "neg": 1, "max": 1, "min": 1,
    "abs": 1, "and": 0, "or": 0, "xor": 0, "not": 0,
    "pow": 1, "integer_pow": 1, "add_any": 1,
}
TRANS_PRIMS = {"sqrt", "rsqrt", "sin", "cos", "tan", "exp", "log", "tanh",
               "logistic", "cbrt"}


def _is_float(aval):
    return hasattr(aval, "dtype") and jnp.issubdtype(aval.dtype,
                                                     jnp.floating)


def _count_jaxpr(jaxpr, mult=1.0):
    """(flops, transcendentals) of one static execution of a jaxpr."""
    flops = trans = 0.0
    for eq in jaxpr.eqns:
        sub = []
        for v in eq.params.values():
            if hasattr(v, "jaxpr"):
                sub.append(v.jaxpr)
            elif isinstance(v, (list, tuple)):
                sub += [x.jaxpr for x in v if hasattr(x, "jaxpr")]
        if sub:
            inner_mult = mult
            if eq.primitive.name == "scan":
                inner_mult = mult * eq.params.get("length", 1)
            for sj in sub:
                f, t = _count_jaxpr(sj, inner_mult)
                flops += f
                trans += t
            continue
        name = eq.primitive.name
        outs = [o.aval for o in eq.outvars]
        if not outs or not _is_float(outs[0]):
            continue
        n = float(np.prod(outs[0].shape)) if outs[0].shape else 1.0
        if name in FLOP_PRIMS:
            flops += mult * FLOP_PRIMS[name] * n
        elif name in TRANS_PRIMS:
            trans += mult * n
        elif name == "dot_general":
            a = eq.invars[0].aval
            b = eq.invars[1].aval
            # 2 * prod(out) * contracted_dim
            ((lc, _), _) = eq.params["dimension_numbers"]
            k = float(np.prod([a.shape[i] for i in lc]))
            flops += mult * 2.0 * n * k
    return flops, trans


def _find_pallas(jaxpr, found):
    for eq in jaxpr.eqns:
        if eq.primitive.name == "pallas_call":
            found.append(eq)
        for v in eq.params.values():
            if hasattr(v, "jaxpr"):
                _find_pallas(v.jaxpr, found)
            elif isinstance(v, (list, tuple)):
                for x in v:
                    if hasattr(x, "jaxpr"):
                        _find_pallas(x.jaxpr, found)


def kernel_cost(fn, *args):
    """(flops, trans, hbm_bytes, grid) of ONE call of a function whose body
    is a single pallas kernel (counted per grid step x grid size)."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    found = []
    _find_pallas(jaxpr.jaxpr, found)
    assert len(found) == 1, f"expected 1 pallas_call, found {len(found)}"
    eq = found[0]
    grid_mapping = eq.params["grid_mapping"]
    grid = int(np.prod(grid_mapping.grid))
    f, t = _count_jaxpr(eq.params["jaxpr"])
    hbm = sum(float(np.prod(v.aval.shape)) * v.aval.dtype.itemsize
              for v in list(eq.invars) + list(eq.outvars)
              if hasattr(v.aval, "shape"))
    return f * grid, t * grid, hbm, grid


# --- measured VPU peak (max-FMA microkernel) --------------------------------

PEAK_FILE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "VPU_PEAK.json")


def measure_vpu_peak(grid=16, chain=6):
    """Measure the chip's f32 VPU ceiling with back-to-back FMA chains.

    The kernel keeps ``nacc`` independent (rows, 128) f32 accumulators in
    registers and issues a = a*b + c on each per loop iteration — enough
    instruction-level parallelism to cover the FMA latency, no memory
    traffic inside the loop, values data-dependent on the input so nothing
    constant-folds.

    Timing methodology (the axon tunnel makes single-call timing
    unreliable: ``block_until_ready`` can return before remote execution
    drains, and a host fetch adds a ~25-40 ms round trip): each
    configuration is timed as a *chain* of calls whose output feeds the
    next call's input (the data dependency forces sequential execution),
    terminated by a host fetch; the rate is the SLOPE between two inner
    trip counts, which cancels every fixed cost (dispatch, fetch, launch).
    The best rate over the ILP sweep is the measured peak.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import functools

    def kernel(x_ref, o_ref, *, nacc, inner):
        accs = [x_ref[i] for i in range(nacc)]
        b = x_ref[nacc]
        c = x_ref[nacc + 1]

        def body(_, accs):
            return [a * b + c for a in accs]

        accs = jax.lax.fori_loop(0, inner, body, accs)
        for i in range(nacc):
            o_ref[i] = accs[i]
        o_ref[nacc] = b
        o_ref[nacc + 1] = c

    def chained_time(nacc, rows, inner):
        shape = (nacc + 2, rows, 128)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(shape),
                        jnp.float32) * 1e-3
        f = jax.jit(pl.pallas_call(
            functools.partial(kernel, nacc=nacc, inner=inner),
            grid=(grid,),
            in_specs=[pl.BlockSpec(shape, lambda g: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(shape, lambda g: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        ))
        np.asarray(f(x))                       # compile + drain
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            y = x
            for _ in range(chain):
                y = f(y)
            np.asarray(y)                      # forced host sync
            best = min(best, time.perf_counter() - t0)
        return best

    results = {}
    for nacc, rows in ((8, 8), (16, 8), (20, 8), (32, 8), (8, 32)):
        lo, hi = 20000, 100000
        t_lo = chained_time(nacc, rows, lo)
        t_hi = chained_time(nacc, rows, hi)
        dflops = grid * nacc * (hi - lo) * 2.0 * rows * 128 * chain
        results[f"nacc{nacc}_rows{rows}"] = dflops / max(t_hi - t_lo, 1e-9)
    best_key = max(results, key=results.get)
    out = {
        "device": str(jax.devices()[0]),
        "vpu_peak_f32_flops": results[best_key],
        "vpu_peak_f32_tflops": round(results[best_key] / 1e12, 3),
        "best_config": best_key,
        "sweep_tflops": {k: round(v / 1e12, 3) for k, v in results.items()},
        "grid": grid, "chain": chain,
        "method": "chained-call slope between inner=20k and 100k trip "
                  "counts (cancels dispatch/fetch/launch fixed costs)",
    }
    with open(PEAK_FILE, "w") as fh:
        json.dump(out, fh, indent=1)
    return out


def load_measured_peak():
    if os.path.exists(PEAK_FILE):
        with open(PEAK_FILE) as fh:
            return json.load(fh)
    return None


# --- the flagship problem --------------------------------------------------

def main():
    if "--peak" in sys.argv:
        print(json.dumps(measure_vpu_peak(), indent=1))
        return
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bm)
    from mmmpc_tpu.parallel import controller_batched_fn

    mpc, x0_b, U0_b, params = bm.build_problem(batch)
    cfg = bm.SOLVER_CFG
    ocp = mpc.ocp
    N = ocp.N

    # --- static kernel accounting (per batched call) ---
    from mmmpc_tpu.solver.al_ilqr import build_core, rollout
    core = build_core(ocp, params, cfg, jnp.float32)
    nc, nct, ne = core.nc, core.nct, core.ne
    x0_bm = x0_b.T
    U0_bm = jnp.transpose(U0_b, (1, 2, 0))
    X_bm, Uc_bm = jax.vmap(lambda x0, U: rollout(ocp, x0, U, params),
                           in_axes=(-1, -1), out_axes=-1)(x0_bm, U0_bm)
    lam = (jnp.zeros((N, nc, batch), jnp.float32),
           jnp.zeros((nct, batch), jnp.float32),
           jnp.zeros((ne, batch), jnp.float32))
    mu = jnp.asarray(10.0, jnp.float32)
    reg = jnp.full((batch,), 1e-6, jnp.float32)

    bwd = ocp.lanes_bwd_factory(cfg)
    fwd = ocp.lanes_fwd_factory(cfg)
    bwd_f, bwd_t, bwd_b, bwd_grid = kernel_cost(
        lambda *a: bwd(*a), X_bm, Uc_bm, lam[0], lam[1], lam[2], mu, reg,
        params)
    kffs, Ks = bwd(X_bm, Uc_bm, lam[0], lam[1], lam[2], mu, reg, params)
    fwd_f, fwd_t, fwd_b, fwd_grid = kernel_cost(
        lambda *a: fwd(*a), X_bm[:-1], Uc_bm, kffs, Ks,
        lam[0], lam[1], lam[2], mu, params)

    # --- schedule: kernel calls per solve ---
    later = (cfg.ilqr_iters_later if cfg.ilqr_iters_later is not None
             else cfg.ilqr_iters)
    iters = cfg.ilqr_iters + (cfg.al_iters - 1) * later
    per_solve = {
        "bwd_flops": (bwd_f + bwd_t) * iters / batch,
        "fwd_flops": (fwd_f + fwd_t) * iters / batch,
        "bwd_trans": bwd_t * iters / batch,
        "fwd_trans": fwd_t * iters / batch,
        "bwd_hbm_bytes": bwd_b * iters / batch,
        "fwd_hbm_bytes": fwd_b * iters / batch,
    }

    # --- glue (non-kernel) flops/bytes from XLA's cost model (custom calls
    # excluded from XLA "flops", i.e. exactly the non-kernel remainder) ---
    run = jax.jit(controller_batched_fn(mpc))
    compiled = run.lower(x0_b, U0_b, params).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    glue_flops = float(ca.get("flops", 0.0)) / batch
    glue_trans = float(ca.get("transcendentals", 0.0)) / batch

    flops_solve = (per_solve["bwd_flops"] + per_solve["fwd_flops"]
                   + glue_flops)
    hbm_solve = per_solve["bwd_hbm_bytes"] + per_solve["fwd_hbm_bytes"]

    # --- measured throughput ---
    res, stats = run(x0_b, U0_b, params)
    jax.block_until_ready(res.U)
    t0 = time.perf_counter()
    for _ in range(reps):
        res, stats = run(x0_b, U0_b, params)
    jax.block_until_ready(res.U)
    dt = time.perf_counter() - t0
    solves_per_s = batch * reps / dt

    # --- peaks (TPU v5e) ---
    HBM_BW = 819e9                   # bytes/s
    VPU_PEAK_HI = 6.1e12             # f32 FLOP/s at ~1.5 GHz (estimate)
    VPU_PEAK_LO = 3.9e12             # at the conservative 0.94 GHz estimate
    MXU_BF16 = 197e12
    # measured ceiling (scripts/roofline.py --peak) replaces the clock-guess
    # band when available — the MFU becomes ONE number with a measured
    # denominator instead of a 53-83% range
    peak = load_measured_peak()
    vpu_for_light_speed = (peak["vpu_peak_f32_flops"] if peak
                           else VPU_PEAK_HI)

    achieved_flops = flops_solve * solves_per_s
    achieved_hbm = hbm_solve * solves_per_s
    light_speed_s = max(flops_solve / vpu_for_light_speed,
                        hbm_solve / HBM_BW)

    out = {
        "batch": batch, "horizon": N, "iters_per_solve": iters,
        "device": str(jax.devices()[0]),
        "solves_per_s": round(solves_per_s, 1),
        "flops_per_solve": round(flops_solve),
        "glue_flops_per_solve": round(glue_flops),
        "transcendentals_per_solve": round(
            per_solve["bwd_trans"] + per_solve["fwd_trans"] + glue_trans),
        "hbm_bytes_per_solve": round(hbm_solve),
        "arithmetic_intensity_flop_per_byte": round(
            flops_solve / hbm_solve, 2),
        "achieved_vpu_tflops": round(achieved_flops / 1e12, 3),
        "achieved_hbm_gb_s": round(achieved_hbm / 1e9, 1),
        "measured_vpu_peak_tflops": (
            round(peak["vpu_peak_f32_tflops"], 3) if peak else None),
        "mfu_pct_of_measured_peak": (
            round(100 * achieved_flops / peak["vpu_peak_f32_flops"], 1)
            if peak else None),
        "pct_of_vpu_peak_hi": round(100 * achieved_flops / VPU_PEAK_HI, 1),
        "pct_of_vpu_peak_lo": round(100 * achieved_flops / VPU_PEAK_LO, 1),
        "pct_of_hbm_bw": round(100 * achieved_hbm / HBM_BW, 1),
        "pct_of_mxu_bf16_for_reference": round(
            100 * achieved_flops / MXU_BF16, 2),
        "bound": ("compute(VPU)" if flops_solve / vpu_for_light_speed
                  > hbm_solve / HBM_BW else "HBM"),
        "light_speed_us_per_solve": round(light_speed_s * 1e6, 2),
        "measured_us_per_solve": round(1e6 / solves_per_s, 2),
        "headroom_x": round(1.0 / (solves_per_s * light_speed_s), 2),
        "kernel_detail": {
            "bwd": {"flops_per_call": round(bwd_f + bwd_t),
                    "hbm_bytes_per_call": round(bwd_b), "grid": bwd_grid},
            "fwd": {"flops_per_call": round(fwd_f + fwd_t),
                    "hbm_bytes_per_call": round(fwd_b), "grid": fwd_grid},
        },
        "converged_frac": float(stats.n_converged) / float(stats.n_solved),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
