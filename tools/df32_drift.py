"""Measure the double-float (df32) single-step drift table.

Reproduces docs/F32_PRECISION.md §1b: one GN step computed from each f64
oracle iterate (open-loop along the f64 path, the same protocol as
``tests/test_f32_conditioning.py::test_f32_single_step_drift_along_oracle``),
three ways —

  f32   — plain f32 residuals + assembly + solve  (gn.gn_step, f32)
  df32  — f32 residuals, two-float assembly + block-Thomas solve
          (core/df32.df32_gn_step)
  f32r  — f32 residuals, f64 assembly + solve (the residual-eval floor:
          what df32 would achieve with *infinite* downstream precision)

and reports ``max|dθ − dθ₆₄|`` per iterate.  The df32 column measuring at
the f32r floor everywhere is the confirmation of the doc's §1 attribution
(the f32 ceiling is normal-equation formation/solve, not residual eval).

Reference context: the f64 oracle emulates the reference's end-to-end
float64 solve (/root/reference/diff_gpmp2/gpmp2/plan_layer.py:210-234) at
its shipped conditioning (cost_sigma=0.01,
/root/reference/examples/configs/gpmp2_2d_params.yaml:17).

``--golden-replay`` runs the open-loop GOLDEN replay instead (docs/
F32_PRECISION.md §1c): one df32 step from every torch reference iterate
(36 points — the reference's own f64 path, ``tests/goldens``), decomposed
per iterate into

  engine — df32 step vs f32-residuals + f64-assembly/solve at the SAME
           f32 linearization point (what the two-float arithmetic adds)
  floor  — that f64-downstream step vs the reference's recorded f64 step
           (f32 residual/Jacobian evaluation itself: the cap for ANY
           engine consuming f32 inputs)
  vs_ref — df32 step vs the reference's recorded step (≈ engine + floor)

CI assertion of this table: tests/test_twofloat.py::
test_df32_golden_replay_at_floor.

Usage:  python tools/df32_drift.py            # markdown table to stdout
        python tools/df32_drift.py --golden-replay
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from dgpmp2_tpu.core import df32, gn, graph  # noqa: E402
from dgpmp2_tpu.ops import sdf as sdf_ops  # noqa: E402
from dgpmp2_tpu.ops import tridiag  # noqa: E402
from dgpmp2_tpu.robots import PointRobot2D  # noqa: E402

GOLDEN = os.path.join(
    os.path.dirname(__file__), "..", "tests", "goldens", "golden_ref_step.npz"
)
ITERS = 12
REPORT_ITS = (0, 3, 5, 8, 11)


def main():
    g = np.load(GOLDEN, allow_pickle=False)
    sdf_ops.set_oob_mode("reference")
    t = int(g["total_time_step"])
    spec = graph.GraphSpec(
        total_time_step=t,
        total_time_sec=float(g["total_time_sec"]),
        x_lims=tuple(float(v) for v in g["x_lims"]),
        y_lims=tuple(float(v) for v in g["y_lims"]),
    )
    robot = PointRobot2D(sphere_radii=(float(g["sphere_radius"]),))
    reg = float(g["reg"])

    def params(dtype, env):
        return graph.default_params(
            spec, robot,
            jnp.asarray(g[f"start_{env}"], dtype),
            jnp.asarray(g[f"goal_{env}"], dtype),
            qc_inv=g["qc_inv"], cost_sigma=float(g["cost_sigma"]),
            epsilon_dist=float(g["epsilon_dist"]),
            k_s=g["k_s"], k_g=g["k_g"], dtype=dtype,
        )

    rows = {}
    for env in ("1", "5", "12"):
        sdf64 = jnp.asarray(g[f"sdf_{env}"], jnp.float64)[None]
        sdf32 = sdf64.astype(jnp.float32)
        p64 = params(jnp.float64, env)
        p32 = params(jnp.float32, env)
        th = jnp.asarray(g[f"th_{env}"][0], jnp.float64)
        errs = {"f32": [], "df32": [], "f32r": []}
        for _ in range(ITERS):
            th32 = th.astype(jnp.float32)
            dth64 = gn.gn_step(spec, robot, p64, th, sdf64, reg)
            d_f32 = gn.gn_step(spec, robot, p32, th32, sdf32, reg)
            d_df = df32.df32_gn_step(spec, robot, p32, th32, sdf32, reg)
            # f32 residuals -> f64 assembly+solve (the residual-eval floor)
            res32 = graph.eval_residuals(spec, robot, p32, th32, sdf32)
            res64 = jax.tree.map(lambda a: a.astype(jnp.float64), res32)
            diag, off, rhs = graph.assemble_from_residuals(
                spec, p64, res64, dtype=jnp.float64
            )
            diag, off, rhs = gn.damped_system(diag, off, rhs, reg)
            d_fl = tridiag.btd_solve_auto(diag, off, rhs)
            for k, d in (("f32", d_f32), ("df32", d_df), ("f32r", d_fl)):
                errs[k].append(
                    float(jnp.max(jnp.abs(dth64 - d.astype(jnp.float64))))
                )
            th = th + dth64
        rows[env] = errs

    print("| env | mode | " + " | ".join(f"it {i}" for i in REPORT_ITS)
          + " | worst |")
    print("|---|---|" + "---|" * (len(REPORT_ITS) + 1))
    for env, errs in rows.items():
        for mode in ("f32", "df32", "f32r"):
            e = errs[mode]
            cells = " | ".join(f"{e[i]:.1e}" for i in REPORT_ITS)
            print(f"| {env} | {mode} | {cells} | {max(e):.1e} |")
    worst_df = max(max(errs["df32"]) for errs in rows.values())
    worst_f32 = max(max(errs["f32"]) for errs in rows.values())
    print(f"\nworst df32 = {worst_df:.2e}, worst plain f32 = {worst_f32:.2e}, "
          f"improvement = {worst_f32 / worst_df:.0f}x")


def main_golden_replay():
    g = np.load(GOLDEN, allow_pickle=False)
    sdf_ops.set_oob_mode("reference")
    spec = graph.GraphSpec(
        total_time_step=int(g["total_time_step"]),
        total_time_sec=float(g["total_time_sec"]),
        x_lims=tuple(float(v) for v in g["x_lims"]),
        y_lims=tuple(float(v) for v in g["y_lims"]),
    )
    robot = PointRobot2D(sphere_radii=(float(g["sphere_radius"]),))
    reg = float(g["reg"])

    def params(dtype, env):
        return graph.default_params(
            spec, robot,
            jnp.asarray(g[f"start_{env}"], dtype),
            jnp.asarray(g[f"goal_{env}"], dtype),
            qc_inv=g["qc_inv"], cost_sigma=float(g["cost_sigma"]),
            epsilon_dist=float(g["epsilon_dist"]),
            k_s=g["k_s"], k_g=g["k_g"], dtype=dtype,
        )

    print("| env | iter | engine | floor | vs_ref |")
    print("|---|---|---|---|---|")
    engines, floors = [], []
    for env in ("1", "5", "12"):
        sdf64 = jnp.asarray(g[f"sdf_{env}"], jnp.float64)[None]
        sdf32 = sdf64.astype(jnp.float32)
        p64, p32 = params(jnp.float64, env), params(jnp.float32, env)

        @jax.jit
        def d_df32(th32):
            return df32.df32_gn_step(spec, robot, p32, th32, sdf32, reg)

        @jax.jit
        def d_floor(th32):
            res64 = jax.tree.map(
                lambda a: a.astype(jnp.float64),
                graph.eval_residuals(spec, robot, p32, th32, sdf32),
            )
            diag, off, rhs = graph.assemble_from_residuals(
                spec, p64, res64, dtype=jnp.float64
            )
            return tridiag.btd_solve_auto(
                *gn.damped_system(diag, off, rhs, reg)
            )

        th_ref, dth_ref = g[f"th_{env}"], g[f"dtheta_{env}"]
        for i in range(dth_ref.shape[0]):
            th32 = jnp.asarray(th_ref[i], jnp.float64).astype(jnp.float32)
            d_df = np.asarray(d_df32(th32), np.float64)
            d_fl = np.asarray(d_floor(th32))
            e_eng = float(np.max(np.abs(d_df - d_fl)))
            e_flo = float(np.max(np.abs(d_fl - dth_ref[i])))
            e_ref = float(np.max(np.abs(d_df - dth_ref[i])))
            engines.append(e_eng)
            floors.append(e_flo)
            print(f"| {env} | {i} | {e_eng:.1e} | {e_flo:.1e} "
                  f"| {e_ref:.1e} |")
    quiet = sum(1 for f in floors if f <= 2e-5)
    print(f"\nengine: median {np.median(engines):.1e}, worst "
          f"{max(engines):.1e};  floor: worst {max(floors):.1e}, "
          f"quiet (<=2e-5) {quiet}/{len(floors)}")


if __name__ == "__main__":
    if "--golden-replay" in sys.argv:
        main_golden_replay()
    else:
        main()
