"""f32-on-TPU accuracy at the reference's conditioning (cost_sigma=0.01).

The reference runs float64 end-to-end (``torch.set_default_tensor_type``,
SURVEY.md §2.10) at ``cost_sigma=0.01`` — obstacle inverse-covariance
weights of 1e4 (``/root/reference/examples/configs/gpmp2_2d_params.yaml:17``)
— while TPU production is float32.  These tests pin the measured f32-vs-f64
behaviour at exactly that conditioning on the golden envs; the full
analysis and drift table live in ``docs/F32_PRECISION.md``.

Summary of what is asserted (measured 2026-08, CPU f64 oracle):

1. dtype hygiene — f32 inputs stay f32 through assembly even when callers
   pass np.float64 scalars for limits/resolution (a leak here silently
   turns "f32 verification" into mixed precision).
2. single-step error — one f32 GN step from the f64 oracle iterate differs
   by ≤ 3e-2 (measured worst 1.3e-2; tracks cond(Λ+δI)·eps_f32 with
   cond ≈ 2e5 — forming normal equations in f32 at 1e4 weights costs
   ~cond·eps per solve; see the doc for why equilibration cannot help).
3. convergence-level parity is limited by the OPTIMIZER, not arithmetic:
   pure GN at this conditioning is chaotic in f64 itself (a 1e-10 seed
   perturbation grows to O(10) trajectory difference in 50 iterations),
   so "f32 matches f64 at convergence" is only well-posed under LM step
   rejection — where f64 is stable and f32 matches err_final to ~1e-3
   relative (smooth-basin env 5: trajectory agreement 7e-5).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import PointRobot2D

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "golden_ref_step.npz")


@pytest.fixture(scope="module", autouse=True)
def _reference_oob_mode():
    sdf_ops.set_oob_mode("reference")
    yield
    sdf_ops.set_oob_mode("intended")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN, allow_pickle=False)


@pytest.fixture(scope="module")
def problem(golden):
    g = golden
    t = int(g["total_time_step"])
    spec = graph.GraphSpec(
        total_time_step=t,
        total_time_sec=float(g["total_time_sec"]),
        # Deliberately np.float64 scalars (as loaded from .npz) — the
        # dtype-hygiene test below guards exactly this call pattern.
        x_lims=tuple(g["x_lims"]),
        y_lims=tuple(g["y_lims"]),
    )
    robot = PointRobot2D(sphere_radii=(float(g["sphere_radius"]),))
    return spec, robot


def _params(golden, spec, robot, dtype, env):
    g = golden
    start = jnp.asarray(g[f"start_{env}"], dtype)
    goal = jnp.asarray(g[f"goal_{env}"], dtype)
    return graph.default_params(
        spec, robot, start, goal,
        qc_inv=g["qc_inv"], cost_sigma=float(g["cost_sigma"]),
        epsilon_dist=float(g["epsilon_dist"]),
        k_s=g["k_s"], k_g=g["k_g"], dtype=dtype,
    )


def test_f32_assembly_stays_f32(golden, problem):
    """np.float64 limits/res scalars must not promote the f32 pipeline
    (they are strongly typed under x64; the lookup dispatcher coerces)."""
    spec, robot = problem
    p32 = _params(golden, spec, robot, jnp.float32, "1")
    th32 = jnp.asarray(golden["th_1"][0], jnp.float32)
    sdf32 = jnp.asarray(golden["sdf_1"], jnp.float32)[None]
    res = graph.eval_residuals(spec, robot, p32, th32, sdf32)
    for name in ("r_gp", "r_s", "r_g", "r_obs", "h_obs"):
        assert getattr(res, name).dtype == jnp.float32, name
    diag, off, rhs = graph.assemble(spec, robot, p32, th32, sdf32)
    assert diag.dtype == jnp.float32
    assert off.dtype == jnp.float32
    assert rhs.dtype == jnp.float32


# Measured worst single-step error 1.3e-2 (env 1, iter 11); bound with
# ~2x headroom.  A regression past this means a new source of f32 loss
# (e.g. a matmul dropped to bf16 MXU passes, or an assembly reorder).
SINGLE_STEP_TOL = 3e-2


@pytest.mark.parametrize("env", ["1", "5", "12"])
@pytest.mark.slow
def test_f32_single_step_drift_along_oracle(golden, problem, env):
    """One f32 GN step from each f64 oracle iterate, 12 iterations.

    This is the per-iteration dtheta divergence table of
    docs/F32_PRECISION.md — open-loop along the f64 path, so it measures
    arithmetic (assembly+solve rounding amplified by cond ≈ 2e5), not
    basin divergence.
    """
    spec, robot = problem
    g = golden
    sdf64 = jnp.asarray(g[f"sdf_{env}"], jnp.float64)[None]
    sdf32 = sdf64.astype(jnp.float32)
    p64 = _params(g, spec, robot, jnp.float64, env)
    p32 = _params(g, spec, robot, jnp.float32, env)
    th = jnp.asarray(g[f"th_{env}"][0], jnp.float64)
    reg = float(g["reg"])
    worst = 0.0
    for _ in range(12):
        dth64 = gn.gn_step(spec, robot, p64, th, sdf64, reg)
        dth32 = gn.gn_step(
            spec, robot, p32, th.astype(jnp.float32), sdf32, reg
        )
        worst = max(
            worst, float(jnp.max(jnp.abs(dth64 - dth32.astype(jnp.float64))))
        )
        th = th + dth64
    assert worst < SINGLE_STEP_TOL, worst


@pytest.mark.slow
def test_gn_is_chaotic_in_f64_itself(golden, problem):
    """At cost_sigma=0.01 pure GN amplifies a 1e-10 f64 seed perturbation
    to O(1) trajectory difference within 50 iterations (env 1) — the
    documented reason convergence-level f32 parity is only claimed under
    LM.  If this ever FAILS (GN became stable), the f32 parity claims in
    docs/F32_PRECISION.md should be strengthened."""
    spec, robot = problem
    g = golden
    sdf64 = jnp.asarray(g["sdf_1"], jnp.float64)[None]
    p64 = _params(g, spec, robot, jnp.float64, "1")
    th0 = jnp.asarray(g["th_1"][0], jnp.float64)
    cfg = gn.OptimConfig(reg=float(g["reg"]), max_iters=50, tol_delta=0.0)
    ra = gn.plan(spec, robot, p64, th0, sdf64, cfg)
    rb = gn.plan(spec, robot, p64, th0 + 1e-10, sdf64, cfg)
    assert float(jnp.max(jnp.abs(ra.th - rb.th))) > 1.0


@pytest.mark.slow
@pytest.mark.parametrize("env", ["1", "5", "12"])
def test_f32_matches_f64_at_convergence_under_lm(golden, problem, env):
    """LM step rejection is the stable mode at reference conditioning
    (``gpmp2_planner.py:92-103`` is the reference's own answer to it):
    f64 is seed-stable and the f32 run reaches the same cost level —
    err_final relative agreement ≤ 1e-2 on every golden env; on the
    smooth-basin env 5 the trajectories themselves agree to 5e-4."""
    spec, robot = problem
    g = golden
    sdf64 = jnp.asarray(g[f"sdf_{env}"], jnp.float64)[None]
    p64 = _params(g, spec, robot, jnp.float64, env)
    p32 = _params(g, spec, robot, jnp.float32, env)
    th0 = jnp.asarray(g[f"th_{env}"][0], jnp.float64)
    cfg = gn.OptimConfig(
        method="lm", reg=float(g["reg"]), max_iters=50, tol_delta=0.0
    )
    r64 = gn.plan(spec, robot, p64, th0, sdf64, cfg)
    r32 = gn.plan(
        spec, robot, p32, th0.astype(jnp.float32),
        sdf64.astype(jnp.float32), cfg,
    )
    e64 = float(r64.err_final[0])
    e32 = float(r32.err_final[0])
    assert abs(e64 - e32) <= 1e-2 * max(1.0, abs(e64)), (e64, e32)
    if env == "5":
        dth = float(jnp.max(jnp.abs(r64.th - r32.th.astype(jnp.float64))))
        assert dth < 5e-4, dth
