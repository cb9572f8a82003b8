"""Gauss-Newton / Levenberg-Marquardt engine over the block factor graph.

Replaces the reference's outer-loop drivers (``gpmp2/gpmp2_planner.py:62,
207`` and ``gpmp2/diff_gpmp2_planner.py:92,176``) with compiler-friendly
control flow: one :func:`gn_step` is a pure function, and :func:`plan` runs
``lax.scan`` over a fixed iteration budget with **per-problem convergence
masking** — converged trajectories freeze via ``jnp.where`` (the batched
analog of ``examples/diff_gpmp2_2d_batch_step_example.py:83-103``) while the
rest keep optimizing.  The whole plan is differentiable end-to-end through
the unrolled iterations, like the reference's autograd through its Python
``while`` loop, but as a single compiled program.

Gradient topology matches the reference exactly (SURVEY.md §2.10):
``err`` (the convergence metric) is computed under ``stop_gradient``
(mirroring ``plan_layer.error_batch``'s ``torch.no_grad()``), while
``err_ext`` (fixed external covariances) carries gradients
(``plan_layer.py:275,310``).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from dgpmp2_tpu.core import graph as graph_lib
from dgpmp2_tpu.ops import tridiag


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Optimizer options (``optim_params`` YAML, ``gpmp2_2d_params.yaml:19-25``)."""

    method: str = "gauss_newton"  # or "lm"
    reg: float = 0.1
    max_iters: int = 100
    tol_err: float = 1e-3
    tol_delta: float = 1e-4
    # Convergence criteria. The reference's scalar check uses only the
    # ‖dθ‖ < tol_delta test (``planner_utils.py:3-16``); its batched check
    # effectively uses only the |Δerr| < tol_err test due to an overwrite
    # bug (``planner_utils.py:24-27``).  We expose both, defaulting to the
    # scalar (intended) semantics.
    conv_check_dtheta: bool = True
    conv_check_err: bool = False
    # LM lambda adaptation (``gpmp2_planner.py:92-103``): accepted steps
    # divide lambda by 10, rejected steps multiply by 10.
    lm_lambda_init: float = 1e-4
    # Linear-system engine inside :func:`plan`:
    #   "auto"     — stream on TPU f32 (the fastest measured configuration,
    #                ~9x the standard path at B=1024: PERFORMANCE.md),
    #                standard elsewhere.
    #   "standard" — standard-layout assembly + tridiag.btd_solve_auto.
    #   "stream"   — force stream-layout assembly + streaming Pallas solve
    #                (core/stream.py) even off-TPU (interpret mode; slow,
    #                test-only).
    #   "df32"     — two-float (double-float) assembly + block-Thomas solve
    #                (core/df32.py): ~f64-grade per-step accuracy on the f32
    #                backend at ~15x the elementwise flops.  Opt-in, for
    #                when reference(f64)-grade steps are required on TPU —
    #                measured drift table in docs/F32_PRECISION.md §1b.
    engine: str = "auto"


_ENGINES = ("auto", "standard", "stream", "df32")


def resolve_engine(engine: str, dtype) -> str:
    """Map ``engine='auto'`` to a concrete engine for the current backend.

    The stream engine assembles the normal equations natively in the
    Pallas kernel's vreg layout and is ~9x faster than the standard path
    on a v5e at B=1024 (PERFORMANCE.md); off-TPU it would run the kernel
    in interpret mode, so ``auto`` keeps the standard path there.  The
    kernel is f32-only, hence the dtype gate (f64 CPU verification runs
    stay on the standard path).
    """
    if engine not in _ENGINES:
        raise ValueError(f"unknown engine {engine!r}; expected one of {_ENGINES}")
    if engine != "auto":
        return engine
    if jax.default_backend() == "tpu" and jnp.dtype(dtype) == jnp.float32:
        return "stream"
    return "standard"


class PlanResult(NamedTuple):
    th: jnp.ndarray  # (B, T+1, D) final trajectories
    err_init: jnp.ndarray  # (B,)
    err_final: jnp.ndarray  # (B,)
    err_per_iter: jnp.ndarray  # (iters, B) weighted error trace
    err_ext_per_iter: jnp.ndarray  # (iters, B) external error trace
    iters: jnp.ndarray  # (B,) iterations actually used per problem
    # Best non-colliding trajectory by GP-MSE seen along the optimization
    # (``test_planner.py:253-262``); equals `th` when none was non-colliding.
    best_th: Optional[jnp.ndarray] = None
    best_valid: Optional[jnp.ndarray] = None  # (B,) bool


def damped_system(diag, off, rhs, delta, trust_region: bool = False):
    """Apply GN damping ``+δI`` or LM trust-region ``+δ·diag(Λ)``.

    ``delta`` may be a scalar or a (B,)-shaped per-problem value (LM keeps an
    independent lambda per problem).
    """
    d = diag.shape[-1]
    delta = jnp.asarray(delta, diag.dtype)
    while delta.ndim < diag.ndim - 3 + 1:
        delta = delta[..., None]
    # delta now broadcasts over (..., T) once we add trailing dims.
    scale = delta[..., None, None]
    if trust_region:
        damp = scale * (jnp.eye(d, dtype=diag.dtype) * diag)
    else:
        damp = scale * jnp.eye(d, dtype=diag.dtype)
    return diag + damp, off, rhs


def gn_step(
    spec: graph_lib.GraphSpec,
    robot,
    params: graph_lib.GraphParams,
    th: jnp.ndarray,
    sdf: jnp.ndarray,
    delta,
    trust_region: bool = False,
) -> jnp.ndarray:
    """One Gauss-Newton update ``dθ = (AᵀKA + δI)⁻¹ AᵀK b`` in block form.

    Functionally equivalent to ``PlanLayer.construct_linear_system_batch`` +
    ``solve_linear_system_batch`` (``plan_layer.py:152-234``) without ever
    forming A, K or the dense normal matrix.
    """
    diag, off, rhs = graph_lib.assemble(spec, robot, params, th, sdf)
    diag, off, rhs = damped_system(diag, off, rhs, delta, trust_region)
    dth = tridiag.btd_solve_auto(diag, off, rhs)
    return dth


def _converged(dth, err_delta, cfg: OptimConfig):
    """Per-problem convergence test (batched ``check_convergence`` intent)."""
    b = dth.shape[0]
    conv = jnp.zeros((b,), bool)
    if cfg.conv_check_dtheta:
        dth_norm = jnp.linalg.norm(dth.reshape(b, -1), axis=-1)
        conv = conv | (dth_norm < cfg.tol_delta)
    if cfg.conv_check_err:
        conv = conv | (jnp.abs(err_delta) < cfg.tol_err)
    return conv


def plan(
    spec: graph_lib.GraphSpec,
    robot,
    params: graph_lib.GraphParams,
    th_init: jnp.ndarray,
    sdf: jnp.ndarray,
    cfg: OptimConfig,
    params_fix: Optional[graph_lib.GraphParams] = None,
    unroll: int = 1,
    track_best: bool = False,
) -> PlanResult:
    """Full batched plan: ``lax.scan`` of GN/LM steps with convergence freeze.

    The functional analog of ``DiffGPMP2Planner.forward``
    (``diff_gpmp2_planner.py:92-174``) — but batched (the reference loops
    over samples serially in Python) and compiled as one program.  LM mode
    implements the per-problem 10×/÷10 lambda schedule with step rejection
    (``gpmp2_planner.py:92-103``).

    ``params_fix`` supplies the fixed external covariances for the
    ``err_ext`` trace; defaults to ``params``.
    """
    if cfg.method not in ("gauss_newton", "lm"):
        raise ValueError(
            f"unknown method {cfg.method!r}; expected 'gauss_newton' or 'lm'"
        )
    if params_fix is None:
        params_fix = params
    b = th_init.shape[0]
    dtype = th_init.dtype
    lm = cfg.method == "lm"

    def residuals(th):
        return graph_lib.eval_residuals(spec, robot, params, th, sdf)

    def weighted_err(res):
        # no-grad semantics of plan_layer.error_batch (plan_layer.py:275)
        return lax.stop_gradient(
            graph_lib.error_from_residuals(spec, params, res)
        )

    def ext_err(res):
        return graph_lib.error_from_residuals(
            spec, params, res,
            q_inv=params_fix.q_inv, obs_inv=params_fix.obs_inv,
        )

    def select(mask, a, b_):
        """Per-problem pytree select (mask (B,), broadcast to leaf rank)."""
        def pick(x, y):
            m = mask.reshape(mask.shape + (1,) * (x.ndim - 1))
            return jnp.where(m, x, y)

        return jax.tree.map(pick, a, b_)

    # The factor graph is evaluated ONCE per iteration: the same residuals
    # drive assembly, the error trace, and the external error (the
    # reference recomputes them >=3x per step, plan_layer.py:95-98).
    # GP/prior Gauss blocks are constant across iterations -> hoisted.
    res0 = residuals(th_init)
    err0 = weighted_err(res0)
    static = graph_lib.assemble_static(spec, params, dtype)
    engine = resolve_engine(cfg.engine, dtype)
    use_stream = engine == "stream"
    use_df32 = engine == "df32"
    if use_df32 and jnp.dtype(dtype) != jnp.float32:
        raise ValueError("engine='df32' is an f32-backend accuracy mode; "
                         "use the standard engine for f64 runs")
    if use_stream:
        from dgpmp2_tpu.core import stream as stream_lib

        # Scalar GN damping folds into the static diagonal; LM damping is
        # per-problem/per-iteration and applied inside stream_step.
        ss = stream_lib.build_stream_static(
            spec, params, static, b, dtype, reg=0.0 if lm else cfg.reg
        )

    def best_score(res):
        """GP-MSE if non-colliding on the interior, else +inf
        (``test_planner.py:253-262``)."""
        colliding = jnp.any(res.r_obs[..., 1:-1, :] > 0, axis=(-2, -1))
        if res.r_obsi is not None:
            # GP-interpolated collision checks exist precisely to catch
            # penetration between support states — a "best" iterate must
            # clear them too.
            colliding = colliding | jnp.any(res.r_obsi > 0, axis=(-3, -2, -1))
        if res.r_self is not None:
            # Self-collision is a collision: keeps this criterion consistent
            # with multistart's score_candidates.
            colliding = colliding | jnp.any(res.r_self[..., 1:-1, :] > 0,
                                            axis=(-2, -1))
        gp_mse = jnp.mean(jnp.sum(res.r_gp**2, -1), axis=-1)
        return jnp.where(colliding, jnp.inf, gp_mse)

    def body(carry, _):
        th, res, err_old, conv, lam, iters, best = carry
        delta = lam if lm else jnp.asarray(cfg.reg, dtype)
        if use_stream:
            dth = stream_lib.stream_step(
                spec, params, ss, res, delta, trust_region=lm
            )
        elif use_df32:
            from dgpmp2_tpu.core import df32 as df32_lib

            dth = df32_lib.df32_step_from_residuals(
                spec, params, res, delta, trust_region=lm
            )
        else:
            diag, off, rhs = graph_lib.assemble_from_residuals(
                spec, params, res, dtype=dtype, static=static
            )
            diag, off, rhs = damped_system(
                diag, off, rhs, delta, trust_region=lm
            )
            dth = tridiag.btd_solve_auto(diag, off, rhs)
        th_prop = th + dth
        res_prop = residuals(th_prop)
        err_prop = weighted_err(res_prop)
        # LM accept/reject (gpmp2_planner.py:92-103); GN always accepts.
        accept = (err_prop < err_old) if lm else jnp.ones((b,), bool)
        take = accept & ~conv
        th_next = jnp.where(take[:, None, None], th_prop, th)
        res_next = select(take, res_prop, res)
        err_next = jnp.where(take, err_prop, err_old)
        if lm:
            lam = jnp.where(conv, lam, jnp.where(accept, lam / 10.0, lam * 10.0))
        conv_trigger = _converged(dth, err_next - err_old, cfg)
        if lm:
            # A rejected proposal is not evidence of convergence: err_next ==
            # err_old makes |Δerr| = 0 pass tol_err, and dth is the rejected
            # step — LM's contract is to raise lambda and retry instead
            # (``gpmp2_planner.py:92-103``).
            conv_trigger = conv_trigger & accept
        conv_next = conv | conv_trigger
        iters = iters + (~conv).astype(jnp.int32)
        err_ext = ext_err(res_next)  # residual reuse: no extra SDF lookup
        if track_best:
            best_th, best_s = best
            s = lax.stop_gradient(best_score(res_next))
            better = s < best_s
            best = (
                jnp.where(better[:, None, None], th_next, best_th),
                jnp.minimum(s, best_s),
            )
        return (th_next, res_next, err_next, conv_next, lam, iters, best), (
            err_next, err_ext,
        )

    lam0 = jnp.full((b,), cfg.lm_lambda_init, dtype)
    best0 = (th_init, lax.stop_gradient(best_score(res0))) if track_best else ()
    init = (th_init, res0, err0, jnp.zeros((b,), bool), lam0,
            jnp.zeros((b,), jnp.int32), best0)
    (th, _, err_final, _, _, iters, best), (errs, errs_ext) = lax.scan(
        body, init, None, length=cfg.max_iters, unroll=unroll
    )
    best_th = best_valid = None
    if track_best:
        best_th, best_s = best
        best_valid = jnp.isfinite(best_s)
        best_th = jnp.where(best_valid[:, None, None], best_th, th)
    return PlanResult(
        th=th,
        err_init=err0,
        err_final=err_final,
        err_per_iter=errs,
        err_ext_per_iter=errs_ext,
        iters=iters,
        best_th=best_th,
        best_valid=best_valid,
    )
