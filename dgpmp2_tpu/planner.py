"""High-level planner APIs mirroring the reference drivers.

* :class:`DiffGPMP2Planner` — the differentiable planner
  (``diff_gpmp2/gpmp2/diff_gpmp2_planner.py``): ``step`` does one batched GN
  iteration returning ``(dtheta, err, err_ext, covariances...)``; ``plan``
  (the reference's ``forward``) runs the full unrolled optimization with
  per-problem convergence and returns error traces; ``error_batch`` /
  ``error_ext_batch`` / ``unweighted_errors_batch`` expose the same error
  functionals.  Learned covariances enter through a covariance-provider
  callable (see ``dgpmp2_tpu/learn``) or explicit per-call overrides.

* :class:`GPMP2Planner` — the classic, non-differentiable planner
  (``gpmp2/gpmp2_planner.py``): host-side GN/LM loop over a jitted step with
  wall-clock plan budget (``plan_time``), lambda adaptation (10×/÷10) and
  trust-region damping — the pieces that need data-dependent host control
  flow live here, everything numeric stays compiled.

Design difference from the reference (deliberate, TPU-first): planners hold
only *static* configuration; all per-problem state (trajectories, SDFs,
means, covariances) flows through function arguments as batched pytrees, so
every method jits, vmaps and shards cleanly.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from dgpmp2_tpu.core import factors, gn, graph
from dgpmp2_tpu.utils import config as config_lib


class DiffGPMP2Planner:
    """Differentiable batched GPMP2 planner.

    Args mirror the reference constructor (``diff_gpmp2_planner.py:16``):
    dict params from the YAML schema plus a robot model.  ``dtype`` selects
    the compute precision (f32 on TPU; f64 available on CPU for
    verification).
    """

    def __init__(
        self,
        gp_params,
        obs_params,
        planner_params,
        optim_params,
        env_params,
        robot,
        learn_params=None,
        dtype=jnp.float32,
    ):
        self.robot = robot
        self.spec = config_lib.spec_from_params(planner_params, env_params, robot)
        self.cfg = config_lib.optim_from_params(optim_params)
        self.gp_params = gp_params
        self.obs_params = obs_params
        self.learn_params = learn_params
        self.dtype = dtype
        self.dynamics_mode = (
            learn_params["dgpmp2"]["dynamics_mode"] if learn_params else None
        )

    # -- parameter construction -------------------------------------------

    def make_params(self, start, goal,
                    workspace_goal=None) -> graph.GraphParams:
        """Fixed-covariance GraphParams from the YAML scalars for a batch of
        (start, goal) pairs shaped (B, D).  ``workspace_goal`` (B, W)
        supplies the end-effector target when the spec enables
        ``use_workspace_goal``."""
        gp, obs = self.gp_params, self.obs_params
        return graph.default_params(
            self.spec,
            self.robot,
            jnp.asarray(start, self.dtype),
            jnp.asarray(goal, self.dtype),
            qc_inv=gp["Q_c_inv"],
            cost_sigma=obs["cost_sigma"],
            epsilon_dist=obs["epsilon_dist"],
            k_s=gp["K_s"],
            k_g=gp["K_g"],
            k_d=gp.get("K_d"),
            k_v=gp.get("K_v"),
            v_x=gp.get("v_x"),
            v_y=gp.get("v_y"),
            k_self=gp.get("K_self"),
            eps_self=obs.get("self_collision_eps", 0.05),
            k_jl=gp.get("K_jl"),
            q_min=gp.get("q_min"),
            q_max=gp.get("q_max"),
            k_wg=gp.get("K_wg"),
            workspace_goal=workspace_goal,
            dtype=self.dtype,
        )

    def _with_overrides(self, params, qc_inv_traj=None, q_inv=None,
                        obscov_inv_traj=None, eps_traj=None):
        """Apply learned/explicit covariance overrides.

        ``qc_inv_traj`` is (B, T, dof, dof) and gets expanded through the GP
        closed form; ``q_inv`` is a full (B, T, D, D) inverse covariance
        (``dynamics_mode='q_full'``, ``plan_layer.py:90``).
        """
        if qc_inv_traj is not None:
            params = params.replace(
                q_inv=factors.gp_q_inv(qc_inv_traj.astype(self.dtype), self.spec.dt)
            )
        if q_inv is not None:
            params = params.replace(q_inv=q_inv.astype(self.dtype))
        if obscov_inv_traj is not None:
            params = params.replace(obs_inv=obscov_inv_traj.astype(self.dtype))
        if eps_traj is not None:
            params = params.replace(eps=eps_traj.astype(self.dtype))
        return params

    # -- reference API ------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def _step_impl(self, params, params_fix, th, sdf):
        dth = gn.gn_step(
            self.spec, self.robot, params, th, sdf,
            delta=jnp.asarray(self.cfg.reg, self.dtype),
        )
        err = jax.lax.stop_gradient(
            graph.graph_error(self.spec, self.robot, params, th, sdf)
        )
        err_ext = graph.graph_error(
            self.spec, self.robot, params, th, sdf,
            q_inv=params_fix.q_inv, obs_inv=params_fix.obs_inv,
        )
        return dth, err, err_ext

    def step(
        self,
        th,
        start,
        goal,
        sdf,
        qc_inv_traj=None,
        q_inv=None,
        obscov_inv_traj=None,
        eps_traj=None,
    ):
        """One batched GN iteration (``DiffGPMP2Planner.step``,
        ``diff_gpmp2_planner.py:176-211``).

        Returns ``(dtheta, err, err_ext, params)`` where ``err`` is the
        weighted graph error under stop-gradient (``plan_layer.error_batch``
        semantics) and ``err_ext`` the gradient-carrying external error with
        fixed covariances; ``params`` carries the covariances actually used
        (the reference returns them for its training loop).
        """
        params_fix = self.make_params(start, goal)
        params = self._with_overrides(
            params_fix, qc_inv_traj, q_inv, obscov_inv_traj, eps_traj
        )
        th = jnp.asarray(th, self.dtype)
        sdf = jnp.asarray(sdf, self.dtype)
        dth, err, err_ext = self._step_impl(params, params_fix, th, sdf)
        return dth, err, err_ext, params

    @functools.partial(jax.jit, static_argnums=0)
    def _plan_impl(self, params, params_fix, th_init, sdf):
        return gn.plan(
            self.spec, self.robot, params, th_init, sdf, self.cfg,
            params_fix=params_fix,
        )

    def plan(
        self,
        th_init,
        start,
        goal,
        sdf,
        qc_inv_traj=None,
        q_inv=None,
        obscov_inv_traj=None,
        eps_traj=None,
    ) -> gn.PlanResult:
        """Full unrolled plan (the reference's ``forward``,
        ``diff_gpmp2_planner.py:92-174``) — batched, compiled, differentiable."""
        params_fix = self.make_params(start, goal)
        params = self._with_overrides(
            params_fix, qc_inv_traj, q_inv, obscov_inv_traj, eps_traj
        )
        return self._plan_impl(
            params, params_fix, jnp.asarray(th_init, self.dtype),
            jnp.asarray(sdf, self.dtype),
        )

    # Alias for reference drop-in feel.
    forward = plan

    def error_batch(self, th, start, goal, sdf):
        params = self.make_params(start, goal)
        return jax.lax.stop_gradient(
            graph.graph_error(self.spec, self.robot, params,
                              jnp.asarray(th, self.dtype),
                              jnp.asarray(sdf, self.dtype))
        )

    def error_ext_batch(self, th, start, goal, sdf):
        params = self.make_params(start, goal)
        return graph.graph_error(
            self.spec, self.robot, params,
            jnp.asarray(th, self.dtype), jnp.asarray(sdf, self.dtype),
        )

    def linear_error(self, th, start, goal, sdf):
        """Stacked residual vector (B, M) (``PlanLayer.linear_error``,
        ``plan_layer.py:347-372``; batched unlike the reference's per-sample
        loop at ``diff_gpmp2_planner.py:236-243``)."""
        params = self.make_params(start, goal)
        return graph.linear_error(
            self.spec, self.robot, params,
            jnp.asarray(th, self.dtype), jnp.asarray(sdf, self.dtype),
        )

    def unweighted_errors_batch(self, th, start, goal, sdf):
        params = self.make_params(start, goal)
        return graph.unweighted_errors(
            self.spec, self.robot, params,
            jnp.asarray(th, self.dtype), jnp.asarray(sdf, self.dtype),
        )


class GPMP2Planner:
    """Classic (non-differentiable) GN / LM planner with host-side control.

    Mirrors ``gpmp2/gpmp2_planner.py``: explicit iteration loop with
    convergence exit, wall-clock ``plan_time`` budget, and for ``method=
    'lm'`` the 10×/÷10 lambda schedule with trust-region diagonal damping
    and step rejection (``gpmp2_planner.py:92-103,177-193``).  Each
    iteration's numeric work is one compiled GN step.
    """

    def __init__(self, gp_params, obs_params, planner_params, env_params, robot,
                 dtype=jnp.float64):
        self._diff = DiffGPMP2Planner(
            gp_params, obs_params, planner_params,
            {"method": "gauss_newton", "reg": 0.0, "max_iters": 100},
            env_params, robot, dtype=dtype,
        )
        self.spec = self._diff.spec
        self.robot = robot
        self.dtype = dtype

    @functools.partial(jax.jit, static_argnums=(0, 5))
    def _step(self, params, th, sdf, delta, trust_region):
        dth = gn.gn_step(self.spec, self.robot, params, th, sdf,
                         delta, trust_region=trust_region)
        err_new = graph.graph_error(self.spec, self.robot, params, th + dth, sdf)
        return dth, err_new

    def step(self, th, start, goal, sdf, optim_params=None):
        """One Gauss-Newton step on a single problem — returns
        ``(dtheta, err_old)`` like the reference's ``GPMP2Planner.step``
        (``gpmp2_planner.py:41-60``): the caller owns the iteration loop
        (see ``examples/gpmp2_2d_step_example.py``).

        Note: faithful to the reference's return contract, which evaluates
        the graph error per call; a loop that needs err at the NEW iterate
        too should use :meth:`error` sparingly or :meth:`plan`/
        :meth:`plan_batch`, which reuse one evaluation per iteration."""
        reg = float((optim_params or {}).get("reg", 0.0))
        params = self._diff.make_params(
            jnp.asarray(start, self.dtype)[None],
            jnp.asarray(goal, self.dtype)[None],
        )
        thb = jnp.asarray(th, self.dtype)[None]
        sdfb = jnp.asarray(sdf, self.dtype)[None]
        err_old = graph.graph_error(self.spec, self.robot, params, thb, sdfb)
        dth, _ = self._step(params, thb, sdfb,
                            jnp.asarray(reg, self.dtype), False)
        return dth[0], float(err_old[0])

    def error(self, th, start, goal, sdf):
        """Weighted graph error of one trajectory (``gpmp2_planner.py`` /
        the step example's ``planner.error``)."""
        params = self._diff.make_params(
            jnp.asarray(start, self.dtype)[None],
            jnp.asarray(goal, self.dtype)[None],
        )
        return float(graph.graph_error(
            self.spec, self.robot, params,
            jnp.asarray(th, self.dtype)[None],
            jnp.asarray(sdf, self.dtype)[None],
        )[0])

    def plan(self, start, goal, th_init, sdf, optim_params=None):
        """Single-problem plan; returns ``(th, err_init, err_final,
        err_per_iter, iters, time_taken)`` like ``gpmp2_planner.py:62-131``."""
        th, err_init, err_final, err_per_iter, iters, dt = self.plan_batch(
            jnp.asarray(start, self.dtype)[None],
            jnp.asarray(goal, self.dtype)[None],
            jnp.asarray(th_init, self.dtype)[None],
            jnp.asarray(sdf, self.dtype)[None],
            optim_params,
        )
        return (
            th[0], float(err_init[0]), float(err_final[0]),
            [float(e[0]) for e in err_per_iter], int(iters[0]), dt,
        )

    def plan_multistart(self, startb, goalb, th_initb, sdfb,
                        optim_params=None, restarts=8, amp=1.5, seed=0,
                        prune_iters=0, keep=0):
        """Batched multi-start plan: ``restarts`` endpoint-preserving seed
        perturbations per problem, planned as one (K·B)-batch and selected
        per problem (contact-free first, then smoothness) — see
        :mod:`dgpmp2_tpu.core.multistart`.  The TPU-native escape from bad
        Gauss-Newton basins on dense clutter (contact_free 0.32 → 0.85 on
        the forest family, PERFORMANCE.md); the reference's per-problem
        loop (``gpmp2_planner.py:62``) would pay K× wall-clock for this.

        ``prune_iters``/``keep`` enable staged pruning — plan all K seeds
        for ``prune_iters`` iterations, finish only the best ``keep`` per
        problem (K-seed coverage at ~keep-seed cost; see
        :func:`dgpmp2_tpu.core.multistart.plan_multistart`).

        Returns a :class:`~dgpmp2_tpu.core.multistart.MultistartResult`.
        """
        from dgpmp2_tpu.core.multistart import plan_multistart as _ms

        op = optim_params or {}
        cfg = gn.OptimConfig(
            method=op.get("method", "gauss_newton"),
            reg=float(op.get("reg", 0.1)),
            max_iters=int(op.get("max_iters", 50)),
            tol_err=float(op.get("tol_err", 1e-3)),
            tol_delta=float(op.get("tol_delta", 1e-4)),
        )
        params = self._diff.make_params(
            jnp.asarray(startb, self.dtype), jnp.asarray(goalb, self.dtype)
        )
        return _ms(
            self.spec, self.robot, params,
            jnp.asarray(th_initb, self.dtype), jnp.asarray(sdfb, self.dtype),
            cfg, jax.random.PRNGKey(seed), restarts=restarts, amp=amp,
            prune_iters=prune_iters, keep=keep,
        )

    def plan_batch(self, startb, goalb, th_initb, sdfb, optim_params=None):
        """Batched classic plan — same semantics as :meth:`plan` over a
        leading batch axis (per-problem LM lambdas, step rejection and
        convergence freezing), one compiled step per iteration.

        The reference's ``GPMP2Planner`` is single-problem only
        (``gpmp2_planner.py:62``); here the non-differentiable API scales
        like everything else, so B problems cost one dispatch per iteration
        instead of B.

        Returns ``(thb (B,T+1,D), err_init (B,), err_final (B,),
        err_per_iter [list of (B,)], iters (B,), time_taken)``.
        """
        if optim_params is None:
            optim_params = {
                "method": "gauss_newton", "plan_time": np.inf,
                "max_iters": 100, "tol_err": 1e-2, "tol_delta": 1e-3, "reg": 0.0,
            }
        method = optim_params.get("method", "gauss_newton")
        plan_time = config_lib.plan_time_budget(optim_params)
        max_iters = float(optim_params.get("max_iters", np.inf))
        tol_delta = float(optim_params.get("tol_delta", 1e-3))
        lm = method == "lm"

        th = jnp.asarray(th_initb, self.dtype)
        sdfb = jnp.asarray(sdfb, self.dtype)
        b = th.shape[0]
        params = self._diff.make_params(
            jnp.asarray(startb, self.dtype), jnp.asarray(goalb, self.dtype)
        )
        err_old = graph.graph_error(self.spec, self.robot, params, th, sdfb)
        err_init = np.asarray(err_old).copy()
        lam = jnp.full((b,), 1e-4, self.dtype)
        conv = np.zeros((b,), bool)
        iters = np.zeros((b,), np.int64)
        err_per_iter = []
        start_t = time.time()
        j = 0
        while True:
            err_per_iter.append(np.asarray(err_old).copy())
            active = jnp.asarray(~conv)
            if lm:
                dth, err_new = self._step(params, th, sdfb, lam, True)
                accept = err_new < err_old
                take = accept & active
                th = jnp.where(take[:, None, None], th + dth, th)
                err_old = jnp.where(take, err_new, err_old)
                lam = jnp.where(
                    active, jnp.where(accept, lam / 10.0, lam * 10.0), lam
                )
            else:
                delta = jnp.asarray(float(optim_params.get("reg", 0.0)),
                                    self.dtype)
                dth, err_new = self._step(params, th, sdfb, delta, False)
                th = jnp.where(active[:, None, None], th + dth, th)
                err_old = jnp.where(active, err_new, err_old)
            j += 1
            dth_norm = np.asarray(
                jnp.linalg.norm(dth.reshape(b, -1), axis=-1)
            )
            iters += ~conv
            conv = conv | (dth_norm < tol_delta)
            if conv.all() or j >= max_iters:
                break
            if time.time() - start_t > plan_time:
                break
        return (
            th, err_init, np.asarray(err_old), err_per_iter, iters,
            time.time() - start_t,
        )
