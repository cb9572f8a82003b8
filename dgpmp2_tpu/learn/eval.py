"""Evaluation harness: planner rollouts + quality metrics + YAML results.

Rebuild of ``diff_gpmp2/learning/test_planner.py`` (SURVEY.md §3.4): roll
out the planner (learned or static covariances) on a dataset of problems,
track the best non-colliding trajectory by GP-MSE, and report the
reference's metric suite — task loss, pos/vel MSE vs expert, gp-MSE,
smoothness (avg vel/acc/jerk), collision stats (in-collision rate, avg/max
penetration, collision intensity), constraint violations
(``test_planner.py:299-400``, ``planner_utils.py:75-102``).  Unlike the
reference (batch=1 Python loop per env) everything evaluates batched.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.utils.trajectory import collision_metrics, smoothness_metrics


def evaluate_batch(
    spec: graph.GraphSpec,
    robot,
    params: graph.GraphParams,
    th_final: jnp.ndarray,
    th_opt: Optional[jnp.ndarray],
    sdf: jnp.ndarray,
) -> Dict[str, np.ndarray]:
    """Compute the reference metric suite for final trajectories (B, T+1, D)."""
    r_obs = graph.obstacle_residuals(spec, robot, params, th_final, sdf)
    coll = collision_metrics(r_obs, spec.total_time_sec, spec.total_time_step,
                             eps=params.eps)
    avg_vel, avg_acc, avg_jerk = smoothness_metrics(
        th_final, spec.total_time_sec, spec.total_time_step
    )
    err_sg, err_gp, err_obs = graph.unweighted_errors(
        spec, robot, params, th_final, sdf
    )
    out = {
        "in_coll": np.asarray(coll["in_coll"]),
        "in_contact": np.asarray(coll["in_contact"]),
        "contact_intensity": np.asarray(coll["contact_intensity"]),
        "avg_penetration": np.asarray(coll["avg_penetration"]),
        "max_penetration": np.asarray(coll["max_penetration"]),
        "coll_intensity": np.asarray(coll["coll_intensity"]),
        "avg_vel": np.asarray(avg_vel),
        "avg_acc": np.asarray(avg_acc),
        "avg_jerk": np.asarray(avg_jerk),
        "gp_error": np.asarray(err_gp),
        "sg_error": np.asarray(err_sg),
        "obs_error": np.asarray(err_obs),
    }
    if spec.use_vel_limits and params.v_lim is not None:
        # Fraction of trajectory states with any per-axis velocity above its
        # limit (``test_planner.py:311-322`` — strict `>` per the reference's
        # `<= lim: continue` logic, normalized by T+1 states).
        v = th_final[..., spec.dof :]
        viol = jnp.any(jnp.abs(v) > params.v_lim, axis=-1)
        out["constraint_violation"] = np.asarray(
            jnp.mean(viol.astype(jnp.float32), axis=-1)
        )
    if spec.use_joint_limits and params.q_min is not None:
        # Companion metric for the joint-limit factor (no dGPMP2 analog —
        # GPMP2 C++ JointLimitFactor convention): fraction of states with
        # any joint outside [q_min, q_max].
        q = th_final[..., : spec.dof]
        violj = jnp.any((q < params.q_min) | (q > params.q_max), axis=-1)
        out["joint_limit_violation"] = np.asarray(
            jnp.mean(violj.astype(jnp.float32), axis=-1)
        )
    if spec.use_self_collision:
        # Body-pair penetration of true contact (d < r_i + r_j) — the
        # articulated analog of in_contact/max_penetration.
        pairs = jnp.asarray(spec.self_pairs, jnp.int32)
        centers, _ = robot.fk(th_final)
        radii = robot.radii_array(th_final.dtype)
        dist = jnp.sqrt(jnp.sum(
            (centers[..., pairs[:, 0], :] - centers[..., pairs[:, 1], :])
            ** 2, axis=-1) + 1e-12)
        pen = jnp.maximum(radii[pairs[:, 0]] + radii[pairs[:, 1]] - dist, 0.0)
        pen_int = pen[:, 1:-1, :]  # interior states, like collision_metrics
        out["in_self_contact"] = np.asarray(jnp.any(pen_int > 0, axis=(1, 2)))
        out["max_self_penetration"] = np.asarray(jnp.max(pen_int, axis=(1, 2)))
    if th_opt is not None:
        dof = spec.dof
        out["pos_mse"] = np.asarray(
            jnp.mean(jnp.sum((th_final[..., :dof] - th_opt[..., :dof]) ** 2, -1), -1)
        )
        out["vel_mse"] = np.asarray(
            jnp.mean(jnp.sum((th_final[..., dof:] - th_opt[..., dof:]) ** 2, -1), -1)
        )
    return out


def summarize(per_problem: Dict[str, np.ndarray]) -> Dict[str, float]:
    """Aggregate per-problem metrics into the results-YAML scalars
    (``test_planner.py:369-400``)."""
    s = {}
    for k, v in per_problem.items():
        v = np.asarray(v, np.float64)
        s[f"avg_{k}"] = float(np.mean(v))
    # solve_rate keeps the reference's convention (zero MARGIN violations,
    # hinge > 0 on the interior); contact_free_rate counts true contact
    # (d < r) only — the split that makes learned-vs-static interpretable.
    s["solve_rate"] = float(np.mean(~per_problem["in_coll"].astype(bool)))
    if "in_contact" in per_problem:
        s["contact_free_rate"] = float(
            np.mean(~per_problem["in_contact"].astype(bool))
        )
    if "in_self_contact" in per_problem:
        s["self_contact_free_rate"] = float(
            np.mean(~per_problem["in_self_contact"].astype(bool))
        )
    return s


def dump_results(path: str, summary: Dict[str, float]) -> None:
    with open(path, "w") as fp:
        yaml.safe_dump(summary, fp, default_flow_style=False)


def run_validation(
    spec: graph.GraphSpec,
    robot,
    cfg: gn.OptimConfig,
    make_params_fn,
    batches,
    learned_step_fn=None,
) -> Dict[str, float]:
    """Roll out plans over an iterable of problem batches and aggregate.

    ``batches`` yields dicts with ``start``/``goal`` (B, D), ``sdf``
    (B, H, W), optional ``th_opt`` and ``th_init``.  ``make_params_fn(start,
    goal) -> GraphParams`` supplies (possibly learned-static) covariances;
    ``learned_step_fn`` optionally replaces the fixed-covariance plan with a
    learned rollout (signature (params_fix, th0, sdf) -> th_final).
    """
    import jax

    from dgpmp2_tpu.utils.trajectory import straight_line_traj

    plan_jit = jax.jit(
        lambda params, th0, sdfb: gn.plan(spec, robot, params, th0, sdfb, cfg).th
    )
    all_metrics = []
    for batch in batches:
        start, goal, sdf = batch["start"], batch["goal"], batch["sdf"]
        params = make_params_fn(start, goal)
        th0 = batch.get("th_init")
        if th0 is None:
            th0 = straight_line_traj(
                start[:, : spec.dof], goal[:, : spec.dof],
                spec.total_time_sec, spec.total_time_step,
            ).astype(sdf.dtype)
        if learned_step_fn is not None:
            th = learned_step_fn(params, th0, sdf)
        else:
            th = plan_jit(params, th0, sdf)
        all_metrics.append(
            evaluate_batch(spec, robot, params, th, batch.get("th_opt"), sdf)
        )
    merged = {
        k: np.concatenate([m[k] for m in all_metrics]) for k in all_metrics[0]
    }
    return summarize(merged)
