"""Trajectory initialization & evaluation metrics.

Rebuild of ``diff_gpmp2/utils/planner_utils.py`` (straight-line init,
smoothness/collision metrics) as batched pure functions.
"""
from __future__ import annotations

import jax.numpy as jnp


def straight_line_traj(
    start_conf: jnp.ndarray,
    goal_conf: jnp.ndarray,
    total_time_sec: float,
    total_time_step: int,
) -> jnp.ndarray:
    """Linear interpolation with constant average velocity.

    ``planner_utils.py:38-60`` (both the scalar and batched variants — this
    one is batched over any leading dims).

    Args:
      start_conf, goal_conf: (..., dof) endpoint configurations.

    Returns:
      (..., T+1, 2·dof) trajectories: positions interpolate start→goal,
      velocities are the constant average velocity.
    """
    t = total_time_step
    alpha = jnp.linspace(0.0, 1.0, t + 1, dtype=start_conf.dtype)
    pos = (
        start_conf[..., None, :] * (1.0 - alpha)[:, None]
        + goal_conf[..., None, :] * alpha[:, None]
    )
    avg_vel = (goal_conf - start_conf) / float(total_time_sec)
    vel = jnp.broadcast_to(avg_vel[..., None, :], pos.shape)
    return jnp.concatenate([pos, vel], axis=-1)


def smoothness_metrics(traj: jnp.ndarray, total_time_sec: float, total_time_step: int):
    """Average velocity/acceleration/jerk magnitudes (``planner_utils.py:75-90``).

    Uses the reference's finite-difference convention (differences of the
    velocity columns divided by step counts).  traj: (..., T+1, D) with the
    last D/2 dims velocities.  Returns three (...,)-shaped means.
    """
    d = traj.shape[-1]
    dtraj = traj[..., 1:, :] - traj[..., :-1, :]
    ddtraj = dtraj[..., 1:, :] - dtraj[..., :-1, :]
    vel = traj[..., :, d // 2 :]
    acc = dtraj[..., :, d // 2 :] / float(total_time_step)
    jerk = ddtraj[..., :, d // 2 :] / float(total_time_step) ** 2
    avg_vel = jnp.mean(jnp.linalg.norm(vel, axis=-1), axis=-1)
    avg_acc = jnp.mean(jnp.linalg.norm(acc, axis=-1), axis=-1)
    avg_jerk = jnp.mean(jnp.linalg.norm(jerk, axis=-1), axis=-1)
    return avg_vel, avg_acc, avg_jerk


def collision_metrics(
    obs_error: jnp.ndarray, total_time_sec: float, total_time_step: int,
    eps=None,
):
    """Collision statistics from per-state hinge residuals.

    ``planner_utils.py:92-102``: endpoints excluded, a state is "in
    collision" when its hinge residual is nonzero.  NOTE the hinge fires at
    ``d < ε + r`` — a *margin* violation, not contact.  When ``eps`` is
    given the dict additionally splits out true contact (``d < r``, i.e.
    hinge residual > ε), which makes learned-vs-static comparisons
    interpretable: grazing the safety margin and driving through a wall are
    different failures.

    Args:
      obs_error: (..., T+1, L) hinge residuals (from
        :func:`dgpmp2_tpu.core.graph.obstacle_residuals`).
      eps: optional (..., T+1, L)-broadcastable safety margin ε.

    Returns dict of (...,)-shaped metrics: ``in_coll`` (bool),
    ``avg_penetration``, ``max_penetration``, ``coll_intensity`` (+
    ``in_contact``, ``contact_intensity`` when ``eps`` is given).
    """
    interior = obs_error[..., 1:-1, :]
    colliding = interior > 0
    num_pen = jnp.sum(colliding, axis=(-2, -1))
    dt = float(total_time_sec) / float(total_time_step)
    out = {
        "in_coll": num_pen > 0,
        "avg_penetration": jnp.mean(interior, axis=(-2, -1)),
        "max_penetration": jnp.max(interior, axis=(-2, -1)),
        "coll_intensity": num_pen * dt / float(total_time_sec),
    }
    if eps is not None:
        eps_i = jnp.broadcast_to(eps, obs_error.shape)[..., 1:-1, :]
        contact = interior > eps_i
        num_contact = jnp.sum(contact, axis=(-2, -1))
        out["in_contact"] = num_contact > 0
        out["contact_intensity"] = num_contact * dt / float(total_time_sec)
    return out


def path_to_traj_avg_vel(path: jnp.ndarray, traj_time: float) -> jnp.ndarray:
    """Lift a waypoint path (..., S, dof) to states with constant average
    velocity (``planner_utils.py:63-75``)."""
    avg_vel = (path[..., -1, :] - path[..., 0, :]) / float(traj_time)
    vel = jnp.broadcast_to(avg_vel[..., None, :], path.shape)
    return jnp.concatenate([path, vel], axis=-1)
