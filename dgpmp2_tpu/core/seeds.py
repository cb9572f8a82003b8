"""Informed (RRT*) seed trajectories for multi-start planning.

GPMP2 is a local optimizer; on dense clutter (the ``forest`` family) even
a large pool of sine-harmonic perturbations of the straight-line seed
(``core.multistart``) can fail to reach a collision-free basin — the
perturbations are *uninformed*.  The reference's production answer is to
seed GPMP2 with an RRT* path: its dataset generator plans RRT* inits
(``/root/reference/diff_gpmp2/datasets/generate_2d_dataset.py``,
``rrt_star_traj``) and ``examples/rrt_star_example.py`` smooths RRT*
output with GPMP2.  This module makes that a production path here:
host-side native RRT* (``csrc/dgpmp2_native.cpp`` via
``dgpmp2_tpu.native``, the in-repo replacement for the reference's OMPL
dependency) generates one coarse feasible path per problem, which is
arc-length-resampled to the T+1 support states and given the constant
average velocity — exactly the reference's recipe
(``ompl_rrtstar.py:41-46`` interpolate + ``utils/planner_utils.py:60-71``
``path_to_traj_avg_vel``).  The resulting (B, T+1, 2·dof) batch plugs
into :func:`dgpmp2_tpu.core.multistart.plan_multistart` as
``extra_seeds`` — seed generation is host-side numpy (branchy tree
search, the one workload that does NOT belong on the TPU), planning and
selection stay one compiled TPU batch.

Division of labor: RRT* supplies *basin membership* (a path on the right
side of the clutter), the sine-harmonic pool supplies *local diversity*,
and Gauss-Newton supplies smoothness/optimality.  A failed or unavailable
RRT* degrades to the straight-line base seed, so the pool is never worse
than uninformed multi-start.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from dgpmp2_tpu import native


def path_to_traj_avg_vel(path: np.ndarray, total_time_sec: float,
                         num_states: int) -> np.ndarray:
    """Waypoint path (S, dof) -> trajectory (num_states, 2·dof): arc-length
    resampled positions + constant average velocity (the reference's
    ``path_to_traj_avg_vel``, ``utils/planner_utils.py:60-71``)."""
    pos = native.interpolate_path(np.asarray(path, np.float64), num_states)
    avg_vel = (pos[-1] - pos[0]) / float(total_time_sec)
    vel = np.broadcast_to(avg_vel, pos.shape)
    return np.concatenate([pos, vel], axis=-1).astype(np.float32)


def rrt_seed_batch(
    sdf_batch: np.ndarray,
    starts: np.ndarray,
    goals: np.ndarray,
    x_lims: Tuple[float, float],
    y_lims: Tuple[float, float],
    total_time_sec: float,
    num_states: int,
    clearance: float,
    plan_time: float = 1.0,
    max_iters: int = 20000,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-problem RRT* seed trajectories for a (B, H, W) SDF batch.

    Returns ``(seeds (B, num_states, 2·dof) f32, found (B,) bool)``.
    Problems where RRT* fails (or the native library is unavailable) get
    the straight-line trajectory with average velocity — identical to the
    multi-start base seed, so appending such a row to the pool is a
    harmless duplicate, never a regression.

    ``clearance`` is the validity threshold ``sdf(x) > clearance``
    (reference semantics: ``ompl_rrtstar.py`` ``isStateValid`` →
    ``env.is_feasible(state, eps)``); pass the robot radius (optionally
    plus a margin).  Host-side and sequential over B — RRT* is a branchy
    pointer-chasing search; at ~1 s/problem budget this is the data-gen
    cost profile, amortized by serving-side caching or by running it only
    for problems whose uninformed plan failed (see
    ``serve.MultistartPlanningService`` ``rrt_fallback``).
    """
    sdf_batch = np.asarray(sdf_batch, np.float32)
    starts = np.asarray(starts, np.float32)
    goals = np.asarray(goals, np.float32)
    b = sdf_batch.shape[0]
    seeds = np.empty((b, num_states, 4), np.float32)
    found = np.zeros((b,), bool)
    for i in range(b):
        path = None
        if native.available():
            path = native.rrt_star(
                sdf_batch[i], starts[i, :2], goals[i, :2], x_lims, y_lims,
                clearance=clearance, plan_time=plan_time,
                max_iters=max_iters, seed=seed + i,
            )
        if path is None or len(path) < 2:
            path = np.stack([starts[i, :2], goals[i, :2]])
        else:
            found[i] = True
        seeds[i] = path_to_traj_avg_vel(path, total_time_sec, num_states)
    return seeds, found
