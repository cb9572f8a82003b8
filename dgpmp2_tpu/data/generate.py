"""Dataset generation: procedural envs + GPMP2-expert trajectories.

Rebuild of ``diff_gpmp2/datasets/generate_2d_dataset.py`` (SURVEY.md §3.5):
sample far-apart start/goal pairs, draw an obstacle map from a family, build
the SDF, run the fixed-covariance planner as the *expert*, re-validate the
result for collisions, and write the reference-compatible dataset layout.

TPU-first difference: the expert plans run **batched** — all problems of an
env chunk in one compiled `plan` call — instead of the reference's serial
per-problem Python loop (``generate_2d_dataset.py:220-231``).  Env sampling
and rejection stay on host (numpy), which is where data prep belongs.

CLI:
    python -m dgpmp2_tpu.data.generate --out_folder d --dataset_type forest \
        --num_train 50 --num_test 10 --probs_per_env 2 --im_size 128
"""
from __future__ import annotations

import argparse
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.data import dataset as ds
from dgpmp2_tpu.data import obstacles
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.trajectory import straight_line_traj

DIST_FACTOR = 0.6  # min start-goal separation as a fraction of the diagonal


def sample_start_goal(rng, n, x_lims, y_lims):
    """Far-apart start/goal pairs, rejected PER PAIR (an all-or-nothing
    batch rejection has acceptance ~p^n and stalls for n > 1)."""
    lo = np.array([x_lims[0] + 1.0, y_lims[0] + 1.0])
    hi = np.array([x_lims[1] - 1.0, y_lims[1] - 1.0])
    diag = np.hypot(x_lims[1] - x_lims[0], y_lims[1] - y_lims[0])
    start = rng.uniform(lo, hi, size=(n, 2))
    goal = rng.uniform(lo, hi, size=(n, 2))
    while True:
        bad = np.linalg.norm(goal - start, axis=-1) < DIST_FACTOR * diag
        if not np.any(bad):
            return start, goal
        k = int(bad.sum())
        start[bad] = rng.uniform(lo, hi, size=(k, 2))
        goal[bad] = rng.uniform(lo, hi, size=(k, 2))


def world_to_pix(pts, x_lims, y_lims, res):
    out = np.empty_like(pts)
    out[:, 0] = -x_lims[0] / res + pts[:, 0] / res
    out[:, 1] = -y_lims[0] / res - pts[:, 1] / res
    return out


def generate_split(
    out_dir: str,
    num_envs: int,
    probs_per_env: int,
    family: str,
    im_size: int,
    rng: np.random.Generator,
    spec: graph.GraphSpec,
    robot,
    cfg: gn.OptimConfig,
    cov_scalars: dict,
    label_subdir: str = "opt_trajs_gpmp2",
    max_env_retries: int = 20,
    rrtstar_init: bool = False,
):
    os.makedirs(out_dir, exist_ok=True)
    res = (spec.x_lims[1] - spec.x_lims[0]) / im_size
    safety = float(cov_scalars["epsilon_dist"]) + robot.sphere_radii[0]
    patch_safety = int(np.ceil(safety / res))
    patch_robot = int(np.ceil(robot.sphere_radii[0] / res))
    patch_pts = {
        "tar_pit": patch_robot + 2 * patch_safety,
        "forest": 3 * patch_robot,
        "multi_obs": patch_safety + patch_robot,
        "passage": 3 * patch_robot,
        "mixed_clutter": int(0.8 * patch_safety),
    }[family]
    patch_obs = {
        "tar_pit": 0,
        "forest": 3 * patch_robot,
        "multi_obs": 2 * (patch_robot + patch_safety),
        "passage": 4 * patch_robot,
        "mixed_clutter": 2 * (patch_robot + patch_safety),
    }[family]

    import jax

    # jit once: eager gn.plan re-traces the whole scan on every call, which
    # dominates generation time (tracing >> planning).
    # track_best: the expert label is the best non-colliding iterate by
    # GP-MSE seen along the optimization (``test_planner.py:253-262``
    # selection) — in clutter the final iterate often clips an obstacle a
    # mid-run iterate cleared.  Measured on forest: 25% -> 78% per-problem
    # acceptance (with method="lm").
    plan_jit = jax.jit(
        lambda params, th0, sdfb: gn.plan(
            spec, robot, params, th0, sdfb, cfg, track_best=True
        )
    )

    env_idx = 0
    while env_idx < num_envs:
        for _ in range(max_env_retries):
            start, goal = sample_start_goal(rng, probs_per_env, spec.x_lims, spec.y_lims)
            pts = np.concatenate(
                [
                    world_to_pix(start, spec.x_lims, spec.y_lims, res),
                    world_to_pix(goal, spec.x_lims, spec.y_lims, res),
                ]
            )
            im = obstacles.make_map(family, rng, im_size, pts, patch_pts, patch_obs)
            sdf_np = np.asarray(
                sdf_ops.sdf_from_occupancy(jnp.asarray(im, jnp.float32), res=res)
            )
            # Batched expert plan.
            d = spec.state_dim
            startb = np.zeros((probs_per_env, d), np.float32)
            goalb = np.zeros((probs_per_env, d), np.float32)
            startb[:, :2], goalb[:, :2] = start, goal
            params = graph.default_params(
                spec, robot, jnp.asarray(startb), jnp.asarray(goalb),
                **cov_scalars, dtype=jnp.float32,
            )
            th0 = straight_line_traj(
                jnp.asarray(startb[:, :2]), jnp.asarray(goalb[:, :2]),
                spec.total_time_sec, spec.total_time_step,
            )
            if rrtstar_init:
                # RRT* seed via the native C++ expert planner (replaces the
                # reference's OMPL bridge, ompl_rrtstar.py + rrt_star_traj
                # in generate_2d_dataset.py:90-100).
                from dgpmp2_tpu import native
                from dgpmp2_tpu.utils.trajectory import path_to_traj_avg_vel

                seeds = []
                ok = True
                for j in range(probs_per_env):
                    path = native.rrt_star(
                        sdf_np, start[j], goal[j], spec.x_lims, spec.y_lims,
                        clearance=safety, plan_time=2.0,
                        seed=int(rng.integers(1 << 31)),
                    )
                    if path is None:
                        ok = False
                        break
                    interp = native.interpolate_path(path, spec.num_traj_states)
                    seeds.append(np.asarray(
                        path_to_traj_avg_vel(
                            jnp.asarray(interp), spec.total_time_sec
                        )
                    ))
                if not ok:
                    continue
                th0 = jnp.asarray(np.stack(seeds), jnp.float32)
            sdfb = jnp.broadcast_to(
                jnp.asarray(sdf_np, jnp.float32), (probs_per_env, im_size, im_size)
            )
            # Per-problem salvage: when only SOME problems of the env fail
            # collision re-validation, resample just those start/goal pairs
            # against the same map (feasibility-checked on its SDF) instead
            # of rejecting the whole env — whole-env rejection has
            # acceptance ~p^probs_per_env and exhausts retries on dense
            # families (forest).  Mirrors the reference's regenerate-and-
            # retry semantics (``generate_2d_dataset.py:247-265``) with a
            # tighter retry target.
            salvage_tries = 0 if rrtstar_init else 6
            ok = False
            for _salvage in range(salvage_tries + 1):
                result = plan_jit(params, th0, sdfb)
                th = np.asarray(result.best_th)
                # Collision re-validation: every state must clear the robot
                # radius (``generate_2d_dataset.py:247-253``).
                dists, _ = sdf_ops.bilinear_lookup(
                    sdfb, result.best_th[..., :2], res, spec.x_lims, spec.y_lims
                )
                bad = np.asarray(jnp.min(dists, axis=-1)) <= robot.sphere_radii[0]
                if not bad.any():
                    ok = True
                    break
                if _salvage == salvage_tries:
                    break
                # Resample the failing pairs, rejecting start/goals that are
                # themselves inside the safety margin of this (fixed) map.
                nb = int(bad.sum())
                for _feas in range(50):
                    s_new, g_new = sample_start_goal(
                        rng, nb, spec.x_lims, spec.y_lims
                    )
                    # Host-side nearest-pixel feasibility read (no device
                    # dispatch: jit would recompile per distinct nb).
                    pix = world_to_pix(
                        np.concatenate([s_new, g_new]), spec.x_lims,
                        spec.y_lims, res,
                    )
                    ij = np.clip(np.rint(pix).astype(int), 0, im_size - 1)
                    d_pts = sdf_np[ij[:, 1], ij[:, 0]]
                    if np.all(d_pts > safety + res):
                        break
                else:
                    break  # map too dense to place pairs: reject the env
                startb[bad, :2], goalb[bad, :2] = s_new, g_new
                startb[bad, 2:] = 0.0
                goalb[bad, 2:] = 0.0
                params = graph.default_params(
                    spec, robot, jnp.asarray(startb), jnp.asarray(goalb),
                    **cov_scalars, dtype=jnp.float32,
                )
                th0 = straight_line_traj(
                    jnp.asarray(startb[:, :2]), jnp.asarray(goalb[:, :2]),
                    spec.total_time_sec, spec.total_time_step,
                )
                start, goal = startb[:, :2], goalb[:, :2]
            if not ok:
                continue  # retry the whole env, like the reference's except
            ds.save_env(out_dir, env_idx, im, sdf_np)
            for j in range(probs_per_env):
                ds.save_problem(
                    out_dir, env_idx, j, label_subdir,
                    startb[j], goalb[j], th[j], np.asarray(th0[j]),
                )
            env_idx += 1
            break
        else:
            raise RuntimeError(
                f"could not generate a collision-free env after {max_env_retries} tries"
            )
    ds.save_meta(out_dir, num_envs, probs_per_env, im_size,
                 extra={"family": family,
                        "x_lims": list(spec.x_lims), "y_lims": list(spec.y_lims)})


def main(argv: Optional[list] = None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out_folder", type=str, required=True)
    p.add_argument("--dataset_type", type=str, default="forest",
                   choices=obstacles.FAMILIES)
    p.add_argument("--im_size", type=int, default=128)
    p.add_argument("--num_train", type=int, default=50)
    p.add_argument("--num_test", type=int, default=10)
    p.add_argument("--probs_per_env", type=int, default=1)
    p.add_argument("--seed_val", type=int, default=0)
    p.add_argument("--total_time_step", type=int, default=100)
    p.add_argument("--cost_sigma", type=float, default=0.05)
    p.add_argument("--epsilon_dist", type=float, default=0.4)
    p.add_argument("--max_iters", type=int, default=60)
    p.add_argument("--rrtstar_init", action="store_true",
                   help="seed the expert with native RRT* paths")
    args = p.parse_args(argv)

    spec = graph.GraphSpec(total_time_step=args.total_time_step)
    robot = PointRobot2D()
    cfg = gn.OptimConfig(reg=0.1, max_iters=args.max_iters)
    cov_scalars = dict(qc_inv=np.eye(2), cost_sigma=args.cost_sigma,
                       epsilon_dist=args.epsilon_dist, k_s=0.01, k_g=0.01)
    rng = np.random.default_rng(args.seed_val)
    out = os.path.abspath(args.out_folder)
    for mode, n in (("train", args.num_train), ("test", args.num_test)):
        if n > 0:
            generate_split(
                os.path.join(out, mode), n, args.probs_per_env,
                args.dataset_type, args.im_size, rng, spec, robot, cfg,
                cov_scalars, rrtstar_init=args.rrtstar_init,
            )
    print(f"dataset written to {out}")


if __name__ == "__main__":
    main()
