#!/usr/bin/env python
"""3-D planner quality sweep: static sigma sensitivity + multistart
across the five voxel families (the 2-D campaign protocol of
``data/sensitivity.py`` / ``tools/multistart_sweep.py``, one dimension
up — no reference analog, the reference is planar).

Per family: generate a seeded test set (``data/generate3d.py`` worlds,
NO expert labels needed — judging is geometric), plan every problem from
the straight seed at each sigma, then compose the best sigma with
K-restart multistart, and report solve (margin-clear), contact-free, and
GP-smoothness rates as a committed markdown table.

Usage:
  python tools/plan3d_sweep.py --out runs/plan3d --envs 20 --probs 4
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("DGPMP2_CPU", "0") == "1":
    # The axon TPU plugin registers itself regardless of JAX_PLATFORMS;
    # only the config update actually pins the backend (see
    # examples/_common.py).
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(__file__), "..", ".jax_cache")),
)

import jax.numpy as jnp
import numpy as np
import yaml

from dgpmp2_tpu.core import gn, graph, multistart
from dgpmp2_tpu.data import obstacles3d
from dgpmp2_tpu.data.generate3d import sample_start_goal_3d, world_to_vox_zyx
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import PointRobot3D
from dgpmp2_tpu.utils.trajectory import straight_line_traj

LIMS = (-5.0, 5.0)
SIGMAS = (0.01, 0.02, 0.05, 0.1, 0.2)
EPS = 0.4


def make_problems(family, envs, probs, size, seed):
    """Voxel worlds + start/goal batches (feasibility-patched)."""
    rng = np.random.default_rng(seed)
    res = LIMS[1] * 2 / size
    robot = PointRobot3D()
    patch = int(np.ceil((EPS + 2 * robot.sphere_radii[0]) / res))
    sdfs, starts, goals = [], [], []
    for _ in range(envs):
        s, g = sample_start_goal_3d(rng, probs, LIMS)
        pts = world_to_vox_zyx(np.concatenate([s, g]), LIMS, res)
        vox = obstacles3d.make_map3d(family, rng, size, pts, patch, patch)
        sdf = np.asarray(sdf_ops.sdf_from_occupancy_3d(
            jnp.asarray(vox, jnp.float32), res=res), np.float32)
        for j in range(probs):
            sdfs.append(sdf)
            starts.append(s[j])
            goals.append(g[j])
    return (jnp.asarray(np.stack(sdfs)), np.stack(starts), np.stack(goals),
            res)


def judge(spec, robot, th, sdf, res):
    """Geometric judging: contact-free (radius-clear interior) and solve
    (clears radius + half the safety margin — the canonical-margin rule
    scaled to 3-D)."""
    d, _ = sdf_ops.trilinear_lookup(sdf, th[..., :3], res, LIMS, LIMS, LIMS)
    di = d[:, 1:-1]
    r = robot.sphere_radii[0]
    contact_free = np.asarray(jnp.min(di, axis=-1) > r)
    solve = np.asarray(jnp.min(di, axis=-1) > r + 0.5 * EPS)
    v = th[..., 3:]
    smooth = np.asarray(jnp.mean(jnp.sum(v**2, -1), -1))
    return solve, contact_free, smooth


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--envs", type=int, default=20)
    p.add_argument("--probs", type=int, default=4)
    p.add_argument("--size", type=int, default=48)
    p.add_argument("--t", type=int, default=30)
    p.add_argument("--restarts", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    robot = PointRobot3D()
    spec = graph.GraphSpec(dof=3, state_dim=6, total_time_step=args.t,
                           x_lims=LIMS, y_lims=LIMS, z_lims=LIMS)
    results = {}
    for family in obstacles3d.FAMILIES3D:
        sdfb, s, g, res = make_problems(family, args.envs, args.probs,
                                        args.size, args.seed)
        b = sdfb.shape[0]
        startb = np.zeros((b, 6), np.float32)
        goalb = np.zeros((b, 6), np.float32)
        startb[:, :3], goalb[:, :3] = s, g
        th0 = straight_line_traj(
            jnp.asarray(startb[:, :3]), jnp.asarray(goalb[:, :3]),
            spec.total_time_sec, args.t).astype(jnp.float32)
        fam_rows = {}
        best = None
        for sigma in SIGMAS:
            params = graph.default_params(
                spec, robot, jnp.asarray(startb), jnp.asarray(goalb),
                qc_inv=np.eye(3), cost_sigma=sigma, epsilon_dist=EPS,
                k_s=0.01, k_g=0.01, dtype=jnp.float32)
            cfg = gn.OptimConfig(reg=0.1, max_iters=50, method="lm")
            out = gn.plan(spec, robot, params, th0, sdfb, cfg,
                          track_best=True)
            solve, cf, sm = judge(spec, robot, out.best_th, sdfb, res)
            row = {"solve_rate": float(solve.mean()),
                   "contact_free_rate": float(cf.mean()),
                   "avg_vel_mse": float(sm.mean())}
            fam_rows[f"sigma_{sigma}"] = row
            print(f"[{family}] sigma={sigma}: solve={row['solve_rate']:.3f} "
                  f"cf={row['contact_free_rate']:.3f}", flush=True)
            if best is None or row["solve_rate"] > best[1]["solve_rate"]:
                best = (sigma, row, params, cfg)
        sigma_b, row_b, params_b, cfg_b = best
        ms = multistart.plan_multistart(
            spec, robot, params_b, th0, sdfb, cfg_b,
            jax.random.PRNGKey(args.seed), restarts=args.restarts, amp=2.0,
            prune_iters=10, keep=max(2, args.restarts // 4),
            select_margin=0.5 * EPS)
        solve, cf, sm = judge(spec, robot, ms.th, sdfb, res)
        fam_rows["best_static"] = dict(row_b, sigma=sigma_b)
        fam_rows[f"ms{args.restarts}"] = {
            "solve_rate": float(solve.mean()),
            "contact_free_rate": float(cf.mean()),
            "avg_vel_mse": float(sm.mean()), "sigma": sigma_b}
        print(f"[{family}] +ms{args.restarts} (sigma {sigma_b}): "
              f"solve={solve.mean():.3f} cf={cf.mean():.3f}", flush=True)
        results[family] = fam_rows

    with open(os.path.join(args.out, "results.yaml"), "w") as fp:
        yaml.safe_dump(results, fp)
    lines = [
        f"# 3-D planner sweep — {args.envs} envs x {args.probs} problems "
        f"per family, {args.size}³ voxels, T={args.t}, LM 50 iters",
        "",
        f"Regenerate: `python tools/plan3d_sweep.py --out {args.out} "
        f"--envs {args.envs} --probs {args.probs} --size {args.size} "
        f"--seed {args.seed}`",
        "",
        "| family | best static (sigma) | solve | contact-free | "
        f"+ms{args.restarts} solve | +ms contact-free |",
        "|---|---|---|---|---|---|",
    ]
    for fam, rows in results.items():
        bs = rows["best_static"]
        m = rows[f"ms{args.restarts}"]
        lines.append(
            f"| {fam} | {bs['sigma']} | {bs['solve_rate']:.3f} | "
            f"{bs['contact_free_rate']:.3f} | **{m['solve_rate']:.3f}** | "
            f"{m['contact_free_rate']:.3f} |")
    table = "\n".join(lines) + "\n"
    with open(os.path.join(args.out, "table.md"), "w") as fp:
        fp.write(table)
    print(table)


if __name__ == "__main__":
    main()
