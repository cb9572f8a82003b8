#!/usr/bin/env python
"""Multi-start cost: full (K·B) pool vs staged pruning, on TPU f32.

Staged pruning (`core/multistart.plan_multistart(prune_iters, keep)`) plans
all K seeds for a few iterations and finishes only the best `keep` per
problem.  This measures the actual wall-clock ratio at production scale and
checks that the pruned run keeps the full pool's contact-free coverage.

Timing follows PERFORMANCE.md methodology: each variant is a single
compiled `fori_loop` program (utils/profiling.time_compiled) so the
tunneled backend's ~30 ms fixed dispatch overhead amortizes out.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(__file__), "..", ".jax_cache")),
)

import jax.numpy as jnp
import numpy as np

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.core.multistart import plan_multistart
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.profiling import time_compiled
from dgpmp2_tpu.utils.trajectory import straight_line_traj


def build(b, t, imsize, dtype):
    rng = np.random.default_rng(0)
    spec = graph.GraphSpec(total_time_step=t)
    robot = PointRobot2D()
    imgs = np.ones((b, imsize, imsize), np.float32)
    for i in range(b):
        for _ in range(24):  # forest-like clutter: the multi-start regime
            cy, cx = rng.integers(12, imsize - 16, 2)
            s = rng.integers(3, 7)
            imgs[i, cy:cy + s, cx:cx + s] = 0.0
    sdf = sdf_ops.sdf_from_occupancy(
        jnp.asarray(imgs), res=10.0 / imsize
    ).astype(dtype)
    start = jnp.zeros((b, 4), dtype).at[:, :2].set(
        jnp.asarray(rng.uniform(-4.5, -3.5, (b, 2)), dtype))
    goal = jnp.zeros((b, 4), dtype).at[:, :2].set(
        jnp.asarray(rng.uniform(3.5, 4.5, (b, 2)), dtype))
    params = graph.default_params(
        spec, robot, start, goal, qc_inv=np.eye(2), cost_sigma=0.05,
        epsilon_dist=0.4, k_s=0.01, k_g=0.01, dtype=dtype,
    )
    th0 = straight_line_traj(start[:, :2], goal[:, :2],
                             spec.total_time_sec, t).astype(dtype)
    return spec, robot, params, th0, sdf


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--b", type=int, default=256)
    p.add_argument("--t", type=int, default=100)
    p.add_argument("--restarts", type=int, default=16)
    p.add_argument("--keep", type=int, default=4)
    p.add_argument("--prune_iters", type=int, default=10)
    p.add_argument("--max_iters", type=int, default=50)
    p.add_argument("--amp", type=float, default=2.0)
    p.add_argument("--loop_iters", type=int, default=8)
    args = p.parse_args(argv)

    dtype = jnp.float32
    spec, robot, params, th0, sdf = build(args.b, args.t, 128, dtype)
    cfg = gn.OptimConfig(reg=0.1, max_iters=args.max_iters)

    def make_step(prune_iters, keep):
        def step(carry):
            i, _ = carry
            out = plan_multistart(
                spec, robot, params, th0, sdf, cfg,
                jax.random.fold_in(jax.random.PRNGKey(0), i),
                restarts=args.restarts, amp=args.amp,
                prune_iters=prune_iters, keep=keep,
            )
            return (i + 1, out.th)
        return step

    rows = {}
    for name, (pi, kp) in {
        "full": (0, 0),
        "staged": (args.prune_iters, args.keep),
    }.items():
        ms = time_compiled(lambda c: make_step(pi, kp)(c),
                           (jnp.int32(0), th0), iters=args.loop_iters)
        out = jax.jit(
            lambda: plan_multistart(
                spec, robot, params, th0, sdf, cfg, jax.random.PRNGKey(0),
                restarts=args.restarts, amp=args.amp, prune_iters=pi,
                keep=kp,
            )
        )()
        cf = int(jnp.sum(out.contact_free))
        assert bool(jnp.all(jnp.isfinite(out.th)))
        rows[name] = {"ms_per_plan_batch": round(ms, 3),
                      "contact_free": cf}
        print(f"{name:7s} K={args.restarts} "
              f"{'keep=' + str(kp) + ' p=' + str(pi) if kp else '(no prune)':14s}"
              f" {ms:8.2f} ms/batch  contact_free {cf}/{args.b}",
              flush=True)

    speedup = rows["full"]["ms_per_plan_batch"] / rows["staged"][
        "ms_per_plan_batch"]
    print(json.dumps({
        "metric": "multistart_staged_speedup",
        "value": round(speedup, 3), "unit": "x",
        "b": args.b, "restarts": args.restarts, "keep": args.keep,
        "prune_iters": args.prune_iters, "max_iters": args.max_iters,
        "full": rows["full"], "staged": rows["staged"],
    }))


if __name__ == "__main__":
    main()
