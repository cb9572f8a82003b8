#!/usr/bin/env python
"""Batch-scaling throughput of the full GN plan loop on one chip.

Serving question: how many plans/second does one v5e sustain as the
problem batch grows?  Times the production plan loop (stream engine,
50 GN iterations per plan) at several batch sizes with the
program-length-differencing methodology from bench.py (the tunneled
backend adds a fixed ~30 ms per dispatch that must not be attributed
to the chip; see PERFORMANCE.md).

Usage: python benchmarks/bench_throughput.py [B ...]   (default sweep)
"""
import os
import sys
import time

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
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.trajectory import straight_line_traj

T, IMSIZE = 100, 128
ITERS_PLAN = 50  # GN iterations per plan (reference optim_params default)


def build(b):
    rng = np.random.default_rng(0)
    spec = graph.GraphSpec(total_time_step=T)
    robot = PointRobot2D()
    imgs = np.ones((b, IMSIZE, IMSIZE), np.float32)
    for i in range(b):
        r, c = rng.integers(20, 90, 2)
        imgs[i, r : r + 20, c : c + 20] = 0.0
    # The exact min-plus EDT materializes a (chunk, H, W, W) intermediate
    # (~8.4 MB/image at 128²) — chunk the batch so SDF construction never
    # dominates HBM (B=2048 unchunked needs 17 GB and OOMs a v5e).
    chunks = [
        sdf_ops.sdf_from_occupancy(jnp.asarray(imgs[i : i + 512]),
                                   res=10.0 / IMSIZE)
        for i in range(0, b, 512)
    ]
    sdf = jnp.concatenate(chunks, axis=0).astype(jnp.float32)
    start = jnp.zeros((b, 4), jnp.float32).at[:, :2].set(
        jnp.asarray(rng.uniform(-4.5, -3.5, (b, 2)), jnp.float32))
    goal = jnp.zeros((b, 4), jnp.float32).at[:, :2].set(
        jnp.asarray(rng.uniform(3.5, 4.5, (b, 2)), jnp.float32))
    params = graph.default_params(
        spec, robot, start, goal, qc_inv=np.eye(2), cost_sigma=0.05,
        epsilon_dist=0.4, k_s=0.01, k_g=0.01, dtype=jnp.float32,
    )
    th0 = straight_line_traj(start[:, :2], goal[:, :2],
                             spec.total_time_sec, T)
    return spec, robot, params, th0, sdf


def timed(spec, robot, params, th0, sdf, iters):
    cfg = gn.OptimConfig(reg=0.1, max_iters=iters, tol_delta=0.0,
                         engine="stream")
    run = jax.jit(
        lambda p, th, s: gn.plan(spec, robot, p, th, s, cfg, unroll=2).th
    )
    th = run(params, th0, sdf)
    assert bool(jnp.all(jnp.isfinite(th)))
    best = float("inf")
    for k in range(3):
        t0 = time.perf_counter()
        out = run(params, th + 1e-6 * k, sdf)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    batches = [int(a) for a in sys.argv[1:]] or [128, 512, 1024, 2048]
    for b in batches:
        spec, robot, params, th0, sdf = build(b)
        # Least-squares slope over three program lengths: a single pair is
        # noise-limited when the differenced interval (~tens of ms) is
        # comparable to RPC jitter on the tunneled backend.
        lengths = [50, 500, 1000]
        times = [timed(spec, robot, params, th0, sdf, n) for n in lengths]
        xs, ys = np.asarray(lengths, float), np.asarray(times, float)
        per_iter = float(np.polyfit(xs, ys, 1)[0])
        per_plan_ms = per_iter * ITERS_PLAN * 1e3
        plans_per_s = b / (per_iter * ITERS_PLAN)
        print(f"B={b:5d}: {per_iter*1e3:7.3f} ms/iter  "
              f"{per_plan_ms:7.1f} ms/{ITERS_PLAN}-iter-plan-batch  "
              f"{plans_per_s:9.0f} plans/s  "
              f"({per_iter/b*1e6:.2f} us/iter/problem)")


if __name__ == "__main__":
    main()
