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
    # sdf_from_occupancy chunks the min-plus intermediate internally
    # (DGPMP2_EDT_CHUNK_MB budget), so one call is HBM-safe at any B.
    sdf = sdf_ops.sdf_from_occupancy(
        jnp.asarray(imgs), res=10.0 / IMSIZE
    ).astype(jnp.float32)
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


def timed(spec, robot, params, th0, sdf, iters, engine="stream"):
    cfg = gn.OptimConfig(reg=0.1, max_iters=iters, tol_delta=0.0,
                         engine=engine)
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


def main_sdf(batches):
    """SDF-construction throughput: occupancy images -> signed distance
    fields on device.  The output-chunked EDT (ops/sdf.py `_edt_1d_sq`)
    bounds the min-plus intermediate to DGPMP2_EDT_CHUNK_MB, so B=4096 at
    128² fits one core (dense form would need 34 GB)."""
    rng = np.random.default_rng(0)
    for b in batches:
        imgs = np.ones((b, IMSIZE, IMSIZE), np.float32)
        r = rng.integers(20, 90, (b, 2))
        for i in range(b):
            imgs[i, r[i, 0] : r[i, 0] + 20, r[i, 1] : r[i, 1] + 20] = 0.0
        fn = jax.jit(lambda im: sdf_ops.sdf_from_occupancy(im, res=10.0 / IMSIZE))
        x = jnp.asarray(imgs)
        out = fn(x)
        assert bool(jnp.all(jnp.isfinite(out)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        print(f"B={b:5d}: {best*1e3:8.1f} ms/batch  "
              f"{b/best:9.0f} sdf/s  ({best/b*1e6:.1f} us/image, {IMSIZE}²)")


VOX = 64  # 3-D world edge (voxels)


def build3d(b, t=100):
    from dgpmp2_tpu.robots import PointRobot3D

    rng = np.random.default_rng(0)
    spec = graph.GraphSpec(dof=3, state_dim=6, total_time_step=t,
                           z_lims=(-5.0, 5.0))
    robot = PointRobot3D()
    # Carve the box obstacles ON DEVICE from the (B, 3) corner array: a
    # host-built (B, 64^3) f32 occupancy is 1 GB at B=1024, and that
    # transfer over the tunneled backend dominates the whole benchmark
    # (it blew a 15-minute budget in round 5).  Same worlds, same RNG.
    r = jnp.asarray(rng.integers(10, VOX - 22, (b, 3)), jnp.int32)
    ax = jnp.arange(VOX, dtype=jnp.int32)

    @jax.jit
    def carve(r):
        inside = [
            (ax[None, :] >= r[:, d:d + 1]) & (ax[None, :] < r[:, d:d + 1] + 12)
            for d in range(3)
        ]
        box = (inside[0][:, :, None, None] & inside[1][:, None, :, None]
               & inside[2][:, None, None, :])
        return jnp.where(box, 0.0, 1.0).astype(jnp.float32)

    sdf = sdf_ops.sdf_from_occupancy_3d(
        carve(r), res=10.0 / VOX
    ).astype(jnp.float32)
    start = jnp.zeros((b, 6), jnp.float32).at[:, :3].set(
        jnp.asarray(rng.uniform(-4.5, -3.5, (b, 3)), jnp.float32))
    goal = jnp.zeros((b, 6), jnp.float32).at[:, :3].set(
        jnp.asarray(rng.uniform(3.5, 4.5, (b, 3)), jnp.float32))
    params = graph.default_params(
        spec, robot, start, goal, qc_inv=np.eye(3), cost_sigma=0.05,
        epsilon_dist=0.4, k_s=0.01, k_g=0.01, dtype=jnp.float32,
    )
    th0 = straight_line_traj(start[:, :3], goal[:, :3],
                             spec.total_time_sec, t)
    return spec, robot, params, th0, sdf


def main_plan3d(batches):
    """3-D plan-loop throughput (64³ voxel worlds, PointRobot3D, T=100).

    The 3-D hot path differs from 2-D only in the lookup (trilinear
    XLA gather vs the fused Pallas bilinear kernel) and the SDF residency
    (1 MB/f32 world at 64³ vs 65 kB at 128²)."""
    for b in batches:
        spec, robot, params, th0, sdf = build3d(b)
        lengths = [50, 500, 1000]
        times = [timed(spec, robot, params, th0, sdf, n) for n in lengths]
        xs, ys = np.asarray(lengths, float), np.asarray(times, float)
        per_iter = float(np.polyfit(xs, ys, 1)[0])
        print(f"B={b:5d}: {per_iter*1e3:7.3f} ms/iter  "
              f"{b/(per_iter*ITERS_PLAN):9.0f} plans/s  "
              f"({per_iter/b*1e6:.2f} us/iter/problem, {VOX}³ voxels)")


def main_sdf3d(batches):
    """3-D SDF-construction throughput: (B, 64³) occupancy -> voxel SDF.
    Three chunked min-plus passes ×2 fields; the chunk budget bounds the
    (…, n, n) intermediates exactly as in 2-D."""
    rng = np.random.default_rng(0)
    for b in batches:
        vox = np.ones((b, VOX, VOX, VOX), np.float32)
        r = rng.integers(10, VOX - 22, (b, 3))
        for i in range(b):
            vox[i, r[i, 0] : r[i, 0] + 12, r[i, 1] : r[i, 1] + 12,
                r[i, 2] : r[i, 2] + 12] = 0.0
        fn = jax.jit(
            lambda v: sdf_ops.sdf_from_occupancy_3d(v, res=10.0 / VOX))
        x = jnp.asarray(vox)
        out = fn(x)
        assert bool(jnp.all(jnp.isfinite(out)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        print(f"B={b:5d}: {best*1e3:8.1f} ms/batch  "
              f"{b/best:9.0f} sdf/s  ({best/b*1e6:.1f} us/grid, {VOX}³)")


def main_df32(batches):
    """The price of reference-grade steps on the f32 backend: ms/GN-iter
    for `OptimConfig(engine='df32')` (two-float assembly + block-Thomas
    solve, docs/F32_PRECISION.md §1b) next to the standard stream engine
    on the identical problem batch.  Same program-length-differencing
    methodology as the 2-D plan bench — the quoted "~15x elementwise
    flops" estimate becomes a measured column (VERDICT r4 item 5b)."""
    for b in batches:
        spec, robot, params, th0, sdf = build(b)
        lengths = [50, 500, 1000]
        per = {}
        for eng in ("stream", "df32"):
            times = [timed(spec, robot, params, th0, sdf, n, engine=eng)
                     for n in lengths]
            xs, ys = np.asarray(lengths, float), np.asarray(times, float)
            per[eng] = float(np.polyfit(xs, ys, 1)[0])
            print(f"B={b:5d} {eng:7s} {per[eng]*1e3:7.3f} ms/iter  "
                  f"({per[eng]/b*1e6:.2f} us/iter/problem)")
        print(f"B={b:5d} df32/stream cost ratio: "
              f"{per['df32']/per['stream']:.1f}x")


def main():
    if "--sdf" in sys.argv:
        sys.argv.remove("--sdf")
        main_sdf([int(a) for a in sys.argv[1:]] or [512, 2048, 4096])
        return
    if "--sdf3d" in sys.argv:
        sys.argv.remove("--sdf3d")
        main_sdf3d([int(a) for a in sys.argv[1:]] or [32, 128, 512])
        return
    if "--plan3d" in sys.argv:
        sys.argv.remove("--plan3d")
        main_plan3d([int(a) for a in sys.argv[1:]] or [128, 512, 1024])
        return
    if "--df32" in sys.argv:
        sys.argv.remove("--df32")
        main_df32([int(a) for a in sys.argv[1:]] or [1024])
        return
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
