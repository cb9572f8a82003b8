#!/usr/bin/env python
"""Ablation of the plan-loop GN iteration on the real TPU.

Times scan loops that contain progressively more of the iteration, so the
per-component contribution *in loop context* is visible (standalone
microbenchmarks mis-predict the composed cost — layout transitions and
pipelining change everything; see PERFORMANCE.md).

Stages:
  lookup    — SDF lookup (value+grad) only, th jittered per iter
  resid     — full factor-residual evaluation (lookup + GP + priors + hinge)
  assemble  — resid + stream-layout assembly (no solve)
  solve     — resid + assembly + streaming solve (no err traces)
  full      — the production plan loop (bench.py configuration)

Usage: python benchmarks/bench_plan_ablation.py [stage ...] [--chunk N]
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

B = 1024
T = 100
IMSIZE = 128
ITERS = 50


def build():
    from dgpmp2_tpu.core import graph
    from dgpmp2_tpu.ops import sdf as sdf_ops
    from dgpmp2_tpu.robots import PointRobot2D
    from dgpmp2_tpu.utils.trajectory import straight_line_traj

    rng = np.random.default_rng(0)
    spec = graph.GraphSpec(total_time_step=T)
    robot = PointRobot2D()
    imgs = np.ones((B, IMSIZE, IMSIZE), np.float32)
    for i in range(B):
        r, c = rng.integers(20, 90, 2)
        imgs[i, r : r + 20, c : c + 20] = 0.0
    res = 10.0 / IMSIZE
    sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(imgs), res=res).astype(
        jnp.float32
    )
    start = jnp.zeros((B, 4), jnp.float32).at[:, :2].set(
        jnp.asarray(rng.uniform(-4.5, -3.5, (B, 2)), jnp.float32)
    )
    goal = jnp.zeros((B, 4), jnp.float32).at[:, :2].set(
        jnp.asarray(rng.uniform(3.5, 4.5, (B, 2)), jnp.float32)
    )
    params = graph.default_params(
        spec, robot, start, goal, qc_inv=np.eye(2), cost_sigma=0.05,
        epsilon_dist=0.4, k_s=0.01, k_g=0.01, dtype=jnp.float32,
    )
    th0 = straight_line_traj(start[:, :2], goal[:, :2],
                             spec.total_time_sec, T)
    return spec, robot, params, th0, sdf


def timeit(fn, *args):
    out = fn(*args)
    s = float(jnp.sum(out))
    assert np.isfinite(s), "non-finite output"
    best = float("inf")
    for k in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3


def main3d(argv):
    """3-D decomposition (VERDICT r4 item 1): which stage owns the 3-D
    iteration cost — the trilinear lookup (the round-3 "lookup-bound"
    diagnosis) or the state_dim=6 residual/assembly/solve work?  Same
    loop-in-jit methodology; problem = bench_throughput.build3d
    (64³ voxels, PointRobot3D, T=100)."""
    from bench_throughput import build3d
    from dgpmp2_tpu.core import gn, graph
    from dgpmp2_tpu.ops import sdf as sdf_ops

    b = B
    for a in argv:
        if a.startswith("--b"):
            b = int(a.split("=")[1])
    stages = [a for a in argv if not a.startswith("--")] or [
        "lookup", "resid", "solve", "full"]

    spec, robot, params, th0, sdf = build3d(b)
    res = 10.0 / 64

    if "lookup" in stages:
        @jax.jit
        def loop_lookup(th, s):
            def body(i, carry):
                th_i = th + carry * 1e-9
                d, g = sdf_ops.lookup_nd(
                    s, th_i[..., :3], res, spec.x_lims, spec.y_lims,
                    spec.z_lims,
                )
                return jnp.sum(d) + jnp.sum(g)

            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        print(f"lookup: {timeit(loop_lookup, th0, sdf):.3f} ms/iter")

    if "resid" in stages:
        @jax.jit
        def loop_resid(th, s):
            def body(i, carry):
                th_i = th + carry * 1e-9
                r = graph.eval_residuals(spec, robot, params, th_i, s)
                return (jnp.sum(r.r_gp) + jnp.sum(r.r_obs)
                        + jnp.sum(r.h_obs) + jnp.sum(r.r_s))

            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        print(f"resid: {timeit(loop_resid, th0, sdf):.3f} ms/iter")

    if "solve" in stages:
        from dgpmp2_tpu.core import stream as stream_lib

        static = graph.assemble_static(spec, params, jnp.float32)
        ss = stream_lib.build_stream_static(
            spec, params, static, b, jnp.float32, reg=0.1
        )

        @jax.jit
        def loop_solve(th, s):
            def body(i, carry):
                th_i = th + carry * 1e-9
                r = graph.eval_residuals(spec, robot, params, th_i, s)
                dth = stream_lib.stream_step(spec, params, ss, r, 0.1)
                return jnp.sum(dth)

            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        print(f"solve: {timeit(loop_solve, th0, sdf):.3f} ms/iter")

    if "full" in stages:
        cfg = gn.OptimConfig(reg=0.1, max_iters=ITERS, tol_delta=0.0,
                             engine="stream")

        @jax.jit
        def run_full(p, th, s):
            return gn.plan(spec, robot, p, th, s, cfg, unroll=2).th

        print(f"full: {timeit(run_full, params, th0, sdf):.3f} ms/iter")


def main(argv):
    from dgpmp2_tpu.core import gn, graph
    from dgpmp2_tpu.core import stream as stream_lib
    from dgpmp2_tpu.ops import sdf as sdf_ops

    chunk = 16
    positional = []
    it = iter(argv)
    for a in it:
        if a.startswith("--chunk"):
            # accept both "--chunk=N" and "--chunk N"
            chunk = int(a.split("=")[1]) if "=" in a else int(next(it))
            stream_lib.CHUNK = chunk
        elif not a.startswith("--"):
            positional.append(a)
    stages = positional or ["lookup", "resid", "assemble", "solve", "full"]

    spec, robot, params, th0, sdf = build()
    res = 10.0 / IMSIZE

    if "lookup" in stages:
        @jax.jit
        def loop_lookup(th, s):
            def body(i, carry):
                th_i = th + carry * 1e-9
                d, g = sdf_ops.lookup(
                    s, th_i[..., :2], res, spec.x_lims, spec.y_lims
                )
                return jnp.sum(d) + jnp.sum(g)

            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        print(f"lookup: {timeit(loop_lookup, th0, sdf):.3f} ms/iter")

    if "resid" in stages:
        @jax.jit
        def loop_resid(th, s):
            def body(i, carry):
                th_i = th + carry * 1e-9
                r = graph.eval_residuals(spec, robot, params, th_i, s)
                return (jnp.sum(r.r_gp) + jnp.sum(r.r_obs) + jnp.sum(r.h_obs)
                        + jnp.sum(r.r_s))

            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        print(f"resid: {timeit(loop_resid, th0, sdf):.3f} ms/iter")

    if "assemble" in stages:
        static = graph.assemble_static(spec, params, jnp.float32)
        ss = stream_lib.build_stream_static(
            spec, params, static, B, jnp.float32, reg=0.1
        )

        @jax.jit
        def loop_asm(th, s):
            def body(i, carry):
                th_i = th + carry * 1e-9
                r = graph.eval_residuals(spec, robot, params, th_i, s)
                # assembly only: rebuild the stream rhs/diag adds
                r_gp_s = stream_lib.stream(r.r_gp, B)
                h_obs_s = stream_lib.stream(r.h_obs, B)
                r_obs_s = stream_lib.stream(r.r_obs, B)
                d_add, r_add = stream_lib._rows_gauss(
                    h_obs_s, ss.obs_w_s, r_obs_s, spec.nlinks, spec.state_dim
                )
                return jnp.sum(d_add) + jnp.sum(r_add) + jnp.sum(r_gp_s)

            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        print(f"assemble: {timeit(loop_asm, th0, sdf):.3f} ms/iter")

    if "solve" in stages:
        static = graph.assemble_static(spec, params, jnp.float32)
        ss = stream_lib.build_stream_static(
            spec, params, static, B, jnp.float32, reg=0.1
        )

        @jax.jit
        def loop_solve(th, s):
            def body(i, carry):
                th_i = th + carry * 1e-9
                r = graph.eval_residuals(spec, robot, params, th_i, s)
                dth = stream_lib.stream_step(spec, params, ss, r, 0.1)
                return jnp.sum(dth)

            return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0))

        print(f"solve: {timeit(loop_solve, th0, sdf):.3f} ms/iter")

    if "full" in stages:
        cfg = gn.OptimConfig(reg=0.1, max_iters=ITERS, tol_delta=0.0,
                             engine="stream")

        @jax.jit
        def run_full(p, th, s):
            return gn.plan(spec, robot, p, th, s, cfg, unroll=4).th

        print(f"full: {timeit(run_full, params, th0, sdf):.3f} ms/iter"
              f" (chunk={chunk})")


if __name__ == "__main__":
    argv = sys.argv[1:]
    if "--plan3d" in argv:
        argv.remove("--plan3d")
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        main3d(argv)
    else:
        main(argv)
