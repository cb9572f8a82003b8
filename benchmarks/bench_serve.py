#!/usr/bin/env python
"""Serving-layer latency/throughput under concurrent load (one chip).

Drives `dgpmp2_tpu.serve.PlanningService` the way a deployment would:
many independent clients `submit()` one planning problem each; the
dispatcher coalesces them into fixed-shape device batches.  Reports, per
offered concurrency level, the achieved plans/s and the client-observed
p50/p99 latency (queue wait + coalescing window + device execution).

On the tunneled v5e each dispatch carries ~30 ms fixed overhead
(PERFORMANCE.md), so the interesting quantity is how quickly coalescing
amortizes it: concurrency 1 pays the full dispatch per plan; concurrency
≥ batch_size approaches the full-batch throughput of
benchmarks/bench_throughput.py.

Usage: python benchmarks/bench_serve.py [--batch 256] [--t 100]
       [--levels 1 8 64 256] [--rounds 3]
"""
import argparse
import asyncio
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

from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.planner import DiffGPMP2Planner
from dgpmp2_tpu.robots import make_robot
from dgpmp2_tpu.serve import PlanningService, PlanRequest
from dgpmp2_tpu.utils.config import load_params

CFG = os.path.join(os.path.dirname(__file__), "..", "dgpmp2_tpu", "configs")
IMSIZE = 128


def make_planner(t, max_iters):
    env, pp, gp, obs, opt, robot_data = load_params(
        os.path.join(CFG, "gpmp2_2d_params.yaml"),
        os.path.join(CFG, "robot_2d.yaml"),
        os.path.join(CFG, "env_2d_params.yaml"),
    )
    pp = dict(pp, total_time_step=t)
    opt = dict(opt, max_iters=max_iters)
    robot = make_robot(robot_data)
    return DiffGPMP2Planner(
        gp, obs, pp, opt,
        {"x_lims": env["x_lims"], "y_lims": env["y_lims"]},
        robot, dtype=jnp.float32,
    )


def make_world():
    img = np.ones((IMSIZE, IMSIZE), np.float32)
    img[40:70, 50:80] = 0.0
    return np.asarray(
        sdf_ops.sdf_from_occupancy(jnp.asarray(img), res=10.0 / IMSIZE)
    )


def make_requests(world, n, seed, inline_sdf=False):
    rng = np.random.default_rng(seed)
    reqs = []
    for _ in range(n):
        s = np.array([-4.0, -4.0, 0.0, 0.0], np.float32)
        g = np.array([4.0, 4.0, 0.0, 0.0], np.float32)
        s[:2] += rng.uniform(-0.5, 0.5, 2)
        g[:2] += rng.uniform(-0.5, 0.5, 2)
        if inline_sdf:
            reqs.append(PlanRequest(start=s, goal=g, sdf=world))
        else:
            reqs.append(PlanRequest(start=s, goal=g, world="bench"))
    return reqs


async def run_level(svc, world, concurrency, rounds, seed,
                    inline_sdf=False):
    lat = []
    t0 = time.perf_counter()
    total = 0
    for r in range(rounds):
        reqs = make_requests(world, concurrency, seed + r, inline_sdf)
        responses = await asyncio.gather(*(svc.submit(q) for q in reqs))
        lat += [resp.latency_s for resp in responses]
        total += len(responses)
        if not all(np.isfinite(resp.err_final) for resp in responses):
            raise RuntimeError("non-finite plan in serving bench")
    wall = time.perf_counter() - t0
    lat = np.sort(np.asarray(lat))
    return {
        "concurrency": concurrency,
        "plans_per_s": total / wall,
        "p50_ms": float(lat[len(lat) // 2] * 1e3),
        "p99_ms": float(lat[int(len(lat) * 0.99)] * 1e3),
    }


def make_multistart_adapter(args):
    """Production multistart serving path (optionally RRT*-seeded) — the
    `MultistartPlanningAdapter` wrapped by the same service.  Covariances
    are the campaign defaults (tools/learned_campaign.COV); the RRT*
    expert runs host-side per dispatch (core/seeds.py — the reference's
    RRT*->GPMP2 recipe, examples/rrt_star_example.py, as a serving-time
    input)."""
    from dgpmp2_tpu.core import gn, graph
    from dgpmp2_tpu.robots import PointRobot2D
    from dgpmp2_tpu.serve import MultistartPlanningAdapter

    spec = graph.GraphSpec(total_time_step=args.t)
    cov = dict(qc_inv=np.eye(2), cost_sigma=0.05, epsilon_dist=0.4,
               k_s=0.01, k_g=0.01)
    return MultistartPlanningAdapter(
        spec, PointRobot2D(), cov,
        optim_cfg=gn.OptimConfig(reg=0.1, max_iters=args.iters,
                                 method="lm"),
        restarts=args.multistart, amp=2.0,
        prune_iters=args.prune_iters, keep=args.keep,
        rrt_seeds=args.rrt_seeds, rrt_plan_time=args.rrt_plan_time,
    )


async def amain(args):
    if args.multistart:
        planner = make_multistart_adapter(args)
    else:
        planner = make_planner(args.t, args.iters)
    svc = PlanningService(planner, batch_size=args.batch,
                          window_ms=args.window_ms)
    world = make_world()
    print(f"compile: batch={args.batch} T={args.t} iters={args.iters} ...",
          flush=True)
    t0 = time.perf_counter()
    svc.warmup((IMSIZE, IMSIZE))
    print(f"compiled in {time.perf_counter() - t0:.1f}s", flush=True)

    svc.register_world("bench", world)
    await svc.start()
    try:
        # warm the dispatch path once
        await run_level(svc, world, min(8, args.batch), 1, 999,
                        args.inline_sdf)
        rows = []
        for level in args.levels:
            row = await run_level(svc, world, level, args.rounds, 42,
                                  args.inline_sdf)
            rows.append(row)
            print(f"concurrency {level:5d}: {row['plans_per_s']:10.1f} "
                  f"plans/s  p50 {row['p50_ms']:7.1f} ms  "
                  f"p99 {row['p99_ms']:7.1f} ms", flush=True)
    finally:
        await svc.stop()
    print({"batches": svc.stats["batches"],
           "padded_rows": svc.stats["padded_rows"],
           "requests": svc.stats["requests"]})


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--t", type=int, default=100)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--window_ms", type=float, default=5.0)
    p.add_argument("--levels", nargs="+", type=int,
                   default=[1, 8, 64, 256])
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--inline_sdf", action="store_true",
                   help="ship the SDF with every request instead of the "
                        "device-resident world cache (measures the "
                        "per-request upload cost)")
    p.add_argument("--multistart", type=int, default=0, metavar="K",
                   help="serve through MultistartPlanningAdapter with K "
                        "restarts instead of the straight-seed planner")
    p.add_argument("--prune_iters", type=int, default=0)
    p.add_argument("--keep", type=int, default=0)
    p.add_argument("--rrt_seeds", type=int, default=0,
                   help="host-side RRT* seeds appended per problem "
                        "(requires --multistart)")
    p.add_argument("--rrt_plan_time", type=float, default=0.05,
                   help="per-problem RRT* budget (s, host wall-clock; "
                        "runs sequentially over the dispatch batch, so "
                        "budget*batch bounds the added latency)")
    args = p.parse_args()
    if args.rrt_seeds and not args.multistart:
        p.error("--rrt_seeds requires --multistart")
    asyncio.run(amain(args))


if __name__ == "__main__":
    main()
