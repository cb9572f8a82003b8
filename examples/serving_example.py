#!/usr/bin/env python
"""Serving demo: concurrent clients through the micro-batching service.

No reference counterpart (the reference has no serving story — its entry
points are offline scripts); this demonstrates the deployment front end:
eight clients submit planning problems concurrently, the dispatcher
coalesces them into fixed-shape device batches (two dispatches of four),
and every client gets back the same trajectory a direct batched
``planner.plan`` call would have produced.
"""
import asyncio
import time

import jax.numpy as jnp
import numpy as np

from _common import box_world, load_configs, OUT_DIR

from dgpmp2_tpu.planner import DiffGPMP2Planner
from dgpmp2_tpu.robots import make_robot
from dgpmp2_tpu.serve import PlanningService, PlanRequest

env_data, planner_params, gp_params, obs_params, optim_params, robot_data = load_configs()
planner_params = dict(planner_params, total_time_step=30)
robot = make_robot(robot_data)
img, sdf, res = box_world()
sdf = np.asarray(sdf, np.float32)

planner = DiffGPMP2Planner(
    gp_params, obs_params, planner_params, optim_params,
    {"x_lims": env_data["x_lims"], "y_lims": env_data["y_lims"]}, robot,
)

svc = PlanningService(planner, batch_size=4, window_ms=50.0)
print("compiling the serving program ...")
t0 = time.time()
svc.warmup(sdf.shape)
print(f"compiled in {time.time() - t0:.1f}s")

rng = np.random.default_rng(0)


def request(i):
    s = np.array([-4.0, -4.0, 0.0, 0.0], np.float32)
    g = np.array([4.0, 4.0, 0.0, 0.0], np.float32)
    s[:2] += rng.uniform(-0.4, 0.4, 2)
    g[:2] += rng.uniform(-0.4, 0.4, 2)
    return PlanRequest(start=s, goal=g, sdf=sdf)


async def main():
    await svc.start()
    try:
        responses = await asyncio.gather(
            *(svc.submit(request(i)) for i in range(8))
        )
    finally:
        await svc.stop()
    for i, r in enumerate(responses):
        print(f"client {i}: err {r.err_init:9.3f} -> {r.err_final:.5f}  "
              f"iters {r.iters}  fill {r.batch_fill:.2f}  "
              f"latency {r.latency_s * 1e3:6.1f} ms")
    print(f"dispatches: {svc.stats['batches']}  "
          f"(8 requests coalesced into batches of {svc.batch_size})")
    assert svc.stats["batches"] == 2
    assert all(np.isfinite(r.err_final) for r in responses)


asyncio.run(main())
print("ok")
