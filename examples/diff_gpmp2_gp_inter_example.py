#!/usr/bin/env python
"""GP-interpolated dense collision checking — a capability the reference
only stubs (use_gp_inter/total_check_step plumbing, gpmp2_planner.py:29-41,
never implemented in factor evaluation).  A thin wall slips between support
states without interpolation; with it, binary interpolated obstacle factors
push the path through the gap."""
import numpy as np
import jax.numpy as jnp

from _common import load_configs, plot_plan, OUT_DIR

from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.planner import DiffGPMP2Planner
from dgpmp2_tpu.robots import make_robot
from dgpmp2_tpu.utils.trajectory import straight_line_traj

env_data, planner_params, gp_params, obs_params, optim_params, robot_data = load_configs()
planner_params = dict(planner_params, total_time_step=8, use_gp_inter=True,
                      total_check_step=48)
robot = make_robot(dict(robot_data, sphere_radius=[0.2]))
env_params = {"x_lims": env_data["x_lims"], "y_lims": env_data["y_lims"]}

imsize = 96
img = np.ones((imsize, imsize))
img[:, 46:50] = 0.0
img[44:52, 46:50] = 1.0  # small gap in a thin wall
res = 10.0 / imsize
sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(img, jnp.float32), res=res)

start = jnp.asarray([[-4.0, 0.3, 0.0, 0.0]], jnp.float32)
goal = jnp.asarray([[4.0, 0.3, 0.0, 0.0]], jnp.float32)
th0 = straight_line_traj(start[:, :2], goal[:, :2],
                         planner_params["total_time_sec"], 8)

def fine_clearance(th):
    t = np.linspace(0, 1, 300)
    seg = np.clip((t * 8).astype(int), 0, 7)
    frac = (t * 8 - seg)[:, None]
    pts = np.asarray(th[0])[seg, :2] * (1 - frac) + np.asarray(th[0])[seg + 1, :2] * frac
    d, _ = sdf_ops.bilinear_lookup(sdf[None], jnp.asarray(pts)[None], res,
                                   (-5.0, 5.0), (-5.0, 5.0))
    return float(jnp.min(d))

for use_inter in (False, True):
    pp = dict(planner_params, use_gp_inter=use_inter)
    planner = DiffGPMP2Planner(gp_params, dict(obs_params, epsilon_dist=0.3),
                               pp, optim_params, env_params, robot)
    r = planner.plan(th0, start, goal, sdf[None])
    print(f"use_gp_inter={use_inter}: err {float(r.err_init[0]):.3f} -> "
          f"{float(r.err_final[0]):.5f}; fine-grained min clearance = "
          f"{fine_clearance(r.th):.3f} m (robot radius 0.2)")
    if use_inter:
        plot_plan(img, th0[0], r.th[0], f"{OUT_DIR}/diff_gpmp2_gp_inter_example.png")
