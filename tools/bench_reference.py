#!/usr/bin/env python
"""Measure the actual PyTorch reference's batched GN-step wall time.

This is the "honesty row" from BASELINE.md's measurement plan: time the
reference's ``DiffGPMP2Planner.step`` (→ ``PlanLayer.forward``,
/root/reference/diff_gpmp2/gpmp2/plan_layer.py:87-234) at B ∈ {4, 64, 256,
1024} in its default float64 on CPU, on a 128×128 canned env, and report
per-GN-iteration milliseconds.  The same py3 shims as tools/make_golden.py
are used; /root/reference is never modified.

Run from the repo root:  python tools/bench_reference.py [--max-b 1024]
Prints one JSON line per batch size.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

plt.style.use = lambda *a, **k: None  # 'seaborn-paper' was removed upstream

import torch

torch.set_default_dtype(torch.float64)

try:
    torch.cholesky(torch.eye(2).unsqueeze(0), upper=True)
except (RuntimeError, AttributeError):
    def _chol(x, upper=False):
        l = torch.linalg.cholesky(x)
        return l.transpose(-1, -2) if upper else l

    torch.cholesky = _chol

_orig_masked_select = torch.masked_select
torch.masked_select = lambda inp, mask, **kw: _orig_masked_select(
    inp, mask.bool(), **kw
)
_orig_masked_scatter_ = torch.Tensor.masked_scatter_
torch.Tensor.masked_scatter_ = lambda self, mask, src: _orig_masked_scatter_(
    self, mask.bool(), src
)

import yaml  # noqa: E402

_orig_yaml_load = yaml.load
yaml.load = lambda stream, Loader=yaml.SafeLoader: _orig_yaml_load(stream, Loader)

from diff_gpmp2.gpmp2.diff_gpmp2_planner import DiffGPMP2Planner  # noqa: E402
from diff_gpmp2.robot_models import PointRobot2D  # noqa: E402
from diff_gpmp2.utils.helpers import load_params, rgb2gray  # noqa: E402
from diff_gpmp2.utils.sdf_utils import sdf_2d  # noqa: E402
from diff_gpmp2.utils.planner_utils import straight_line_trajb  # noqa: E402

REF = "/root/reference"


def time_batch(b, iters, planner_args, img, sdf, lims, planner_params, device):
    xlo, xhi, ylo, yhi = lims
    rng = np.random.default_rng(0)
    imb = torch.tensor(img)[None, None].expand(b, 1, *img.shape).contiguous()
    sdfb = torch.tensor(sdf)[None, None].expand(b, 1, *sdf.shape).contiguous()
    start_conf = torch.tensor(
        rng.uniform([xlo + 0.5, ylo + 0.5], [xlo + 1.5, ylo + 1.5], (b, 2))
    )
    goal_conf = torch.tensor(
        rng.uniform([xhi - 1.5, yhi - 1.5], [xhi - 0.5, yhi - 0.5], (b, 2))
    )
    zeros = torch.zeros(b, 2)
    startb = torch.cat((start_conf, zeros), dim=1).unsqueeze(1)
    goalb = torch.cat((goal_conf, zeros), dim=1).unsqueeze(1)
    th = straight_line_trajb(
        start_conf.unsqueeze(1),
        goal_conf.unsqueeze(1),
        planner_params["total_time_sec"],
        planner_params["total_time_step"],
        planner_params["dof"],
        device,
    )

    planner = DiffGPMP2Planner(*planner_args, batch_size=b)

    with torch.no_grad():
        # Warmup iteration (allocator, masks) excluded from timing.
        dtheta, _, err, _, _, _, _ = planner.step(th, startb, goalb, imb, sdfb)
        th = th + dtheta
        t0 = time.perf_counter()
        for _ in range(iters):
            dtheta, _, err, _, _, _, _ = planner.step(
                th, startb, goalb, imb, sdfb
            )
            th = th + dtheta
        dt = time.perf_counter() - t0
    assert np.isfinite(err.numpy()).all()
    return dt / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-b", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    device = torch.device("cpu")
    env_data, planner_params, gp_params, obs_params, optim_params, robot_data = (
        load_params(
            f"{REF}/examples/configs/gpmp2_2d_params.yaml",
            f"{REF}/examples/configs/robot_2d.yaml",
            f"{REF}/examples/configs/env_2d_params.yaml",
            device,
        )
    )
    env_params = {"x_lims": env_data["x_lims"], "y_lims": env_data["y_lims"]}
    xlo, xhi = env_params["x_lims"]
    ylo, yhi = env_params["y_lims"]

    img = plt.imread(f"{REF}/diff_gpmp2/env/simple_2d/12.png")  # 128×128
    if img.ndim > 2:
        img = rgb2gray(img)
    img = np.asarray(img, np.float64)
    cell = (xhi - xlo) / img.shape[0]
    sdf = np.asarray(sdf_2d(img, res=cell), np.float64)

    planner_args = (
        gp_params,
        obs_params,
        planner_params,
        optim_params,
        env_params,
        PointRobot2D(robot_data["sphere_radius"][0]),
    )

    for b in (4, 64, 256, 1024):
        if b > args.max_b:
            break
        iters = max(args.iters, 10 if b <= 64 else 3)
        ms = time_batch(
            b, iters, planner_args, img, sdf, (xlo, xhi, ylo, yhi),
            planner_params, device,
        )
        print(json.dumps({
            "impl": "reference_torch_cpu_f64",
            "batch": b,
            "ms_per_gn_iter": round(ms, 3),
            "ms_per_iter_per_problem": round(ms / b, 4),
            "threads": torch.get_num_threads(),
        }), flush=True)


if __name__ == "__main__":
    main()
