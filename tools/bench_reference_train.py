#!/usr/bin/env python
"""Measure the PyTorch reference's TBPTT learned-training step wall time.

The training honesty row (VERDICT r3 item 7): BASELINE.md measures the
reference's *planning* step; this measures its *learned training* step —
the TBPTT inner loop of ``/root/reference/diff_gpmp2/learning/
train_planner.py:297-402``: ``tk`` gradient-enabled ``planner.step`` calls
(conv encoder + FCN head + PlanLayer solve) with the per-step
``one_step_loss`` accumulated (``use_inter_loss`` semantics,
``train_planner.py:75-120``), one ``backward()`` through the window, one
Adam step.  Reference defaults: float64, CPU, feed-forward head,
``dynamics_mode='diag_identity'``.

The comparable framework number is ``tools/bench_train.py`` (the jitted
``make_train_step`` at the same window on the v5e).  Both report
**ms per gradient-carrying GN step per problem** = wall / (tk · B) — the
unit that normalizes away window-length choices.

Run from the repo root:  python tools/bench_reference_train.py [--max-b 128]
Prints one JSON line per batch size.  /root/reference is never modified;
the same py3 shims as tools/bench_reference.py apply (plus int-division
shims for the learning modules' py2 arithmetic).
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/reference")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

plt.style.use = lambda *a, **k: None

import torch
import torch.nn as nn

torch.set_default_dtype(torch.float64)

# -- py3 shims (the reference targets 2019-era torch / python 2) ------------
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
# learn_module_fcn.py builds layer sizes with py2 `/` (floats in py3).
_orig_linear = nn.Linear


class _IntLinear(_orig_linear):
    def __init__(self, in_f, out_f, *a, **k):
        super().__init__(int(in_f), int(out_f), *a, **k)


nn.Linear = _IntLinear
if not hasattr(nn.init, "xavier_uniform"):
    nn.init.xavier_uniform = nn.init.xavier_uniform_

import yaml  # noqa: E402

_orig_yaml_load = yaml.load
yaml.load = lambda stream, Loader=yaml.SafeLoader: _orig_yaml_load(
    stream, Loader)

from diff_gpmp2.gpmp2.diff_gpmp2_planner import DiffGPMP2Planner  # noqa: E402
from diff_gpmp2.robot_models import PointRobot2D  # noqa: E402
from diff_gpmp2.utils.helpers import load_params, rgb2gray  # noqa: E402
from diff_gpmp2.utils.sdf_utils import sdf_2d  # noqa: E402
from diff_gpmp2.utils.planner_utils import straight_line_trajb  # noqa: E402

REF = "/root/reference"
TK = 5  # gradient window (tk = tk2 = T: one backward per batch)


def one_step_loss(dtheta, th_delta_opt, err_sg, err_gp, err_obs):
    """train_planner.py:75-120 with the shipped-script weights: MSE to the
    expert delta (pos + 0.1·vel) + 0.1·(gp + sg + obs) external terms."""
    pos = (dtheta[..., :2] - th_delta_opt[..., :2]).pow(2).mean()
    vel = (dtheta[..., 2:] - th_delta_opt[..., 2:]).pow(2).mean()
    ext = err_gp.mean() + err_sg.mean() + 1.0 * err_obs.mean()
    return pos + 0.1 * vel + 0.1 * ext


def time_train_batch(b, windows, planner_args, learn_params, img, sdf, lims,
                     planner_params):
    xlo, xhi, ylo, yhi = lims
    rng = np.random.default_rng(0)
    device = torch.device("cpu")
    imb = torch.tensor(img)[None, None].expand(b, 1, *img.shape).contiguous()
    sdfb = torch.tensor(sdf)[None, None].expand(b, 1, *sdf.shape).contiguous()
    start_conf = torch.tensor(
        rng.uniform([xlo + 0.5, ylo + 0.5], [xlo + 1.5, ylo + 1.5], (b, 2)))
    goal_conf = torch.tensor(
        rng.uniform([xhi - 1.5, yhi - 1.5], [xhi - 0.5, yhi - 0.5], (b, 2)))
    zeros = torch.zeros(b, 2)
    startb = torch.cat((start_conf, zeros), dim=1).unsqueeze(1)
    goalb = torch.cat((goal_conf, zeros), dim=1).unsqueeze(1)
    th_init = straight_line_trajb(
        start_conf.unsqueeze(1), goal_conf.unsqueeze(1),
        planner_params["total_time_sec"], planner_params["total_time_step"],
        planner_params["dof"], device,
    )
    # A synthetic expert label suffices for timing (same flop count).
    th_opt = th_init + 0.1 * torch.randn_like(th_init)

    planner = DiffGPMP2Planner(*planner_args, learn_params=learn_params,
                               batch_size=b)
    planner.train()
    optimizer = torch.optim.Adam(planner.parameters(), lr=1e-4)

    def train_step():
        optimizer.zero_grad()
        th = th_init.detach().requires_grad_(True)
        loss = torch.tensor(0.0)
        for _ in range(TK):
            dtheta, _, _, _, _, _, _ = planner.step(
                th, startb, goalb, imb, sdfb, None, torch.zeros_like(th))
            th_new = th + dtheta
            err_sg, err_gp, err_obs = planner.unweighted_errors_batch(
                th_new, sdfb)
            loss = loss + one_step_loss(dtheta, th_opt - th, err_sg, err_gp,
                                        err_obs)
            th = th_new
        loss.backward()
        optimizer.step()
        return loss

    loss = train_step()  # warmup (allocator, masks, autograd graph)
    assert np.isfinite(float(loss))
    t0 = time.perf_counter()
    for _ in range(windows):
        train_step()
    dt = (time.perf_counter() - t0) / windows
    return dt * 1e3  # ms per train window


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-b", type=int, default=128)
    ap.add_argument("--windows", type=int, default=2)
    args = ap.parse_args()

    (env_data, planner_params, gp_params, obs_params, optim_params,
     robot_data) = load_params(
        f"{REF}/examples/configs/gpmp2_2d_params.yaml",
        f"{REF}/examples/configs/robot_2d.yaml",
        f"{REF}/examples/configs/env_2d_params.yaml",
        torch.device("cpu"),
    )
    env_params = {"x_lims": env_data["x_lims"], "y_lims": env_data["y_lims"]}
    xlo, xhi = env_params["x_lims"]
    ylo, yhi = env_params["y_lims"]

    img = plt.imread(f"{REF}/diff_gpmp2/env/simple_2d/12.png")
    if img.ndim > 2:
        img = rgb2gray(img)
    img = np.asarray(img, np.float64)
    cell = (xhi - xlo) / img.shape[0]
    sdf = np.asarray(sdf_2d(img, padlen=0, res=cell), np.float64)

    # Learn-yaml schema reconstructed per SURVEY.md §5.6 (the reference
    # ships no example learn yaml); diag_identity + learned eps off, the
    # shipped-script configuration closest to the framework's campaigns.
    learn_params = {
        "model": {"type": "feed_forward", "dropout_prob": 0.5},
        "im_size": img.shape[0],  # LearnModuleConv reads the flat key
        "data": {"im_size": img.shape[0]},
        "dgpmp2": {"dynamics_mode": "diag_identity", "learn_eps": False,
                   "sdf_predict": True, "dtheta_predict": False,
                   "fixed_conv": False, "use_inter_loss": True},
        "optim": {"vel_loss_lambda": 0.1, "ext_obs_lambda": 1.0,
                  "ext_loss_weight": 0.1},
    }

    planner_args = (
        gp_params, obs_params, planner_params, optim_params, env_params,
        PointRobot2D(robot_data["sphere_radius"][0]),
    )

    for b in (4, 16, 64, 128):
        if b > args.max_b:
            break
        ms = time_train_batch(
            b, args.windows, planner_args, dict(learn_params), img, sdf,
            (xlo, xhi, ylo, yhi), planner_params,
        )
        print(json.dumps({
            "impl": "reference_torch_cpu_f64_train",
            "batch": b,
            "tk": TK,
            "ms_per_train_window": round(ms, 2),
            "ms_per_grad_gn_step_per_problem": round(ms / TK / b, 4),
            "threads": torch.get_num_threads(),
        }), flush=True)


if __name__ == "__main__":
    main()
