#!/usr/bin/env python
"""Extract numerical goldens from the actual PyTorch reference.

Runs the reference's batched GN step (``DiffGPMP2Planner.step`` →
``PlanLayer.forward``, /root/reference/diff_gpmp2/gpmp2/plan_layer.py:87-234)
in float64 on three canned ``simple_2d`` environments with the shipped
``gpmp2_2d_params.yaml`` config, and records per-iteration
``(th, dtheta, err, err_ext)`` to ``tests/goldens/golden_ref_step.npz``.

The reference is bit-rotted Python-2-era code (SURVEY.md §2.10); this
harness shims around that WITHOUT modifying /root/reference:
  * matplotlib 'seaborn-paper' style no longer exists → no-op plt.style.use
  * torch.cholesky is a deprecated alias → forwarded to torch.linalg
    if the stub raises.

Run from the repo root:  python tools/make_golden.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

_orig_style_use = plt.style.use
plt.style.use = lambda *a, **k: None  # 'seaborn-paper' was removed upstream

import torch

torch.set_default_dtype(torch.float64)

# torch.cholesky survives in 2.13 as a deprecated alias; if a future torch
# removes it, forward to linalg (upper=True semantics used by the batched
# solve at plan_layer.py:226).
try:
    torch.cholesky(torch.eye(2).unsqueeze(0), upper=True)
except (RuntimeError, AttributeError):
    def _chol(x, upper=False):
        l = torch.linalg.cholesky(x)
        return l.transpose(-1, -2) if upper else l

    torch.cholesky = _chol

# The reference builds uint8 (.byte()) masks (2019-era torch); modern
# masked_select/masked_scatter_ require bool masks.
_orig_masked_select = torch.masked_select
torch.masked_select = lambda inp, mask, **kw: _orig_masked_select(
    inp, mask.bool(), **kw
)
_orig_masked_scatter_ = torch.Tensor.masked_scatter_
torch.Tensor.masked_scatter_ = lambda self, mask, src: _orig_masked_scatter_(
    self, mask.bool(), src
)

import yaml  # noqa: E402

# pyyaml>=6 requires an explicit Loader; the reference calls yaml.load(fp).
_orig_yaml_load = yaml.load
yaml.load = lambda stream, Loader=yaml.SafeLoader: _orig_yaml_load(stream, Loader)

from diff_gpmp2.gpmp2.diff_gpmp2_planner import DiffGPMP2Planner  # noqa: E402
from diff_gpmp2.robot_models import PointRobot2D  # noqa: E402
from diff_gpmp2.utils.helpers import load_params, rgb2gray  # noqa: E402
from diff_gpmp2.utils.sdf_utils import sdf_2d  # noqa: E402
from diff_gpmp2.utils.planner_utils import straight_line_trajb  # noqa: E402

REF = "/root/reference"
ENVS = ["1", "5", "12"]
N_ITERS = 12


def main():
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

    # The canned envs differ in image size (201/200/128 px), so each runs as
    # its own batch of one; the npz stores per-env keys.
    payload = {
        "envs": np.array(ENVS),
        "total_time_sec": planner_params["total_time_sec"],
        "total_time_step": planner_params["total_time_step"],
        "x_lims": np.array(env_params["x_lims"], np.float64),
        "y_lims": np.array(env_params["y_lims"], np.float64),
        "sphere_radius": np.float64(robot_data["sphere_radius"][0]),
        "qc_inv": gp_params["Q_c_inv"].numpy(),
        "k_s": gp_params["K_s"].numpy(),
        "k_g": gp_params["K_g"].numpy(),
        "cost_sigma": np.float64(obs_params["cost_sigma"]),
        "epsilon_dist": np.float64(obs_params["epsilon_dist"]),
        "reg": np.float64(optim_params["reg"]),
    }
    xlo, xhi = env_params["x_lims"]
    ylo, yhi = env_params["y_lims"]

    for name in ENVS:
        img = plt.imread(f"{REF}/diff_gpmp2/env/simple_2d/{name}.png")
        if img.ndim > 2:
            img = rgb2gray(img)
        img = np.asarray(img, np.float64)
        cell = (xhi - xlo) / img.shape[0]
        sdf = np.asarray(sdf_2d(img, res=cell), np.float64)
        imb = torch.tensor(img)[None, None]
        sdfb = torch.tensor(sdf)[None, None]

        start_conf = torch.tensor([[xlo + 1.0, ylo + 1.0]])
        goal_conf = torch.tensor([[xhi - 1.0, yhi - 1.0]])
        zeros = torch.zeros(1, 2)
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

        planner = DiffGPMP2Planner(
            gp_params,
            obs_params,
            planner_params,
            optim_params,
            env_params,
            PointRobot2D(robot_data["sphere_radius"][0]),
            batch_size=1,
        )

        ths, dthetas, errs, err_exts = [th.numpy().copy()], [], [], []
        for _ in range(N_ITERS):
            dtheta, _, err, err_ext, _, _, _ = planner.step(
                th, startb, goalb, imb, sdfb
            )
            th = th + dtheta
            dthetas.append(dtheta.detach().numpy())
            errs.append(np.asarray(err.detach().numpy(), np.float64).reshape(-1))
            err_exts.append(
                np.asarray(err_ext.detach().numpy(), np.float64).reshape(-1)
            )
            ths.append(th.detach().numpy().copy())

        payload[f"im_{name}"] = img
        payload[f"sdf_{name}"] = sdf
        payload[f"start_{name}"] = startb.squeeze(1).numpy()
        payload[f"goal_{name}"] = goalb.squeeze(1).numpy()
        payload[f"th_{name}"] = np.stack(ths)
        payload[f"dtheta_{name}"] = np.stack(dthetas)
        payload[f"err_{name}"] = np.stack(errs)
        payload[f"err_ext_{name}"] = np.stack(err_exts)
        print(f"env {name}: err {errs[0]} -> {errs[-1]}")

        # Gradient golden: d(Σ th_K²)/d(th_0) through K unrolled GN steps —
        # the differentiable-planner property the paper is about (the same
        # autograd path TBPTT training uses; error_batch stays no_grad).
        k_grad = 3
        th_g = torch.tensor(payload[f"th_{name}"][0], requires_grad=True)
        sdf_g = sdfb.clone().requires_grad_(True)
        th_cur = th_g
        for _ in range(k_grad):
            dtheta, _, _, _, _, _, _ = planner.step(
                th_cur, startb, goalb, imb, sdf_g
            )
            th_cur = th_cur + dtheta
        loss = (th_cur ** 2).sum()
        loss.backward()
        payload[f"grad_th0_{name}"] = th_g.grad.numpy().copy()
        # d loss/d SDF exercises the bilinear-lookup adjoint (the custom
        # VJP path on the JAX side).
        payload[f"grad_sdf_{name}"] = sdf_g.grad.squeeze(1).numpy().copy()
        payload["grad_iters"] = np.int64(k_grad)
        print(f"env {name}: |grad_th0| {np.abs(th_g.grad.numpy()).sum():.4f} "
              f"|grad_sdf| {np.abs(sdf_g.grad.numpy()).sum():.4f}")

    out = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
    os.makedirs(out, exist_ok=True)
    np.savez_compressed(os.path.join(out, "golden_ref_step.npz"), **payload)
    print("wrote tests/goldens/golden_ref_step.npz")


if __name__ == "__main__":
    main()
