"""YAML configuration loading — schema-compatible with the reference.

The reference drives everything from four YAML families loaded by
``diff_gpmp2/utils/helpers.py:9-59``: planner yaml (``gpmp2.{planner_params,
gp_params, obs_params, optim_params}``), robot yaml, env yaml, and learn
yaml.  These loaders accept the *same files* (e.g.
``examples/configs/gpmp2_2d_params.yaml``) so reference configs drop in,
but return plain Python/numpy values instead of torch tensors.
"""
from __future__ import annotations

import numpy as np
import yaml

from dgpmp2_tpu.core.gn import OptimConfig
from dgpmp2_tpu.core.graph import GraphSpec
from dgpmp2_tpu.robots import make_robot


def _load_yaml(path):
    with open(path, "r") as fp:
        return yaml.safe_load(fp)


def load_params(param_file, robot_file, env_file):
    """Load (env_data, planner_params, gp_params, obs_params, optim_params,
    robot_data) — same tuple order as ``helpers.load_params``."""
    planner_data = _load_yaml(param_file)
    env_data = _load_yaml(env_file)
    robot_data = _load_yaml(robot_file)

    planner_params = planner_data["gpmp2"]["planner_params"]
    gp_params = dict(planner_data["gpmp2"]["gp_params"])
    obs_params = dict(planner_data["gpmp2"]["obs_params"])
    optim_params = dict(planner_data["gpmp2"]["optim_params"])
    gp_params["Q_c_inv"] = np.asarray(gp_params["Q_c_inv"], np.float64)
    return env_data, planner_params, gp_params, obs_params, optim_params, robot_data


def load_params_learn(param_file, robot_file, env_file, learn_params_file):
    """Same as :func:`load_params` plus the learn-params dict
    (``helpers.load_params_learn``)."""
    out = load_params(param_file, robot_file, env_file)
    learn_params = _load_yaml(learn_params_file)
    return (*out, learn_params)


def spec_from_params(planner_params, env_data, robot) -> GraphSpec:
    # Extension key (not in the reference schema): enable the arm
    # self-collision factor; pairs come from the robot's chain geometry.
    self_pairs = ()
    if planner_params.get("use_self_collision", False):
        from dgpmp2_tpu.robots import self_collision_pairs

        self_pairs = self_collision_pairs(
            robot,
            eps_self=float(planner_params.get("self_collision_eps", 0.05)),
        )
    return GraphSpec(
        dof=int(planner_params["dof"]),
        state_dim=int(planner_params["state_dim"]),
        total_time_sec=float(planner_params["total_time_sec"]),
        total_time_step=int(planner_params["total_time_step"]),
        nlinks=robot.nlinks,
        x_lims=tuple(float(v) for v in env_data["x_lims"]),
        y_lims=tuple(float(v) for v in env_data["y_lims"]),
        # Extension key: a z_lims entry in the env YAML switches the
        # workspace to 3-D (voxel SDFs, trilinear lookup; the reference
        # schema is 2-D only).
        z_lims=(tuple(float(v) for v in env_data["z_lims"])
                if env_data.get("z_lims") is not None else None),
        non_holonomic=bool(planner_params.get("non_holonomic", False)),
        use_vel_limits=bool(planner_params.get("use_vel_limits", False)),
        use_gp_inter=bool(planner_params.get("use_gp_inter", False)),
        # Reference schema: total_check_step counts total collision checks;
        # checks per GP segment = total_check_step/total_time_step - 1
        # (gpmp2_planner.py:36).
        num_inter=max(
            1,
            int(planner_params.get("total_check_step",
                                   4 * int(planner_params["total_time_step"])))
            // int(planner_params["total_time_step"]) - 1,
        ) if planner_params.get("use_gp_inter", False) else 3,
        use_self_collision=bool(planner_params.get("use_self_collision",
                                                   False)),
        self_pairs=self_pairs,
        use_joint_limits=bool(planner_params.get("use_joint_limits", False)),
        use_workspace_goal=bool(planner_params.get("use_workspace_goal",
                                                   False)),
    )


def optim_from_params(optim_params) -> OptimConfig:
    max_iters = optim_params.get("max_iters", 100)
    if isinstance(max_iters, str):
        max_iters = 100 if max_iters == "inf" else int(float(max_iters))
    return OptimConfig(
        method=optim_params.get("method", "gauss_newton"),
        reg=float(optim_params.get("reg", 0.0)),
        max_iters=int(max_iters),
        tol_err=float(optim_params.get("tol_err", 1e-3)),
        tol_delta=float(optim_params.get("tol_delta", 1e-4)),
        engine=str(optim_params.get("engine", "auto")),
    )


def plan_time_budget(optim_params) -> float:
    v = optim_params.get("plan_time", "inf")
    return float(v) if not isinstance(v, str) else float(v)


__all__ = [
    "load_params",
    "load_params_learn",
    "spec_from_params",
    "optim_from_params",
    "plan_time_budget",
    "make_robot",
]
