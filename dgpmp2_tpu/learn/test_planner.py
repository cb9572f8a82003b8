"""Evaluation CLI: roll out a trained (or static) planner over a dataset.

Rebuild of ``diff_gpmp2/learning/test_planner.py run_validation``
(SURVEY.md §3.4): loads the persisted train/val split, rolls out the
planner, and writes the metric suite to a results YAML.  Runs batched
instead of the reference's per-env batch=1 loop.

    python -m dgpmp2_tpu.learn.test_planner --dataset_folders d \
        --model_folder runs/exp1 --out_file runs/exp1/results.yaml \
        --plan_param_file ... --robot_param_file ... --env_param_file ... \
        --learn_param_file ...

Omit ``--model_folder`` to evaluate the static-covariance planner.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.data import dataset as ds
from dgpmp2_tpu.learn import checkpoints
from dgpmp2_tpu.learn.eval import dump_results, evaluate_batch, summarize
from dgpmp2_tpu.learn.train import init_train_state, make_optimizer
from dgpmp2_tpu.learn.train_planner import build_planner
from dgpmp2_tpu.utils import config as config_lib
from dgpmp2_tpu.utils.trajectory import straight_line_traj


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_folders", nargs="+", required=True)
    p.add_argument("--model_folder", type=str, default=None)
    p.add_argument("--out_file", type=str, required=True)
    p.add_argument("--plan_param_file", required=True)
    p.add_argument("--robot_param_file", required=True)
    p.add_argument("--env_param_file", required=True)
    p.add_argument("--learn_param_file", required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--split", choices=("train", "valid", "all"), default="valid")
    p.add_argument("--mode", choices=("train", "test"), default="train")
    args = p.parse_args(argv)

    (env_data, planner_params, gp_params, obs_params, optim_params,
     robot_data, learn_params) = config_lib.load_params_learn(
        args.plan_param_file, args.robot_param_file, args.env_param_file,
        args.learn_param_file,
    )
    robot = config_lib.make_robot(robot_data)
    planner = build_planner(planner_params, env_data, optim_params,
                            learn_params, robot, gp_params, obs_params)
    spec = planner.spec

    dataset = ds.PlanningDatasetMulti(
        args.dataset_folders, mode=args.mode,
        label_subdir="opt_trajs_" + learn_params["data"].get("expert", "gpmp2"),
    )
    idxs = np.arange(len(dataset))
    split_file = (os.path.join(args.model_folder, "train_val_split.yaml")
                  if args.model_folder else None)
    if args.split != "all" and split_file and os.path.exists(split_file):
        with open(split_file) as fp:
            split = yaml.safe_load(fp)
        idxs = np.asarray(split["valid" if args.split == "valid" else "train"])

    cov_scalars = dict(
        qc_inv=np.asarray(gp_params["Q_c_inv"], np.float32),
        cost_sigma=float(obs_params["cost_sigma"]),
        epsilon_dist=float(obs_params["epsilon_dist"]),
        k_s=float(gp_params["K_s"]), k_g=float(gp_params["K_g"]),
    )

    variables = None
    if args.model_folder:
        sample = next(ds.as_batches(dataset, idxs, args.batch_size))
        sample = {k: jnp.asarray(v) for k, v in sample.items()}
        # The restore template must match the TRAINING optimizer's state
        # pytree (orbax restores by structure): build it from the run's
        # learn YAML exactly as train_planner does, not a hard-coded adam.
        opt = learn_params["optim"]
        tx = make_optimizer(opt.get("optimizer", "adam"), opt)
        im_stack = planner.stack_inputs(sample["im"], sample["sdf"])
        tmpl = init_train_state(planner, tx, jax.random.PRNGKey(0),
                                im_stack, sample["th_opt"])
        _, payload = checkpoints.restore(
            os.path.join(args.model_folder, "checkpoints"), {"state": tmpl}
        )
        variables = payload["state"].variables

    # Best non-colliding iterate by GP-MSE — the reference harness's
    # trajectory selection (``test_planner.py:253-262``), applied
    # symmetrically to the learned and static planners.
    plan_jit = jax.jit(
        lambda params, th0, sdfb: gn.plan(spec, robot, params, th0, sdfb,
                                          planner.cfg, track_best=True).best_th
    )
    all_m = []
    for batch in ds.as_batches(dataset, idxs, args.batch_size):
        b = {k: jnp.asarray(v) for k, v in batch.items()}
        params_fix = graph.default_params(
            spec, robot, b["start"], b["goal"], **cov_scalars, dtype=jnp.float32,
        )
        th0 = straight_line_traj(
            b["start"][:, : spec.dof], b["goal"][:, : spec.dof],
            spec.total_time_sec, spec.total_time_step,
        ).astype(jnp.float32)
        if variables is not None:
            th, _, _, _ = planner.plan(variables, params_fix, th0, b["sdf"],
                                       b["im"], track_best=True)
        else:
            th = plan_jit(params_fix, th0, b["sdf"])
        all_m.append(evaluate_batch(spec, robot, params_fix, th, b["th_opt"],
                                    b["sdf"]))

    merged = {k: np.concatenate([m[k] for m in all_m]) for k in all_m[0]}
    summary = summarize(merged)
    dump_results(args.out_file, summary)
    print(yaml.safe_dump(summary, default_flow_style=False))
    return summary


if __name__ == "__main__":
    main()
