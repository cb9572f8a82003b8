"""Static-covariance sensitivity study.

Rebuild of ``diff_gpmp2/datasets/test_dataset_sensitivity.py``: sweep a set
of fixed ``cost_sigma`` values over a dataset, record solve-rate /
smoothness / collision metrics per sigma, and write
``sensitivity_results.yaml`` — the "best static baseline" that learned
covariances are compared against (``test_dataset_sensitivity.py:70-252,
270``; consumed by ``examples/report_stats_example.py:96-99``).

Unlike the reference (per-problem Python loop) each sigma evaluates as one
batched compiled plan.

    python -m dgpmp2_tpu.data.sensitivity --dataset_folders d \
        --out_file sensitivity_results.yaml
"""
from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np
import yaml

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.data import dataset as ds
from dgpmp2_tpu.learn.eval import evaluate_batch, summarize
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.trajectory import straight_line_traj

DEFAULT_SIGMAS = (0.01, 0.05, 0.1, 0.5, 1.0, 5.0, 10.0)


def run_sweep(dataset, idxs, spec, robot, cfg, sigmas=DEFAULT_SIGMAS,
              batch_size=16, epsilon_dist=0.4, k_sg=0.01):
    import jax

    plan_jit = jax.jit(
        lambda params, th0, sdfb: gn.plan(spec, robot, params, th0, sdfb, cfg).th
    )
    results = {}
    for sigma in sigmas:
        all_m = []
        for batch in ds.as_batches(dataset, idxs, batch_size):
            b = {k: jnp.asarray(v) for k, v in batch.items()}
            params = graph.default_params(
                spec, robot, b["start"], b["goal"],
                qc_inv=np.eye(spec.dof), cost_sigma=sigma,
                epsilon_dist=epsilon_dist, k_s=k_sg, k_g=k_sg,
                dtype=jnp.float32,
            )
            th0 = straight_line_traj(
                b["start"][:, : spec.dof], b["goal"][:, : spec.dof],
                spec.total_time_sec, spec.total_time_step,
            ).astype(jnp.float32)
            th = plan_jit(params, th0, b["sdf"])
            all_m.append(
                evaluate_batch(spec, robot, params, th, b.get("th_opt"), b["sdf"])
            )
        merged = {k: np.concatenate([m[k] for m in all_m]) for k in all_m[0]}
        results[float(sigma)] = summarize(merged)
    best = max(results, key=lambda s: results[s]["solve_rate"])
    return {"per_sigma": results, "best_sigma": best,
            "best": results[best]}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_folders", nargs="+", required=True)
    p.add_argument("--out_file", default="sensitivity_results.yaml")
    p.add_argument("--sigmas", nargs="+", type=float, default=list(DEFAULT_SIGMAS))
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--total_time_step", type=int, default=100)
    p.add_argument("--max_iters", type=int, default=60)
    p.add_argument("--mode", default="train")
    args = p.parse_args(argv)

    dataset = ds.PlanningDatasetMulti(args.dataset_folders, mode=args.mode)
    spec = graph.GraphSpec(total_time_step=args.total_time_step)
    cfg = gn.OptimConfig(reg=0.1, max_iters=args.max_iters)
    out = run_sweep(dataset, np.arange(len(dataset)), spec, PointRobot2D(),
                    cfg, tuple(args.sigmas), args.batch_size)
    with open(args.out_file, "w") as fp:
        yaml.safe_dump(out, fp)
    print(f"best sigma = {out['best_sigma']}: {out['best']}")
    return out

def plot_results(results_file: str, out_png: str = "sensitivity.png"):
    """Solve-rate-vs-sigma curve (``datasets/plot_results.py:8-18``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(results_file) as fp:
        data = yaml.safe_load(fp)
    per = data["per_sigma"]
    sigmas = sorted(float(s) for s in per)
    unsolved = [1.0 - per[s]["solve_rate"] for s in sigmas]
    fig, ax = plt.subplots()
    ax.plot(sigmas, unsolved, "-", marker="o")
    ax.set_xscale("log")
    ax.set_xlabel("cost_sigma")
    ax.set_ylabel("fraction unsolved")
    fig.savefig(out_png, bbox_inches="tight", dpi=110)
    return out_png


if __name__ == "__main__":
    main()
