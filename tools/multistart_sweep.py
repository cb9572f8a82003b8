#!/usr/bin/env python
"""Multi-start vs straight-seed static planning across all five families.

Adds the ``plan_multistart`` row to the generalist comparison
(PERFORMANCE.md): for each family's held-out test split, sweep the nine
static sigmas with K perturbed seeds per problem and report the best row
per family under both selection keys (solve_rate-first and
contact_free-first), next to the straight-seed static best from the
campaign's sensitivity sweep.

Usage:
  python tools/multistart_sweep.py --data_root runs/campaign_all5 \
      --families multi_obs forest passage tar_pit mixed_clutter \
      --out runs/multistart_sweep --restarts 16
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(__file__), "..", ".jax_cache")),
)

import jax.numpy as jnp
import numpy as np
import yaml

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.core.multistart import plan_multistart
from dgpmp2_tpu.data import dataset as ds
from dgpmp2_tpu.learn.eval import evaluate_batch, summarize
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.trajectory import straight_line_traj

from learned_campaign import COV, SIGMAS


def eval_family(root, spec, robot, K, amp, batch_size, seed):
    test_ds = ds.PlanningDataset(root, mode="test",
                                 label_subdir="opt_trajs_gpmp2")
    n = len(test_ds) - len(test_ds) % batch_size
    batches = [
        {k: jnp.asarray(v) for k, v in b.items()}
        for b in ds.as_batches(test_ds, np.arange(n), batch_size,
                               drop_remainder=True)
    ]
    cfg = gn.OptimConfig(reg=0.1, max_iters=50)
    plan_jit = jax.jit(
        lambda p, th0, s, rng: plan_multistart(
            spec, robot, p, th0, s, cfg, rng, restarts=K, amp=amp
        ).th
    )
    rows = {}
    for sigma in SIGMAS:
        cov = dict(COV, cost_sigma=sigma)
        all_m = []
        rng = jax.random.PRNGKey(seed)
        for bi, b in enumerate(batches):
            start, goal = b["start"], b["goal"]
            params = graph.default_params(spec, robot, start, goal, **cov,
                                          dtype=jnp.float32)
            th0 = straight_line_traj(
                start[:, :2], goal[:, :2], spec.total_time_sec,
                spec.total_time_step,
            ).astype(jnp.float32)
            th = plan_jit(params, th0, b["sdf"],
                          jax.random.fold_in(rng, bi))
            params_eval = graph.default_params(spec, robot, start, goal,
                                               **COV, dtype=jnp.float32)
            all_m.append(evaluate_batch(spec, robot, params_eval, th,
                                        b["th_opt"], b["sdf"]))
        merged = {k: np.concatenate([m[k] for m in all_m])
                  for k in all_m[0]}
        m = summarize(merged)
        m["sigma"] = float(sigma)
        rows[float(sigma)] = m
        print(f"  sigma={sigma}: solve_rate={m['solve_rate']:.3f} "
              f"contact_free={m['contact_free_rate']:.3f}", flush=True)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_root", required=True)
    p.add_argument("--families", nargs="+",
                   default=["multi_obs", "forest", "passage", "tar_pit",
                            "mixed_clutter"])
    p.add_argument("--out", required=True)
    p.add_argument("--t", type=int, default=100)
    p.add_argument("--restarts", type=int, default=16)
    p.add_argument("--amp", type=float, default=1.5)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    spec = graph.GraphSpec(total_time_step=args.t)
    robot = PointRobot2D()

    results = {}
    for fam in args.families:
        root = os.path.join(args.data_root, f"data_{fam}")
        print(f"[{fam}] K={args.restarts} sigma sweep", flush=True)
        t0 = time.time()
        rows = eval_family(root, spec, robot, args.restarts, args.amp,
                           args.batch, args.seed)
        best_solve = max(rows.values(),
                         key=lambda m: (m["solve_rate"],
                                        m["contact_free_rate"]))
        best_cf = max(rows.values(), key=lambda m: m["contact_free_rate"])
        results[fam] = {"by_sigma": rows, "best_solve": best_solve,
                        "best_contact_free": best_cf}
        print(f"[{fam}] best solve_rate={best_solve['solve_rate']:.3f} "
              f"(sigma {best_solve['sigma']}), best contact_free="
              f"{best_cf['contact_free_rate']:.3f} (sigma "
              f"{best_cf['sigma']}) in {time.time() - t0:.0f}s", flush=True)

    with open(os.path.join(args.out, "results.yaml"), "w") as fp:
        yaml.safe_dump(results, fp)

    lines = [f"**multi-start K={args.restarts}** (static covariances, "
             "straight base, best of 9 sigmas per family)",
             "", "| family | solve_rate | contact_free (same row) | "
             "best contact_free (any sigma) |", "|---|---|---|---|"]
    for fam, r in results.items():
        lines.append(
            f"| {fam} | {r['best_solve']['solve_rate']:.4f} | "
            f"{r['best_solve']['contact_free_rate']:.4f} | "
            f"{r['best_contact_free']['contact_free_rate']:.4f} |"
        )
    table = "\n".join(lines)
    print(table)
    with open(os.path.join(args.out, "table.md"), "w") as fp:
        fp.write(table + "\n")
    return results


if __name__ == "__main__":
    main()
