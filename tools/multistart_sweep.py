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
from dgpmp2_tpu.learn import checkpoints
from dgpmp2_tpu.learn.eval import evaluate_batch, summarize
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.trajectory import straight_line_traj

from learned_campaign import COV, SIGMAS, CONFIGS, make_planner


def load_batches(root, batch_size, limit=None):
    test_ds = ds.PlanningDataset(root, mode="test",
                                 label_subdir="opt_trajs_gpmp2")
    # Tiny (smoke-scale) splits: shrink the batch rather than dropping
    # every problem to the remainder.
    batch_size = min(batch_size, len(test_ds))
    n = len(test_ds) - len(test_ds) % batch_size
    if limit is not None:
        n = min(n, limit)
    return [
        {k: jnp.asarray(v) for k, v in b.items()}
        for b in ds.as_batches(test_ds, np.arange(n), batch_size,
                               drop_remainder=True)
    ]


def rrt_seed_pool(batches, spec, n_seeds, plan_time, clearance, seed):
    """Per-batch informed RRT* seed pools (E, B, T+1, 4), cached across
    the sigma sweep — seeds depend only on the problems, not on the
    covariances (core.seeds; the reference RRT*→GPMP2 recipe)."""
    from dgpmp2_tpu.core import seeds as seeds_lib

    pools, n_found = [], 0
    for bi, b in enumerate(batches):
        per = []
        for k in range(n_seeds):
            s, found = seeds_lib.rrt_seed_batch(
                np.asarray(b["sdf"]), np.asarray(b["start"]),
                np.asarray(b["goal"]), spec.x_lims, spec.y_lims,
                spec.total_time_sec, spec.num_traj_states,
                clearance=clearance, plan_time=plan_time,
                seed=seed + 7919 * k + 104729 * bi,
            )
            per.append(s)
            n_found += int(found.sum())
        pools.append(jnp.asarray(np.stack(per), jnp.float32))
    total = n_seeds * sum(b["start"].shape[0] for b in batches)
    print(f"  rrt seeds: {n_found}/{total} found", flush=True)
    return pools


def eval_family(root, spec, robot, K, amp, batch_size, seed,
                prune_iters=0, keep=0, sigmas=None, rrt_seeds=0,
                rrt_plan_time=1.0, rrt_clearance=0.2):
    batches = load_batches(root, batch_size)
    cfg = gn.OptimConfig(reg=0.1, max_iters=50)
    plan_jit = jax.jit(
        lambda p, th0, s, rng, extra: plan_multistart(
            spec, robot, p, th0, s, cfg, rng, restarts=K, amp=amp,
            prune_iters=prune_iters, keep=keep, extra_seeds=extra,
        ).th,
        static_argnames=(),
    ) if rrt_seeds else jax.jit(
        lambda p, th0, s, rng: plan_multistart(
            spec, robot, p, th0, s, cfg, rng, restarts=K, amp=amp,
            prune_iters=prune_iters, keep=keep,
        ).th
    )
    pools = (rrt_seed_pool(batches, spec, rrt_seeds, rrt_plan_time,
                           rrt_clearance, seed) if rrt_seeds else None)
    rows = {}
    for sigma in (SIGMAS if sigmas is None else sigmas):
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
            args = (params, th0, b["sdf"], jax.random.fold_in(rng, bi))
            th = plan_jit(*args, pools[bi]) if rrt_seeds else plan_jit(*args)
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


def eval_family_learned_ms(root, planner, variables, K, amp, batch_size,
                           seed, prune_iters=0, keep=0):
    """Learned-covariance planner composed with multi-start seeds: the
    (K·B)-tiled batch goes through LearnedDiffGPMP2Planner.plan (the
    covariance head predicts per candidate), selection via
    core.multistart.select_best."""
    spec, robot = planner.spec, planner.robot
    batches = load_batches(root, batch_size)
    ms_jit = jax.jit(
        lambda v, p, th0, s, im, rng: planner.plan_multistart(
            v, p, th0, s, im, rng, restarts=K, amp=amp, max_iters=50,
            prune_iters=prune_iters, keep=keep,
        )
    )
    all_m = []
    rng = jax.random.PRNGKey(seed)
    for bi, b in enumerate(batches):
        start, goal = b["start"], b["goal"]
        th0 = straight_line_traj(
            start[:, :2], goal[:, :2], spec.total_time_sec,
            spec.total_time_step,
        ).astype(jnp.float32)
        params = graph.default_params(spec, robot, start, goal, **COV,
                                      dtype=jnp.float32)
        out = ms_jit(variables, params, th0, b["sdf"], b["im"],
                     jax.random.fold_in(rng, bi))
        all_m.append(evaluate_batch(spec, robot, params, out.th,
                                    b["th_opt"], b["sdf"]))
    merged = {k: np.concatenate([m[k] for m in all_m]) for k in all_m[0]}
    return summarize(merged)


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
    p.add_argument("--prune_iters", type=int, default=0,
                   help="staged pruning: phase-1 iterations")
    p.add_argument("--keep", type=int, default=0,
                   help="staged pruning: survivors per problem")
    p.add_argument("--rrt_seeds", type=int, default=0,
                   help="informed RRT* seeds appended per problem "
                        "(host-side native planner; core/seeds.py)")
    p.add_argument("--rrt_plan_time", type=float, default=1.0,
                   help="per-problem RRT* budget, seconds")
    p.add_argument("--rrt_clearance", type=float, default=0.2,
                   help="RRT* validity clearance (m); robot radius + margin")
    p.add_argument("--cov_model", default=None,
                   help="<config>:<vars.npz> learned covariance model to "
                        "compose with multi-start seeds")
    p.add_argument("--no_static", action="store_true",
                   help="skip the static sigma sweep (learned-only pass)")
    p.add_argument("--sigmas", nargs="+", type=float, default=None,
                   help="restrict the static sweep to these sigmas "
                        "(default: all nine)")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    spec = graph.GraphSpec(total_time_step=args.t)
    robot = PointRobot2D()

    results_path = os.path.join(args.out, "results.yaml")
    results = {}
    if os.path.exists(results_path):
        with open(results_path) as fp:
            results = yaml.safe_load(fp) or {}

    if not args.no_static:
        for fam in args.families:
            root = os.path.join(args.data_root, f"data_{fam}")
            print(f"[{fam}] K={args.restarts} sigma sweep", flush=True)
            t0 = time.time()
            rows = eval_family(root, spec, robot, args.restarts, args.amp,
                               args.batch, args.seed,
                               args.prune_iters, args.keep, args.sigmas,
                               rrt_seeds=args.rrt_seeds,
                               rrt_plan_time=args.rrt_plan_time,
                               rrt_clearance=args.rrt_clearance)
            # RRT*-seeded rows live under their own key so the informed
            # and uninformed sweeps stay separately reported.
            skey = (f"by_sigma_rrt{args.rrt_seeds}" if args.rrt_seeds
                    else "by_sigma")
            bs_key = "best_solve" + (f"_rrt{args.rrt_seeds}"
                                     if args.rrt_seeds else "")
            bc_key = "best_contact_free" + (f"_rrt{args.rrt_seeds}"
                                            if args.rrt_seeds else "")
            merged = dict(results.get(fam, {}).get(skey, {}))
            merged.update(rows)
            best_solve = max(merged.values(),
                             key=lambda m: (m["solve_rate"],
                                            m["contact_free_rate"]))
            best_cf = max(merged.values(),
                          key=lambda m: m["contact_free_rate"])
            results.setdefault(fam, {}).update(
                {skey: merged, bs_key: best_solve, bc_key: best_cf})
            print(f"[{fam}] best solve_rate={best_solve['solve_rate']:.3f} "
                  f"(sigma {best_solve['sigma']}), best contact_free="
                  f"{best_cf['contact_free_rate']:.3f} (sigma "
                  f"{best_cf['sigma']}) in {time.time() - t0:.0f}s",
                  flush=True)

    if args.cov_model:
        cname, vpath = args.cov_model.split(":", 1)
        planner = make_planner(args.t, CONFIGS[cname][1])
        root0 = os.path.join(args.data_root, f"data_{args.families[0]}")
        b0 = load_batches(root0, args.batch, limit=args.batch)[0]
        tmpl = planner.init_variables(
            jax.random.PRNGKey(0),
            planner.stack_inputs(b0["im"], b0["sdf"]), b0["th_opt"],
        )
        variables = checkpoints.load_flat_variables(vpath, tmpl)
        for fam in args.families:
            root = os.path.join(args.data_root, f"data_{fam}")
            t0 = time.time()
            m = eval_family_learned_ms(root, planner, variables,
                                       args.restarts, args.amp, args.batch,
                                       args.seed, args.prune_iters,
                                       args.keep)
            key = f"{cname}_ms{args.restarts}"
            if args.keep:
                key += f"_p{args.prune_iters}k{args.keep}"
            results.setdefault(fam, {})[key] = m
            print(f"[{fam}] {cname}+ms{args.restarts}: solve_rate="
                  f"{m['solve_rate']:.3f} contact_free="
                  f"{m['contact_free_rate']:.3f} in {time.time() - t0:.0f}s",
                  flush=True)

    with open(results_path, "w") as fp:
        yaml.safe_dump(results, fp)

    lines = [f"**multi-start K={args.restarts}** (straight base; static = "
             "best of 9 sigmas per family)",
             "", "| family | solve_rate | contact_free (same row) | "
             "best contact_free (any sigma) | learned+ms solve | "
             "learned+ms contact_free |", "|---|---|---|---|---|---|"]
    for fam, r in results.items():
        bs, bc = r.get("best_solve"), r.get("best_contact_free")
        suffix = f"_ms{args.restarts}"
        if args.keep:
            suffix += f"_p{args.prune_iters}k{args.keep}"
        lm = next((v for k, v in r.items() if k.endswith(suffix)), None)
        lines.append(
            f"| {fam} | "
            + (f"{bs['solve_rate']:.4f} | {bs['contact_free_rate']:.4f} | "
               if bs else "— | — | ")
            + (f"{bc['contact_free_rate']:.4f} | " if bc else "— | ")
            + (f"{lm['solve_rate']:.4f} | {lm['contact_free_rate']:.4f} |"
               if lm else "— | — |")
        )
    table = "\n".join(lines)
    print(table)
    with open(os.path.join(args.out, "table.md"), "w") as fp:
        fp.write(table + "\n")
    return results


if __name__ == "__main__":
    main()
