#!/usr/bin/env python
"""Multi-start composition on the arm test set.

Completes the arm campaign's comparison grid (tools/arm_campaign.py):
straight-seed static vs learned planners, then the same planners under
K-seed multi-start (core.multistart — joint-space sine-harmonic seed
perturbations, per-problem selection).  Mirrors the point-robot
composition study (PERFORMANCE.md "Learned covariances × multi-start")
on an articulated robot, which the reference cannot express at all.

Usage (after tools/arm_campaign.py has populated --out):
  python tools/arm_multistart_eval.py --out runs/arm_campaign \
      --restarts 16 --amp 1.2 [--cov_model eps_bounded_lr1]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(__file__), "..", ".jax_cache")),
)

import jax.numpy as jnp
import numpy as np
import yaml

from dgpmp2_tpu.core import gn, graph, multistart
from dgpmp2_tpu.learn import checkpoints
from dgpmp2_tpu.learn.eval import evaluate_batch, summarize
from dgpmp2_tpu.learn.learned_planner import (
    LearnedDiffGPMP2Planner, LearnedPlannerConfig,
)
from dgpmp2_tpu.utils.trajectory import straight_line_traj
from tools.arm_campaign import ARM, COV, T_STEP, as_batches

SIGMAS_MS = [0.02, 0.05, 0.1]


def eval_static_ms(spec, test, bs, sigma, restarts, amp, prune_iters, keep):
    cfg = gn.OptimConfig(reg=0.1, max_iters=50)
    rng = jax.random.PRNGKey(0)
    ms_jit = jax.jit(
        lambda p, th0, s, r: multistart.plan_multistart(
            spec, ARM, p, th0, s, cfg, r, restarts=restarts, amp=amp,
            prune_iters=prune_iters, keep=keep).th)
    all_m = []
    for b in as_batches(test, np.arange(len(test["im"])), bs):
        start, goal = jnp.asarray(b["start"]), jnp.asarray(b["goal"])
        params = graph.default_params(
            spec, ARM, start, goal, **dict(COV, cost_sigma=sigma),
            dtype=jnp.float32)
        th0 = straight_line_traj(start[:, :2], goal[:, :2],
                                 spec.total_time_sec,
                                 spec.total_time_step).astype(jnp.float32)
        th_sel = ms_jit(params, th0, jnp.asarray(b["sdf"]), rng)
        params_eval = graph.default_params(spec, ARM, start, goal, **COV,
                                           dtype=jnp.float32)
        all_m.append(evaluate_batch(spec, ARM, params_eval, th_sel,
                                    jnp.asarray(b["th_opt"]),
                                    jnp.asarray(b["sdf"])))
    merged = {k: np.concatenate([m[k] for m in all_m]) for k in all_m[0]}
    return summarize(merged)


def eval_learned_ms(spec, test, bs, planner, variables, restarts, amp,
                    prune_iters, keep):
    rng = jax.random.PRNGKey(0)
    ms_jit = jax.jit(
        lambda v, p, th0, s, im, r: planner.plan_multistart(
            v, p, th0, s, im, r, restarts=restarts, amp=amp,
            prune_iters=prune_iters, keep=keep).th)
    all_m = []
    for b in as_batches(test, np.arange(len(test["im"])), bs):
        start, goal = jnp.asarray(b["start"]), jnp.asarray(b["goal"])
        params = graph.default_params(spec, ARM, start, goal, **COV,
                                      dtype=jnp.float32)
        th0 = straight_line_traj(start[:, :2], goal[:, :2],
                                 spec.total_time_sec,
                                 spec.total_time_step).astype(jnp.float32)
        th_sel = ms_jit(variables, params, th0, jnp.asarray(b["sdf"]),
                        jnp.asarray(b["im"]), rng)
        all_m.append(evaluate_batch(spec, ARM, params, th_sel,
                                    jnp.asarray(b["th_opt"]),
                                    jnp.asarray(b["sdf"])))
    merged = {k: np.concatenate([m[k] for m in all_m]) for k in all_m[0]}
    return summarize(merged)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--restarts", type=int, default=16)
    p.add_argument("--amp", type=float, default=1.2)
    p.add_argument("--prune_iters", type=int, default=0)
    p.add_argument("--keep", type=int, default=0)
    p.add_argument("--cov_model", default=None,
                   help="campaign config name whose <name>_vars.npz to "
                        "compose with multi-start")
    p.add_argument("--cov_sigma", type=float, default=0.02,
                   help="static_init sigma the model was trained with")
    args = p.parse_args(argv)

    with np.load(os.path.join(args.out, "data_test.npz")) as z:
        test = {k: z[k] for k in z.files}
    spec = graph.GraphSpec(total_time_step=T_STEP, nlinks=ARM.nlinks)

    out_file = os.path.join(args.out, "multistart_results.yaml")
    results = {}
    if os.path.exists(out_file):
        with open(out_file) as fp:
            results = yaml.safe_load(fp) or {}

    for sigma in SIGMAS_MS:
        key = f"static_ms{args.restarts}_s{sigma}"
        if key in results:
            continue
        results[key] = eval_static_ms(spec, test, args.batch, sigma,
                                      args.restarts, args.amp,
                                      args.prune_iters, args.keep)
        print(f"[{key}] solve={results[key]['solve_rate']:.3f} "
              f"cfree={results[key]['contact_free_rate']:.3f}", flush=True)
        with open(out_file, "w") as fp:
            yaml.safe_dump(results, fp)

    if args.cov_model:
        lcfg = LearnedPlannerConfig(
            dynamics_mode="diag_identity", dropout_prob=0.1, learn_eps=True,
            eps_max=2 * COV["epsilon_dist"],
            static_init=(1.0, args.cov_sigma, COV["epsilon_dist"]))
        planner = LearnedDiffGPMP2Planner(
            spec, ARM, gn.OptimConfig(reg=0.1, max_iters=50), lcfg)
        # template variables to restore into
        b0 = next(as_batches(test, np.arange(len(test["im"])), args.batch))
        tmpl = planner.init_variables(
            jax.random.PRNGKey(0),
            planner.stack_inputs(jnp.asarray(b0["im"]),
                                 jnp.asarray(b0["sdf"])),
            straight_line_traj(jnp.asarray(b0["start"][:, :2]),
                               jnp.asarray(b0["goal"][:, :2]),
                               spec.total_time_sec,
                               spec.total_time_step).astype(jnp.float32))
        variables = checkpoints.load_flat_variables(
            os.path.join(args.out, f"{args.cov_model}_vars.npz"), tmpl)
        key = f"{args.cov_model}_ms{args.restarts}"
        results[key] = eval_learned_ms(spec, test, args.batch, planner,
                                       variables, args.restarts, args.amp,
                                       args.prune_iters, args.keep)
        print(f"[{key}] solve={results[key]['solve_rate']:.3f} "
              f"cfree={results[key]['contact_free_rate']:.3f}", flush=True)
        with open(out_file, "w") as fp:
            yaml.safe_dump(results, fp)

    for k, r in sorted(results.items()):
        print(f"{k}: solve={r['solve_rate']:.4f} "
              f"cfree={r['contact_free_rate']:.4f} "
              f"gp={r['avg_gp_error']:.4f}")


if __name__ == "__main__":
    main()
