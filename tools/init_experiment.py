#!/usr/bin/env python
"""Learned-initialization experiment: can InitNet crack the forest family?

Forest is the one obstacle family where every planner — all nine static
sigmas AND every learned-covariance config — sits at solve_rate ~0.01
(PERFORMANCE.md), while the expert labels are collision-free by
construction.  The hypothesis: it's an *initialization* problem — the
straight-line seed threads dense clutter and Gauss-Newton converges to the
nearest (colliding) local minimum.  The reference ships an initialization
network for exactly this (``initialization_network.py``, SURVEY.md §2.6);
this tool measures how much a trained ``InitNet`` moves the needle:

1. train InitNet supervised to the expert deltas (``learn/train_initializer``
   machinery), epoch-selected by raw-init clearance rate on a held-out-from-
   train validation split;
2. on the family's test split, run the static-covariance sigma sweep twice —
   straight-line init vs InitNet init — with the usual best-iterate
   selection and canonical-judge metrics;
3. report the expert ceiling (the labels themselves under the same judge)
   and, when a trained eps_bounded covariance model is present, the
   combined learned-init + learned-covariance planner.

Usage:
  python tools/init_experiment.py --data runs/campaign_all5/data_forest \
      --out runs/init_forest --epochs 60
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
import optax
import yaml

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.data import dataset as ds
from dgpmp2_tpu.learn.eval import evaluate_batch, summarize
from dgpmp2_tpu.learn.train_initializer import make_train_fns, solve_rate
from dgpmp2_tpu.models.init_net import InitNet
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.trajectory import straight_line_traj

from learned_campaign import COV, SIGMAS, CONFIGS, make_planner

X_LIMS, Y_LIMS = (-5.0, 5.0), (-5.0, 5.0)


def train_initnet(root, out_dir, args, spec, robot):
    ckpt = os.path.join(out_dir, "initnet_vars.npz")
    net = InitNet(num_states=spec.num_traj_states, state_dim=spec.state_dim,
                  dropout_prob=args.dropout)
    tx = optax.adam(args.alpha)
    train_step, predict, seed_traj = make_train_fns(
        net, tx, spec.total_time_sec, spec.total_time_step, spec.dof
    )

    dataset = ds.PlanningDataset(root, mode="train",
                                 label_subdir="opt_trajs_gpmp2")
    all_idxs = np.random.default_rng(123).permutation(len(dataset))
    n_val = max(args.batch, len(all_idxs) // 10)
    n_val -= n_val % args.batch
    val_idxs, idxs = all_idxs[:n_val], all_idxs[n_val:]
    val_batches = [
        {k: jnp.asarray(v) for k, v in b.items()}
        for b in ds.as_batches(dataset, val_idxs, args.batch,
                               drop_remainder=True)
    ]
    meta = dataset.meta
    res = (X_LIMS[1] - X_LIMS[0]) / meta["im_size"]

    rng = jax.random.PRNGKey(args.seed)
    b0 = next(ds.as_batches(dataset, idxs, args.batch))
    b0 = {k: jnp.asarray(v) for k, v in b0.items()}
    x0 = jnp.stack([b0["im"], b0["sdf"]], axis=-1)
    params = net.init(rng, x0, seed_traj(b0["start"], b0["goal"]),
                      train=False)

    if os.path.exists(ckpt):
        loaded = np.load(ckpt, allow_pickle=True)
        flat, treedef = jax.tree_util.tree_flatten(params)
        params = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(loaded[f"v{i}"]) for i in range(len(flat))]
        )
        print("[init] loaded checkpoint, skipping training")
        return net, params, predict

    def val_clearance(params):
        rates = [
            solve_rate(predict(params, vb), vb["sdf"], res, X_LIMS, Y_LIMS,
                       float(robot.sphere_radii[0]))
            for vb in val_batches
        ]
        return float(np.mean(rates))

    opt_state = tx.init(params)
    rng_np = np.random.default_rng(1)
    best_rate, best_params = val_clearance(params), params
    print(f"[init] {len(idxs)} problems, batch {args.batch}, "
          f"{args.epochs} epochs; epoch -1 raw-init clearance={best_rate:.3f}")
    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        for b in ds.as_batches(dataset, idxs, args.batch, rng=rng_np,
                               drop_remainder=True):
            b = {k: jnp.asarray(v) for k, v in b.items()}
            params, opt_state, loss = train_step(
                params, opt_state, b,
                jax.random.fold_in(rng, epoch * 1000 + len(losses)),
            )
            losses.append(float(loss))
        if (epoch + 1) % args.eval_every == 0 or epoch == args.epochs - 1:
            rate = val_clearance(params)
            tag = ""
            if rate > best_rate:
                best_rate, best_params = rate, params
                tag = " *best*"
            print(f"[init] epoch {epoch}: loss={np.mean(losses):.4f} "
                  f"raw-init clearance={rate:.3f}{tag} "
                  f"({time.time() - t0:.1f}s)")
    print(f"[init] selected raw-init clearance={best_rate:.3f}")
    flat, _ = jax.tree_util.tree_flatten(best_params)
    np.savez(ckpt, **{f"v{i}": np.asarray(x) for i, x in enumerate(flat)})
    return net, best_params, predict


def eval_static(spec, robot, test_batches, th0_fn, sigma):
    """Static-covariance planner metrics under the canonical judge; the
    init is whatever ``th0_fn(batch)`` returns."""
    cfg = gn.OptimConfig(reg=0.1, max_iters=50)
    plan_jit = jax.jit(
        lambda p, th0, s: gn.plan(spec, robot, p, th0, s, cfg,
                                  track_best=True).best_th
    )
    cov = dict(COV, cost_sigma=sigma)
    all_m = []
    for b in test_batches:
        start, goal = jnp.asarray(b["start"]), jnp.asarray(b["goal"])
        params = graph.default_params(spec, robot, start, goal, **cov,
                                      dtype=jnp.float32)
        th = plan_jit(params, th0_fn(b), jnp.asarray(b["sdf"]))
        params_eval = graph.default_params(spec, robot, start, goal, **COV,
                                           dtype=jnp.float32)
        all_m.append(evaluate_batch(spec, robot, params_eval, th,
                                    jnp.asarray(b["th_opt"]),
                                    jnp.asarray(b["sdf"])))
    merged = {k: np.concatenate([m[k] for m in all_m]) for k in all_m[0]}
    return summarize(merged)


def eval_expert_ceiling(spec, robot, test_batches):
    """The labels themselves under the same judge — the attainable bound."""
    all_m = []
    for b in test_batches:
        start, goal = jnp.asarray(b["start"]), jnp.asarray(b["goal"])
        params_eval = graph.default_params(spec, robot, start, goal, **COV,
                                           dtype=jnp.float32)
        th_opt = jnp.asarray(b["th_opt"])
        all_m.append(evaluate_batch(spec, robot, params_eval, th_opt, th_opt,
                                    jnp.asarray(b["sdf"])))
    merged = {k: np.concatenate([m[k] for m in all_m]) for k in all_m[0]}
    return summarize(merged)


def eval_learned_with_init(planner, variables, test_batches, th0_fn):
    spec, robot = planner.spec, planner.robot
    plan_jit = jax.jit(
        lambda v, p, th0, s, im: planner.plan(v, p, th0, s, im, max_iters=50,
                                              track_best=True)[0]
    )
    all_m = []
    for b in test_batches:
        start, goal = jnp.asarray(b["start"]), jnp.asarray(b["goal"])
        params_fix = graph.default_params(spec, robot, start, goal, **COV,
                                          dtype=jnp.float32)
        th = plan_jit(variables, params_fix, th0_fn(b),
                      jnp.asarray(b["sdf"]), jnp.asarray(b["im"]))
        all_m.append(evaluate_batch(spec, robot, params_fix, th,
                                    jnp.asarray(b["th_opt"]),
                                    jnp.asarray(b["sdf"])))
    merged = {k: np.concatenate([m[k] for m in all_m]) for k in all_m[0]}
    return summarize(merged)


def eval_multistart(spec, robot, test_batches, th0_fn, sigma, K, amp,
                    im_size, seed=0):
    """Static planner from K perturbed seeds per problem via the library's
    :func:`dgpmp2_tpu.core.multistart.plan_multistart` (one (K·B)-batch)."""
    from dgpmp2_tpu.core.multistart import plan_multistart

    cfg = gn.OptimConfig(reg=0.1, max_iters=50)
    cov = dict(COV, cost_sigma=sigma)
    plan_jit = jax.jit(
        lambda p, th0, s, rng: plan_multistart(
            spec, robot, p, th0, s, cfg, rng, restarts=K, amp=amp
        ).th
    )
    rng = jax.random.PRNGKey(seed)
    all_m = []
    for bi, b in enumerate(test_batches):
        start, goal = jnp.asarray(b["start"]), jnp.asarray(b["goal"])
        params = graph.default_params(spec, robot, start, goal, **cov,
                                      dtype=jnp.float32)
        th_sel = plan_jit(params, th0_fn(b), jnp.asarray(b["sdf"]),
                          jax.random.fold_in(rng, bi))
        params_eval = graph.default_params(spec, robot, start, goal, **COV,
                                           dtype=jnp.float32)
        all_m.append(evaluate_batch(spec, robot, params_eval, th_sel,
                                    jnp.asarray(b["th_opt"]),
                                    jnp.asarray(b["sdf"])))
    merged = {k: np.concatenate([m[k] for m in all_m]) for k in all_m[0]}
    return summarize(merged)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True,
                   help="family data root (with train/ and test/)")
    p.add_argument("--out", required=True)
    p.add_argument("--t", type=int, default=100)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--alpha", type=float, default=3e-4)
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--eval_every", type=int, default=5)
    p.add_argument("--eval_batch", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--restarts", type=int, default=16)
    p.add_argument("--amp", type=float, default=1.5)
    p.add_argument("--cov_model", default=None,
                   help="optional <name>:<vars.npz> of a trained covariance "
                        "model to combine with the learned init")
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    spec = graph.GraphSpec(total_time_step=args.t)
    robot = PointRobot2D()

    net, params, predict = train_initnet(args.data, args.out, args, spec,
                                         robot)

    test_ds = ds.PlanningDataset(args.data, mode="test",
                                 label_subdir="opt_trajs_gpmp2")
    n = len(test_ds) - len(test_ds) % args.eval_batch
    test_batches = [
        {k: jnp.asarray(v) for k, v in b.items()}
        for b in ds.as_batches(test_ds, np.arange(n), args.eval_batch,
                               drop_remainder=True)
    ]
    print(f"[eval] {n} test problems in {len(test_batches)} batches")

    def straight(b):
        return straight_line_traj(
            b["start"][:, :2], b["goal"][:, :2], spec.total_time_sec,
            spec.total_time_step,
        ).astype(jnp.float32)

    init_jit = jax.jit(lambda b: predict(params, b))

    def learned_init(b):
        return init_jit(b)

    results = {"expert_ceiling": eval_expert_ceiling(spec, robot,
                                                     test_batches)}
    print(f"[eval] expert ceiling: solve_rate="
          f"{results['expert_ceiling']['solve_rate']:.3f} contact_free="
          f"{results['expert_ceiling']['contact_free_rate']:.3f}")

    # Raw predicted init (no optimization) under the same judge.
    all_m = []
    for b in test_batches:
        start, goal = jnp.asarray(b["start"]), jnp.asarray(b["goal"])
        params_eval = graph.default_params(spec, robot, start, goal, **COV,
                                           dtype=jnp.float32)
        all_m.append(evaluate_batch(spec, robot, params_eval,
                                    learned_init(b),
                                    jnp.asarray(b["th_opt"]),
                                    jnp.asarray(b["sdf"])))
    merged = {k: np.concatenate([m[k] for m in all_m]) for k in all_m[0]}
    results["raw_initnet"] = summarize(merged)
    print(f"[eval] raw initnet (no optimizer): solve_rate="
          f"{results['raw_initnet']['solve_rate']:.3f} contact_free="
          f"{results['raw_initnet']['contact_free_rate']:.3f}")

    def key(m):
        # forest's margin criterion is unsatisfiable (expert ceiling has
        # solve_rate 0) — break solve-rate ties by the contact criterion.
        return (m["solve_rate"], m["contact_free_rate"])

    for name, th0_fn in (("straight", straight), ("initnet", learned_init)):
        best = None
        for sigma in SIGMAS:
            m = eval_static(spec, robot, test_batches, th0_fn, sigma)
            m["sigma"] = float(sigma)
            print(f"[eval:{name}] sigma={sigma}: solve_rate="
                  f"{m['solve_rate']:.3f} contact_free="
                  f"{m['contact_free_rate']:.3f}")
            if best is None or key(m) > key(best):
                best = m
        results[f"static_{name}_best"] = best

    for name, th0_fn in (("straight", straight), ("initnet", learned_init)):
        best = None
        for sigma in SIGMAS:
            m = eval_multistart(spec, robot, test_batches, th0_fn, sigma,
                                args.restarts, args.amp,
                                test_ds.meta["im_size"], seed=args.seed)
            m["sigma"] = float(sigma)
            print(f"[eval:ms{args.restarts}_{name}] sigma={sigma}: "
                  f"solve_rate={m['solve_rate']:.3f} contact_free="
                  f"{m['contact_free_rate']:.3f}")
            if best is None or key(m) > key(best):
                best = m
        results[f"multistart{args.restarts}_{name}_best"] = best

    if args.cov_model:
        cname, vpath = args.cov_model.split(":", 1)
        planner = make_planner(args.t, CONFIGS[cname][1])
        b0 = test_batches[0]
        tmpl = planner.init_variables(
            jax.random.PRNGKey(0),
            planner.stack_inputs(b0["im"], b0["sdf"]), b0["th_opt"],
        )
        loaded = np.load(vpath, allow_pickle=True)
        flat, treedef = jax.tree_util.tree_flatten(tmpl)
        variables = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(loaded[f"v{i}"]) for i in range(len(flat))]
        )
        for name, th0_fn in (("straight", straight),
                             ("initnet", learned_init)):
            m = eval_learned_with_init(planner, variables, test_batches,
                                       th0_fn)
            results[f"{cname}_{name}"] = m
            print(f"[eval:{cname}_{name}] solve_rate={m['solve_rate']:.3f} "
                  f"contact_free={m['contact_free_rate']:.3f}")

    with open(os.path.join(args.out, "results.yaml"), "w") as fp:
        yaml.safe_dump(results, fp)

    keys = ("solve_rate", "contact_free_rate", "avg_gp_error",
            "avg_max_penetration", "avg_coll_intensity", "avg_pos_mse")
    lines = ["| config | " + " | ".join(k.replace("avg_", "") for k in keys)
             + " |", "|" + "---|" * (len(keys) + 1)]
    for name, m in results.items():
        if m is None:
            continue
        lines.append("| " + name + " | " +
                     " | ".join(f"{m[k]:.4f}" for k in keys) + " |")
    table = "\n".join(lines)
    print(table)
    with open(os.path.join(args.out, "table.md"), "w") as fp:
        fp.write(table + "\n")
    return results


if __name__ == "__main__":
    main()
