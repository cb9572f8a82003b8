#!/usr/bin/env python
"""Learned-vs-static campaign: data → static sweep → train sweep → eval.

The round-1 gap: the learned planner only matched the best static
covariance.  This tool runs the full comparison at scale on one chip:

1. generate train/test datasets (batched expert, several obstacle families)
2. static-covariance sensitivity sweep on the held-out test split (the
   honest opponent, ``test_dataset_sensitivity.py`` semantics)
3. train several learned configs (loss-weight / dynamics-mode sweep, all
   ``static_init`` so learning refines the baseline instead of recovering)
4. evaluate each on the same test split with the reference metric suite
   (+ the margin-vs-contact split) and write a results table.

Usage:
  python tools/learned_campaign.py --out runs/campaign --num_train 250 \
      --num_test 40 --probs 4 --families multi_obs forest --epochs 80
"""
import argparse
import json
import os
import sys
import time

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

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.data import dataset as ds
from dgpmp2_tpu.learn import checkpoints
from dgpmp2_tpu.data import generate
from dgpmp2_tpu.learn.eval import evaluate_batch, summarize
from dgpmp2_tpu.learn.learned_planner import (
    LearnedDiffGPMP2Planner, LearnedPlannerConfig,
)
from dgpmp2_tpu.learn.losses import LossWeights
from dgpmp2_tpu.learn.train import (
    TrainConfig, init_train_state, make_optimizer, make_train_step,
)
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.trajectory import straight_line_traj

COV = dict(qc_inv=np.eye(2), cost_sigma=0.05, epsilon_dist=0.4,
           k_s=0.01, k_g=0.01)
SIGMAS = [0.01, 0.02, 0.05, 0.1, 0.2, 0.5, 1.0, 2.0, 5.0]

# name -> (LossWeights overrides, LearnedPlannerConfig overrides)
CONFIGS = {
    "ref_loss": (dict(ext_loss_weight=0.01), {}),
    "obs_heavy": (dict(pos_loss_weight=0.3, ext_loss_weight=0.3,
                       ext_obs_lambda=5.0), {}),
    "task_only": (dict(pos_loss_weight=0.0, ext_loss_weight=1.0,
                       ext_obs_lambda=5.0), {}),
    # Start at the strongest static covariance (sigma=0.02, the sweep
    # winner) and refine with the task loss: the expert labels were
    # generated at sigma=0.05, so any pos-MSE term anchors the planner to
    # a weaker-than-best static behavior — drop it.
    "task_s02": (dict(pos_loss_weight=0.0, ext_loss_weight=1.0,
                      ext_obs_lambda=5.0),
                 dict(static_init=(1.0, 0.02, COV["epsilon_dist"]))),
    # Learned per-state safety margin eps on top of the covariances.
    "task_eps": (dict(pos_loss_weight=0.0, ext_loss_weight=1.0,
                      ext_obs_lambda=5.0), dict(learn_eps=True)),
    # Smooth-max penetration surrogate: solve_rate fails a problem on its
    # single worst interior hinge, so optimize that state directly instead
    # of the 1/(T·L)-diluted mean hinge (losses.smooth_max_penetration).
    "task_maxpen": (dict(pos_loss_weight=0.0, ext_loss_weight=0.1,
                         ext_obs_lambda=1.0, max_pen_weight=5.0),
                    dict(static_init=(1.0, 0.02, COV["epsilon_dist"]))),
    # Same surrogate, initialized at this dataset's static sweep winner
    # (sigma=0.01) so learning starts from the strongest baseline.
    "task_maxpen01": (dict(pos_loss_weight=0.0, ext_loss_weight=0.1,
                           ext_obs_lambda=1.0, max_pen_weight=5.0),
                      dict(static_init=(1.0, 0.01, COV["epsilon_dist"]))),
    # Wave 2 (after the first sweep): task_eps won solve_rate decisively
    # (0.66 vs 0.39 static) but with wild trajectories (gp_error 2.2,
    # pos_mse 284) — the ext loss alone doesn't anchor smoothness once
    # learned eps inflates the margins.  Anchor it:
    # a mild expert-imitation term keeps the trajectory near the expert
    # while eps-learning buys clearance.
    "eps_anchor": (dict(pos_loss_weight=0.05, ext_loss_weight=1.0,
                        ext_obs_lambda=5.0), dict(learn_eps=True)),
    # eps-learning + worst-state surrogate from the sweep-winner init —
    # combine the two winning mechanisms.
    "eps_maxpen": (dict(pos_loss_weight=0.0, ext_loss_weight=0.1,
                        ext_obs_lambda=1.0, max_pen_weight=5.0),
                   dict(learn_eps=True,
                        static_init=(1.0, 0.01, COV["epsilon_dist"]))),
    # Wave 3: eps_maxpen solved 0.89 but by gaming the metric (gp_error
    # 23, sg_error 0.85 — it stopped reaching the goal; solve_rate does
    # not check goal attainment).  Re-anchor with the expert term and the
    # full ext loss (which carries sg + gp at weight 1).
    "eps_maxpen_anchor": (dict(pos_loss_weight=0.05, ext_loss_weight=1.0,
                               ext_obs_lambda=1.0, max_pen_weight=3.0),
                          dict(learn_eps=True,
                               static_init=(1.0, 0.01, COV["epsilon_dist"]))),
    # Wave 4: bounded eps (eps = eps_max*sigmoid) caps the metric-gaming
    # channel — the planner can at most double its margins, so solve-rate
    # gains must come from genuine clearance, not from fleeing the task.
    "eps_bounded": (dict(pos_loss_weight=0.0, ext_loss_weight=1.0,
                         ext_obs_lambda=5.0),
                    dict(learn_eps=True, eps_max=2 * COV["epsilon_dist"],
                         static_init=(1.0, 0.01, COV["epsilon_dist"]))),
    # Bounded eps + worst-state surrogate + mild expert anchor.
    "eps_bounded_maxpen": (dict(pos_loss_weight=0.05, ext_loss_weight=1.0,
                                ext_obs_lambda=2.0, max_pen_weight=3.0),
                           dict(learn_eps=True,
                                eps_max=2 * COV["epsilon_dist"],
                                static_init=(1.0, 0.01, COV["epsilon_dist"]))),
    # XL eps_bounded peaked at epoch 3 then degraded (the task-only ext
    # loss keeps dropping while val solve_rate falls) — same recipe at a
    # 3x lower step size for a steadier climb.
    "eps_bounded_lr1": (dict(pos_loss_weight=0.0, ext_loss_weight=1.0,
                             ext_obs_lambda=5.0, _alpha=1e-4),
                        dict(learn_eps=True, eps_max=2 * COV["epsilon_dist"],
                             static_init=(1.0, 0.01, COV["epsilon_dist"]))),
    # Recurrent head (reference model.type rnn_gru) at scale: one GRU step
    # per GN iteration.
    "eps_bounded_gru": (dict(pos_loss_weight=0.0, ext_loss_weight=1.0,
                             ext_obs_lambda=5.0),
                        dict(learn_eps=True, eps_max=2 * COV["epsilon_dist"],
                             static_init=(1.0, 0.01, COV["epsilon_dist"]),
                             model_type="rnn_gru")),
}


def gen_data(out, families, num_train, num_test, probs, t, seed=0):
    spec = graph.GraphSpec(total_time_step=t)
    robot = PointRobot2D()
    # LM expert: step rejection keeps the optimizer stable in clutter
    # (forest per-problem acceptance 25% with GN -> 78% with LM+track_best).
    cfg = gn.OptimConfig(reg=0.1, max_iters=60, method="lm")
    roots = []
    for fi, fam in enumerate(families):
        root = os.path.join(out, f"data_{fam}")
        roots.append(root)
        if os.path.exists(os.path.join(root, "test", "meta.yaml")):
            print(f"[data] {fam}: exists, skipping")
            continue
        rng = np.random.default_rng(seed + 1000 * (fi + 1))
        for mode, n in (("train", num_train), ("test", num_test)):
            t0 = time.time()
            generate.generate_split(
                os.path.join(root, mode), n, probs, fam, 128, rng, spec,
                robot, cfg, COV,
            )
            print(f"[data] {fam}/{mode}: {n} envs x {probs} in "
                  f"{time.time() - t0:.0f}s")
    return roots


def load_test_batches(roots, batch_size):
    dataset = ds.PlanningDatasetMulti(roots, mode="test",
                                      label_subdir="opt_trajs_gpmp2")
    idxs = np.arange(len(dataset))
    return list(ds.as_batches(dataset, idxs, batch_size, drop_remainder=True))


def load_family_batches(root, batch_size):
    """All test problems of ONE family root as batches (for the per-family
    breakdown of a multi-family generalist run)."""
    dataset = ds.PlanningDataset(root, mode="test",
                                 label_subdir="opt_trajs_gpmp2")
    n = len(dataset) - len(dataset) % batch_size
    return list(ds.as_batches(dataset, np.arange(n), batch_size,
                              drop_remainder=True))


def static_sweep(spec, robot, test_batches, out_file):
    """Best-static opponent: per-sigma metrics on the test split."""
    if os.path.exists(out_file):
        with open(out_file) as fp:
            return yaml.safe_load(fp)
    cfg = gn.OptimConfig(reg=0.1, max_iters=50)
    # Reference-harness trajectory selection (test_planner.py:253-262):
    # best non-colliding iterate by GP-MSE, symmetric with eval_learned.
    plan_jit = jax.jit(
        lambda p, th0, s: gn.plan(spec, robot, p, th0, s, cfg,
                                  track_best=True).best_th
    )
    results = {}
    for sigma in SIGMAS:
        cov = dict(COV, cost_sigma=sigma)
        all_m = []
        for b in test_batches:
            params = graph.default_params(
                spec, robot, jnp.asarray(b["start"]), jnp.asarray(b["goal"]),
                **cov, dtype=jnp.float32,
            )
            th0 = straight_line_traj(
                jnp.asarray(b["start"][:, :2]), jnp.asarray(b["goal"][:, :2]),
                spec.total_time_sec, spec.total_time_step,
            ).astype(jnp.float32)
            th = plan_jit(params, th0, jnp.asarray(b["sdf"]))
            # Metrics always under the CANONICAL eps/sigma so every row is
            # comparable (sigma only changes the planner, not the judge).
            params_eval = graph.default_params(
                spec, robot, jnp.asarray(b["start"]), jnp.asarray(b["goal"]),
                **COV, dtype=jnp.float32,
            )
            all_m.append(evaluate_batch(spec, robot, params_eval, th,
                                        jnp.asarray(b["th_opt"]),
                                        jnp.asarray(b["sdf"])))
        merged = {k: np.concatenate([m[k] for m in all_m]) for k in all_m[0]}
        results[float(sigma)] = summarize(merged)
        print(f"[static] sigma={sigma}: solve_rate="
              f"{results[float(sigma)]['solve_rate']:.3f} contact_free="
              f"{results[float(sigma)]['contact_free_rate']:.3f}")
    with open(out_file, "w") as fp:
        yaml.safe_dump(results, fp)
    return results


def make_planner(t, lcfg_overrides, max_iters=50):
    spec = graph.GraphSpec(total_time_step=t)
    kw = dict(
        dynamics_mode="diag_identity", dropout_prob=0.1,
        static_init=(1.0, COV["cost_sigma"], COV["epsilon_dist"]),
    )
    kw.update(lcfg_overrides)
    lcfg = LearnedPlannerConfig(**kw)
    return LearnedDiffGPMP2Planner(
        spec, PointRobot2D(), gn.OptimConfig(reg=0.1, max_iters=max_iters),
        lcfg,
    )


_VAL_PLAN_JIT = {}


def _val_plan_jit(planner):
    """One jitted plan per planner instance: the eager call re-traces the
    full 50-iteration unrolled scan per val batch per eval epoch
    (tracing >> planning, see data/generate.py)."""
    fn = _VAL_PLAN_JIT.get(id(planner))
    if fn is None:
        fn = jax.jit(
            lambda v, p, th0, s, im: planner.plan(
                v, p, th0, s, im, max_iters=50, track_best=True
            )[0]
        )
        _VAL_PLAN_JIT[id(planner)] = fn
    return fn


def _val_solve_rate(planner, variables, spec, robot, val_batches):
    """Held-out-from-train solve rate for epoch selection (the metric the
    comparison is judged on; mirrors the reference's eval_epoch
    validation, ``train_planner.py:458-468``)."""
    plan_fn = _val_plan_jit(planner)
    rates = []
    for b in val_batches:
        params_fix = graph.default_params(
            spec, robot, jnp.asarray(b["start"]), jnp.asarray(b["goal"]),
            **COV, dtype=jnp.float32,
        )
        th0 = straight_line_traj(
            jnp.asarray(b["start"][:, :2]), jnp.asarray(b["goal"][:, :2]),
            spec.total_time_sec, spec.total_time_step,
        ).astype(jnp.float32)
        th = plan_fn(variables, params_fix, th0,
                     jnp.asarray(b["sdf"]), jnp.asarray(b["im"]))
        m = evaluate_batch(spec, robot, params_fix, th,
                           jnp.asarray(b["th_opt"]), jnp.asarray(b["sdf"]))
        rates.append(~m["in_coll"].astype(bool))
    return float(np.mean(np.concatenate(rates)))


def train_config(name, w_over, lcfg_over, roots, args, out_dir):
    w_over = dict(w_over)
    alpha = w_over.pop("_alpha", args.alpha)  # per-config LR override
    ckpt = os.path.join(out_dir, f"{name}_vars.npz")
    planner = make_planner(args.t, lcfg_over)
    spec, robot = planner.spec, planner.robot
    dataset = ds.PlanningDatasetMulti(roots, mode="train",
                                      label_subdir="opt_trajs_gpmp2")
    # 90/10 train/val split (val only for epoch selection, never the test
    # split).
    all_idxs = np.random.default_rng(123).permutation(len(dataset))
    n_val = max(args.batch, len(all_idxs) // 10)
    n_val -= n_val % args.batch
    val_idxs, idxs = all_idxs[:n_val], all_idxs[n_val:]
    val_batches = list(ds.as_batches(dataset, val_idxs, args.batch,
                                     drop_remainder=True))
    rng_np = np.random.default_rng(1)

    tx = make_optimizer("adam", {"alpha": alpha})
    weights = LossWeights(**w_over)
    tcfg = TrainConfig(T=args.unroll, tk=args.tk, use_inter_loss=True)
    train_step = make_train_step(planner, tx, weights, tcfg)

    sample = next(ds.as_batches(dataset, idxs, args.batch))
    sample = {k: jnp.asarray(v) for k, v in sample.items()}
    sample["cov_scalars"] = COV
    rng = jax.random.PRNGKey(0)
    state = init_train_state(
        planner, tx,
        rng, planner.stack_inputs(sample["im"], sample["sdf"]),
        sample["th_opt"],
    )
    gate_file = os.path.join(out_dir, f"{name}_gate.yaml")

    def val_gate_opponent():
        """Static val baseline for the selection gate (VERDICT r3 item 6):
        the best-of-9-sigmas static planner evaluated on the SAME val split
        the learned checkpoint is selected on.  Cached once per out_dir —
        the val split is deterministic (rng 123) so every config shares it.
        Computed only when a gate record is actually produced (training, or
        regenerating a missing gate): a checkpoint-resume with a gate file
        must not pay the full sweep (advisor r4)."""
        sv = static_sweep(spec, robot, val_batches,
                          os.path.join(out_dir, "static_val.yaml"))
        sv_sigma = max(sv, key=lambda s: (sv[s]["solve_rate"],
                                          sv[s]["contact_free_rate"]))
        return float(sv_sigma), float(sv[sv_sigma]["solve_rate"])

    if os.path.exists(ckpt):
        state = state.replace(
            variables=checkpoints.load_flat_variables(ckpt, state.variables)
        )
        if os.path.exists(gate_file):
            with open(gate_file) as fp:
                gate = yaml.safe_load(fp)
            print(f"[train:{name}] loaded checkpoint, skipping training")
        else:
            # Pre-gate checkpoint: regenerate the gate record from the
            # loaded variables instead of silently emitting a table with no
            # selected row (advisor r4).
            print(f"[train:{name}] loaded checkpoint with NO gate record — "
                  "regenerating the val gate from the loaded variables")
            sv_sigma, static_val = val_gate_opponent()
            rate = _val_solve_rate(planner, state.variables, spec, robot,
                                   val_batches)
            gate = {"learned_val_solve": float(rate),
                    "static_val_solve": static_val,
                    "static_val_sigma": sv_sigma,
                    "selected": "learned" if rate > static_val else "static"}
            with open(gate_file, "w") as fp:
                yaml.safe_dump(gate, fp)
            print(f"[train:{name}] regenerated gate: learned val "
                  f"{rate:.3f} vs static val {static_val:.3f} "
                  f"(sigma {sv_sigma}) -> {gate['selected']}")
        return planner, state, gate

    sv_sigma, static_val = val_gate_opponent()
    print(f"[train:{name}] {len(idxs)} problems, batch {args.batch}, "
          f"{args.epochs} epochs")
    hist = []
    best_rate = _val_solve_rate(planner, state.variables, spec, robot,
                                val_batches)
    best_vars = state.variables
    print(f"[train:{name}] epoch -1 (init): val solve_rate={best_rate:.3f}")
    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        for b in ds.as_batches(dataset, idxs, args.batch, rng=rng_np,
                               drop_remainder=True):
            b = {k: jnp.asarray(v) for k, v in b.items()}
            b["cov_scalars"] = COV
            state, m = train_step(state, b,
                                  jax.random.fold_in(rng, int(state.step)))
            losses.append(float(m["loss"]))
        hist.append(float(np.mean(losses)))
        if (epoch + 1) % args.eval_every == 0 or epoch == args.epochs - 1:
            rate = _val_solve_rate(planner, state.variables, spec, robot,
                                   val_batches)
            tag = ""
            if rate > best_rate:
                best_rate, best_vars = rate, state.variables
                tag = " *best*"
            print(f"[train:{name}] epoch {epoch}: loss={hist[-1]:.4f} "
                  f"val solve_rate={rate:.3f}{tag} ({time.time() - t0:.1f}s)")
        elif epoch % 10 == 0:
            print(f"[train:{name}] epoch {epoch}: loss={hist[-1]:.4f} "
                  f"({time.time() - t0:.1f}s)")
    state = state.replace(variables=best_vars)
    # Val gate: the learned checkpoint is "selected" only when it beats
    # the static val baseline on the same split; otherwise the campaign
    # emits the static config as the selected model (the learned row is
    # still reported for honesty).
    gate = {"learned_val_solve": float(best_rate),
            "static_val_solve": float(static_val),
            "static_val_sigma": sv_sigma,
            "selected": "learned" if best_rate > static_val else "static"}
    print(f"[train:{name}] selected val solve_rate={best_rate:.3f}; gate "
          f"vs static val {static_val:.3f} (sigma {sv_sigma}) -> "
          f"{gate['selected']}")
    checkpoints.save_flat_variables(ckpt, state.variables)
    with open(gate_file, "w") as fp:
        yaml.safe_dump(gate, fp)
    with open(os.path.join(out_dir, f"{name}_train_loss.yaml"), "w") as fp:
        yaml.safe_dump(hist, fp)
    return planner, state, gate


def eval_learned(planner, state, spec, robot, test_batches):
    plan_jit = jax.jit(
        lambda v, p, th0, s, im: planner.plan(v, p, th0, s, im, max_iters=50,
                                              track_best=True)[0]
    )
    all_m = []
    for b in test_batches:
        start, goal = jnp.asarray(b["start"]), jnp.asarray(b["goal"])
        params_fix = graph.default_params(
            spec, robot, start, goal, **COV, dtype=jnp.float32,
        )
        th0 = straight_line_traj(
            start[:, :2], goal[:, :2], spec.total_time_sec,
            spec.total_time_step,
        ).astype(jnp.float32)
        th = plan_jit(state.variables, params_fix, th0,
                      jnp.asarray(b["sdf"]), jnp.asarray(b["im"]))
        all_m.append(evaluate_batch(spec, robot, params_fix, th,
                                    jnp.asarray(b["th_opt"]),
                                    jnp.asarray(b["sdf"])))
    merged = {k: np.concatenate([m[k] for m in all_m]) for k in all_m[0]}
    return summarize(merged)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--families", nargs="+", default=["multi_obs", "forest"])
    p.add_argument("--num_train", type=int, default=250)
    p.add_argument("--num_test", type=int, default=40)
    p.add_argument("--probs", type=int, default=4)
    p.add_argument("--t", type=int, default=100)
    p.add_argument("--epochs", type=int, default=80)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--alpha", type=float, default=3e-4)
    p.add_argument("--unroll", type=int, default=10)
    p.add_argument("--tk", type=int, default=5)
    p.add_argument("--eval_every", type=int, default=10)
    p.add_argument("--configs", nargs="+", default=list(CONFIGS))
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    roots = gen_data(args.out, args.families, args.num_train, args.num_test,
                     args.probs, args.t)
    spec = graph.GraphSpec(total_time_step=args.t)
    robot = PointRobot2D()
    test_batches = load_test_batches(roots, args.batch)
    print(f"[eval] {len(test_batches)} test batches of {args.batch}")

    static = static_sweep(spec, robot, test_batches,
                          os.path.join(args.out, "static_sensitivity.yaml"))
    best_sigma = max(static, key=lambda s: (static[s]["solve_rate"],
                                            static[s]["contact_free_rate"]))
    print(f"[static] best sigma={best_sigma}: {static[best_sigma]}")

    # Per-family breakdown for multi-family (generalist) runs: each family
    # is judged against ITS OWN best static sigma — the strongest per-family
    # opponent, stricter than the pooled best.
    by_family = {}
    fam_batches = {}
    if len(roots) > 1:
        # One batch per family when it fits: covers every test problem
        # (batch-sized chunking would drop the remainder).
        fam_bs = min(512, args.num_test * args.probs)
        for fam, root in zip(args.families, roots):
            fam_batches[fam] = load_family_batches(root, fam_bs)
            fam_static = static_sweep(
                spec, robot, fam_batches[fam],
                os.path.join(args.out, f"static_sensitivity_{fam}.yaml"))
            fb = max(fam_static, key=lambda s: (fam_static[s]["solve_rate"],
                                                fam_static[s]["contact_free_rate"]))
            by_family[fam] = {"static_best": {"sigma": fb, **fam_static[fb]}}
            print(f"[static:{fam}] best sigma={fb}: "
                  f"solve_rate={fam_static[fb]['solve_rate']:.3f}")

    # Merge with earlier runs so incremental --configs invocations extend
    # the same results table instead of overwriting it.
    results_file = os.path.join(args.out, "results.yaml")
    results = {}
    if os.path.exists(results_file):
        with open(results_file) as fp:
            results = yaml.safe_load(fp) or {}
    results["static_best"] = {"sigma": best_sigma, **static[best_sigma]}
    by_family_file = os.path.join(args.out, "results_by_family.yaml")
    if os.path.exists(by_family_file):
        with open(by_family_file) as fp:
            prev = yaml.safe_load(fp) or {}
        for fam, rows in prev.items():
            by_family.setdefault(fam, {}).update(
                {k: v for k, v in rows.items() if k not in by_family[fam]})
    for name in args.configs:
        w_over, lcfg_over = CONFIGS[name]
        planner, state, gate = train_config(name, w_over, lcfg_over, roots,
                                            args, args.out)
        summary = eval_learned(planner, state, spec, robot, test_batches)
        if gate is not None:
            summary["val_gate"] = gate
        results[name] = summary
        print(f"[eval:{name}] {json.dumps(summary)}")
        with open(os.path.join(args.out, "results.yaml"), "w") as fp:
            yaml.safe_dump(results, fp)
        for fam, batches in fam_batches.items():
            fam_summary = eval_learned(planner, state, spec, robot, batches)
            by_family[fam][name] = fam_summary
            print(f"[eval:{name}:{fam}] solve_rate="
                  f"{fam_summary['solve_rate']:.3f} contact_free="
                  f"{fam_summary['contact_free_rate']:.3f}")
        if by_family:
            with open(by_family_file, "w") as fp:
                yaml.safe_dump(by_family, fp)

    # Markdown table for PERFORMANCE.md.
    keys = ["solve_rate", "contact_free_rate", "avg_gp_error",
            "avg_sg_error", "avg_max_penetration", "avg_coll_intensity",
            "avg_pos_mse"]
    lines = ["| config | " + " | ".join(keys) + " |",
             "|---|" + "---|" * len(keys)]
    for name, r in results.items():
        lines.append(
            f"| {name} | " + " | ".join(f"{r.get(k, float('nan')):.4f}"
                                        for k in keys) + " |"
        )
    table = "\n".join(lines)
    with open(os.path.join(args.out, "table.md"), "w") as fp:
        fp.write(table + "\n")
    print(table)

    if by_family:
        fams = list(by_family)
        cfg_rows = sorted({c for rows in by_family.values() for c in rows})
        cfg_rows = (["static_best"]
                    + [c for c in cfg_rows if c != "static_best"])
        blocks = []
        for metric in ("solve_rate", "contact_free_rate"):
            lines = [f"**{metric}** (one generalist model; static_best = "
                     "each family's own best sigma)", "",
                     "| config | " + " | ".join(fams) + " |",
                     "|---|" + "---|" * len(fams)]
            for c in cfg_rows:
                cells = [f"{by_family[f][c][metric]:.4f}"
                         if c in by_family[f] else "—" for f in fams]
                lines.append(f"| {c} | " + " | ".join(cells) + " |")
            blocks.append("\n".join(lines))
        fam_table = "\n\n".join(blocks)
        with open(os.path.join(args.out, "per_family.md"), "w") as fp:
            fp.write(fam_table + "\n")
        print(fam_table)


if __name__ == "__main__":
    main()
