#!/usr/bin/env python
"""Learned covariances in 3-D: train ConvEncoder3D end-to-end and compare
against the best static sigma — the 2-D campaign protocol
(``learned_campaign.py``) on voxel worlds.  No reference analog (the
reference is planar); this certifies that the differentiable-planning
learning loop, not just the forward pass, works one dimension up.

Protocol (mirrors the 2-D eps_bounded recipe):
  1. Seeded 3-D datasets (``data/generate3d.py``): train + test splits.
  2. Static sigma sweep on the test split -> per-dataset best static.
  3. Train the bounded-eps model (learn_eps, eps = eps_max·sigmoid,
     static_init at the sweep winner, task-only loss) with the TBPTT
     step; checkpoint = best-val-solve-rate epoch (90/10 env split).
  4. Straight-seed eval of learned vs static-best on the held-out test
     split, canonical-margin judging (``plan3d_sweep.judge``).

Usage:
  python tools/learn3d_campaign.py --out runs/learn3d --family boxes3d \
      --num_train 60 --num_test 16 --epochs 10
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("DGPMP2_CPU", "0") == "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(__file__), "..", ".jax_cache")),
)

import jax.numpy as jnp
import numpy as np
import yaml

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.data import generate3d
from dgpmp2_tpu.learn.learned_planner import (LearnedDiffGPMP2Planner,
                                              LearnedPlannerConfig)
from dgpmp2_tpu.learn.train import (LossWeights, TrainConfig,
                                    init_train_state, make_train_step,
                                    make_optimizer)
from dgpmp2_tpu.robots import PointRobot3D
from dgpmp2_tpu.utils.trajectory import straight_line_traj

from plan3d_sweep import judge  # geometric canonical-margin judging

LIMS = (-5.0, 5.0)
SIZE = 32          # default; --size (multiple of 16 for the 4 pool stages)
T = 20             # default; --t
EPS = 0.4
SIGMAS = (0.01, 0.02, 0.05, 0.1)
COV = dict(qc_inv=np.eye(3), cost_sigma=0.05, epsilon_dist=EPS,
           k_s=0.01, k_g=0.01)


def load_batches(root, batch_size):
    probs = list(generate3d.load_split3d(root))
    n = len(probs) - len(probs) % batch_size
    batches = []
    for i in range(0, n, batch_size):
        chunk = probs[i : i + batch_size]
        vox = np.stack([c[0] for c in chunk])
        batches.append({
            "im": jnp.asarray(vox, jnp.float32),
            "sdf": jnp.asarray(np.stack([c[1] for c in chunk]), jnp.float32),
            "start": jnp.asarray(np.stack([c[2] for c in chunk]), jnp.float32),
            "goal": jnp.asarray(np.stack([c[3] for c in chunk]), jnp.float32),
            "th_opt": jnp.asarray(np.stack([c[4] for c in chunk]),
                                  jnp.float32),
            "cov_scalars": {k: jnp.asarray(v, jnp.float32)
                            if hasattr(v, "shape") else v
                            for k, v in COV.items()},
        })
    return batches


def plan_static(spec, robot, batch, sigma):
    params = graph.default_params(
        spec, robot, batch["start"], batch["goal"], **dict(COV,
        cost_sigma=sigma), dtype=jnp.float32)
    th0 = straight_line_traj(batch["start"][:, :3], batch["goal"][:, :3],
                             spec.total_time_sec, T).astype(jnp.float32)
    cfg = gn.OptimConfig(reg=0.1, max_iters=50, method="lm")
    return gn.plan(spec, robot, params, th0, batch["sdf"], cfg,
                   track_best=True).best_th


def eval_rates(spec, robot, th, batch, res):
    solve, cf, sm = judge(spec, robot, th, batch["sdf"], res)
    return solve, cf, sm


def main(argv=None):
    global SIZE, T
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--family", default="boxes3d")
    p.add_argument("--num_train", type=int, default=60)
    p.add_argument("--num_test", type=int, default=16)
    p.add_argument("--probs", type=int, default=4)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=SIZE)
    p.add_argument("--t", type=int, default=T)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--loss", default="task", choices=("task", "anchor"),
                   help="task: task-only ext loss (2-D eps_bounded recipe); "
                        "anchor: + mild expert-MSE term (2-D eps_anchor, "
                        "the dominant 2-D config)")
    args = p.parse_args(argv)
    SIZE, T = args.size, args.t
    if SIZE % 16:
        raise SystemExit("--size must be a multiple of 16 (4 pool stages)")
    os.makedirs(args.out, exist_ok=True)
    res = (LIMS[1] - LIMS[0]) / SIZE

    # -- data ---------------------------------------------------------------
    for split, n, seed in (("train", args.num_train, args.seed),
                           ("test", args.num_test, args.seed + 1)):
        d = os.path.join(args.out, f"data_{split}")
        if not os.path.exists(os.path.join(d, "meta.yaml")):
            print(f"[data] {split}: {n} envs", flush=True)
            generate3d.generate_split3d(
                d, n, args.probs, args.family, SIZE,
                np.random.default_rng(seed), t=T, max_iters=40,
                cov_scalars=dict(COV))
    train_b = load_batches(os.path.join(args.out, "data_train"), args.batch)
    test_b = load_batches(os.path.join(args.out, "data_test"), args.batch)
    n_val = max(1, len(train_b) // 10)
    val_b, train_b = train_b[:n_val], train_b[n_val:]

    robot = PointRobot3D()
    spec = graph.GraphSpec(dof=3, state_dim=6, total_time_step=T,
                           x_lims=LIMS, y_lims=LIMS, z_lims=LIMS)

    # -- static sweeps -------------------------------------------------------
    # Test-split sweep: the best-of-sweep ORACLE opponent row (the
    # reference's test_dataset_sensitivity.py semantics — an upper bound
    # the learned model is reported against, never selected from).
    def sweep(batches, tag):
        rows = {}
        for sigma in SIGMAS:
            sol, cf = [], []
            for b in batches:
                s, c, _ = eval_rates(
                    spec, robot, plan_static(spec, robot, b, sigma), b, res)
                sol.append(s), cf.append(c)
            rows[sigma] = {
                "solve_rate": float(np.concatenate(sol).mean()),
                "contact_free_rate": float(np.concatenate(cf).mean())}
            print(f"[static:{tag}] sigma={sigma}: {rows[sigma]}", flush=True)
        return rows

    static_rows = sweep(test_b, "test")
    best_sigma = max(static_rows, key=lambda s: static_rows[s]["solve_rate"])
    # Val-split sweep: everything that feeds SELECTION (the training init
    # and the gate's static opponent) is chosen on val only — a test-tuned
    # static sigma in the gate would leak the test split into the very
    # mechanism meant to make selection honest.
    static_val_rows = sweep(val_b, "val")
    sv_sigma = max(static_val_rows,
                   key=lambda s: (static_val_rows[s]["solve_rate"],
                                  static_val_rows[s]["contact_free_rate"]))
    static_val_solve = static_val_rows[sv_sigma]["solve_rate"]

    # -- train ---------------------------------------------------------------
    # Both arms run LM: fixed-damping GN collapses on dense worlds
    # (measured: contact-free 0.16 GN vs 1.0 LM on 48³ columns), so the
    # learned planner uses the same accept/reject schedule as the static
    # opponent and initializes at the true sweep winner.  dropout 0.1 and
    # alpha 1e-4 follow the 2-D campaign lessons (eps_bounded_lr1).
    lcfg = LearnedPlannerConfig(
        dynamics_mode="diag_identity", learn_eps=True, eps_max=2 * EPS,
        dropout_prob=0.1, static_init=(1.0, sv_sigma, EPS))
    planner = LearnedDiffGPMP2Planner(
        spec, robot, gn.OptimConfig(reg=0.1, max_iters=50, method="lm"),
        lcfg)
    weights = LossWeights(
        pos_loss_weight=0.05 if args.loss == "anchor" else 0.0,
        ext_loss_weight=1.0, ext_obs_lambda=5.0)
    tx = make_optimizer("adam", {"alpha": 1e-4})
    tcfg = TrainConfig(T=10, tk=5)
    train_step = make_train_step(planner, tx, weights, tcfg)
    b0 = train_b[0]
    state = init_train_state(
        planner, tx, jax.random.PRNGKey(args.seed),
        planner.stack_inputs(b0["im"], b0["sdf"]), b0["th_opt"])

    plan_jit = jax.jit(lambda v, pf, th0, s, im: planner.plan(
        v, pf, th0, s, im, max_iters=50, track_best=True)[0])

    def learned_rates(variables, batches):
        sol, cf = [], []
        for b in batches:
            pf = graph.default_params(spec, robot, b["start"], b["goal"],
                                      **COV, dtype=jnp.float32)
            th0 = straight_line_traj(b["start"][:, :3], b["goal"][:, :3],
                                     spec.total_time_sec, T
                                     ).astype(jnp.float32)
            th = plan_jit(variables, pf, th0, b["sdf"], b["im"])
            s, c, _ = eval_rates(spec, robot, th, b, res)
            sol.append(s), cf.append(c)
        return (float(np.concatenate(sol).mean()),
                float(np.concatenate(cf).mean()))

    # The gate (VERDICT r3 item 6): the learned checkpoint is selected only
    # when its val solve rate beats the static baseline on the SAME val
    # split; otherwise the emitted model is the static config — "learned
    # never regresses" becomes a selection property, not a per-family
    # gamble.  Matches the reference's best-static-baseline comparison
    # semantics (test_dataset_sensitivity.py:270), applied at selection
    # time instead of reporting time.  The static opponent's sigma is
    # val-chosen (sv_sigma, sweep above) so the gate never sees the test
    # split.
    print(f"[gate] static (val-chosen sigma {sv_sigma}) val solve_rate="
          f"{static_val_solve:.3f}", flush=True)

    best = (-1.0, None, -1)
    history = []
    rng = np.random.default_rng(args.seed)
    for epoch in range(args.epochs):
        order = rng.permutation(len(train_b))
        losses = []
        for j, k in enumerate(order):
            state, metrics = train_step(
                state, train_b[k],
                jax.random.PRNGKey(args.seed + epoch * 1000 + j))
            losses.append(float(metrics["loss"]))
        v_solve, v_cf = learned_rates(state.variables, val_b)
        history.append({"epoch": epoch, "loss": float(np.mean(losses)),
                        "val_solve": v_solve, "val_cf": v_cf})
        print(f"[train] epoch {epoch}: loss {np.mean(losses):.4f} "
              f"val_solve {v_solve:.3f} val_cf {v_cf:.3f}", flush=True)
        if v_solve > best[0]:
            best = (v_solve, jax.tree.map(lambda x: np.asarray(x),
                                          state.variables), epoch)

    # -- final eval ------------------------------------------------------------
    var_best = jax.tree.map(jnp.asarray, best[1])
    t_solve, t_cf = learned_rates(var_best, test_b)
    use_learned = best[0] > static_val_solve
    bs = static_rows[best_sigma]
    # The selected-static row reports the VAL-chosen sigma's test metrics —
    # reporting the test-tuned best_sigma here would leak the test split
    # through the gate (advisor r4, medium).
    sv = static_rows[sv_sigma]
    sel_solve, sel_cf = ((t_solve, t_cf) if use_learned
                         else (sv["solve_rate"], sv["contact_free_rate"]))
    print(f"[gate] learned val {best[0]:.3f} vs static val "
          f"{static_val_solve:.3f} (sigma {sv_sigma}) -> selected="
          f"{'learned' if use_learned else 'static'}", flush=True)
    results = {
        "static": {str(k): v for k, v in static_rows.items()},
        "static_val": {str(k): v for k, v in static_val_rows.items()},
        "best_sigma": float(best_sigma),
        "learned": {"solve_rate": t_solve, "contact_free_rate": t_cf,
                    "val_epoch": int(best[2]), "loss": args.loss},
        "gate": {"learned_val_solve": float(best[0]),
                 "static_val_solve": static_val_solve,
                 "static_val_sigma": float(sv_sigma),
                 "selected": "learned" if use_learned else "static"},
        "selected": {"solve_rate": sel_solve, "contact_free_rate": sel_cf},
        "history": history,
    }
    with open(os.path.join(args.out, "results.yaml"), "w") as fp:
        yaml.safe_dump(results, fp)
    table = "\n".join([
        f"# 3-D learned covariances — {args.family}, {SIZE}³, "
        f"{args.num_train}+{args.num_test} envs x {args.probs}, "
        f"{args.epochs} epochs (val-selected epoch {best[2]})",
        "",
        f"Regenerate: `python tools/learn3d_campaign.py --out {args.out} "
        f"--family {args.family} --num_train {args.num_train} "
        f"--num_test {args.num_test} --epochs {args.epochs} "
        f"--seed {args.seed} --size {SIZE} --t {T} --loss {args.loss}`",
        "",
        "| config | solve_rate | contact_free_rate |",
        "|---|---|---|",
        f"| static_best (test-oracle sigma {best_sigma}) | "
        f"{bs['solve_rate']:.4f} | {bs['contact_free_rate']:.4f} |",
        f"| static val-chosen (sigma {sv_sigma}) | {sv['solve_rate']:.4f} | "
        f"{sv['contact_free_rate']:.4f} |",
        f"| eps_bounded-3d ({args.loss} loss, one model) | "
        f"{t_solve:.4f} | {t_cf:.4f} |",
        f"| **selected** (val gate: learned {best[0]:.3f} vs static "
        f"{static_val_solve:.3f} @ sigma {sv_sigma} -> "
        f"{'learned' if use_learned else 'static'}) | **{sel_solve:.4f}** | "
        f"**{sel_cf:.4f}** |",
        "",
    ])
    with open(os.path.join(args.out, "table.md"), "w") as fp:
        fp.write(table)
    print(table)


if __name__ == "__main__":
    main()
