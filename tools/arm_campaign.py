#!/usr/bin/env python
"""Learned-vs-static campaign on the articulated planar arm.

The point-robot campaigns (tools/learned_campaign.py) prove the learned
covariances beat the best static sigma; this tool shows the SAME learning
stack is robot-generic: joint-space GP prior, FK collision spheres along
both links, the obstacle factor chaining through the FK Jacobian
(robots.PlanarArm2Link) — none of the learning code changes.  The
reference cannot run this experiment at all: it ships no articulated
robot (SURVEY.md §2.4 — `robot_models/robot_model.py:5-15` names FK as
the extension point but only point robots exist).

Pipeline (all on one chip):
  1. generate arm problems: random box worlds in the reachable annulus,
     rejection-sampled collision-free joint start/goal configs, expert
     labels from the framework's own multi-start planner (K seeds,
     contact-free winners only)
  2. static-covariance sensitivity sweep on the held-out test split
  3. train learned configs (eps_bounded recipe from the point campaigns)
  4. evaluate on the test split with the reference metric suite

Usage:
  python tools/arm_campaign.py --out runs/arm_campaign
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

from dgpmp2_tpu.core import gn, graph, multistart
from dgpmp2_tpu.learn import checkpoints
from dgpmp2_tpu.learn.eval import evaluate_batch, summarize
from dgpmp2_tpu.learn.learned_planner import (
    LearnedDiffGPMP2Planner, LearnedPlannerConfig,
)
from dgpmp2_tpu.learn.losses import LossWeights
from dgpmp2_tpu.learn.train import (
    TrainConfig, init_train_state, make_optimizer, make_train_step,
)
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import PlanarArm2Link
from dgpmp2_tpu.utils.trajectory import straight_line_traj

LIMS = (-5.0, 5.0)
IM = 128
RES = (LIMS[1] - LIMS[0]) / IM
ARM = PlanarArm2Link(link_lengths=(2.5, 2.0), spheres_per_link=3,
                     sphere_radii=(0.25,) * 6)
COV = dict(qc_inv=np.eye(2), cost_sigma=0.05, epsilon_dist=0.2,
           k_s=0.01, k_g=0.01)
SIGMAS = [0.01, 0.02, 0.05, 0.1, 0.2, 0.5, 1.0, 2.0, 5.0]
T_STEP = 40


def fk_np(q):
    """Numpy FK for rejection sampling: (..., 2) joints -> (..., 6, 2)."""
    l1, l2 = ARM.link_lengths
    n = ARM.spheres_per_link
    fr = (np.arange(n) + 1.0) / n
    q1, q12 = q[..., 0], q[..., 0] + q[..., 1]
    e1 = np.stack([np.cos(q1), np.sin(q1)], -1)  # (..., 2)
    e2 = np.stack([np.cos(q12), np.sin(q12)], -1)
    link1 = fr[:, None] * l1 * e1[..., None, :]            # (..., n, 2)
    link2 = l1 * e1[..., None, :] + fr[:, None] * l2 * e2[..., None, :]
    return np.concatenate([link1, link2], axis=-2)


def world_to_pix(pts):
    """(..., 2) world xy -> (row, col) float pixel coords (y flipped)."""
    col = (pts[..., 0] - LIMS[0]) / RES
    row = (-LIMS[0] - pts[..., 1]) / RES
    return row, col


def gen_world(rng):
    """One random box world in the arm's reachable annulus."""
    img = np.ones((IM, IM), np.float32)
    placed, tries = 0, 0
    want = rng.integers(3, 6)
    while placed < want and tries < 60:
        tries += 1
        cx, cy = rng.uniform(-4.2, 4.2, 2)
        r = np.hypot(cx, cy)
        if not (1.8 <= r <= 4.2):
            continue
        w, h = rng.uniform(0.7, 1.6, 2)
        # keep a clear disc around the base so link-1 isn't born in contact
        corners = np.array([[cx - w / 2, cy - h / 2], [cx + w / 2, cy + h / 2]])
        if np.min(np.hypot(*np.meshgrid(corners[:, 0], corners[:, 1]))) < 1.1:
            continue
        r0, c0 = world_to_pix(np.array([cx - w / 2, cy + h / 2]))
        r1, c1 = world_to_pix(np.array([cx + w / 2, cy - h / 2]))
        rr0, rr1 = int(max(0, r0)), int(min(IM, r1))
        cc0, cc1 = int(max(0, c0)), int(min(IM, c1))
        if rr1 <= rr0 or cc1 <= cc0:
            continue
        img[rr0:rr1, cc0:cc1] = 0.0
        placed += 1
    return img


def sample_config(rng, sdf_np, margin, avoid=None, min_dist=1.2, tries=200):
    """Rejection-sample one collision-free joint config against a numpy
    SDF (nearest-pixel clearance — generous margin absorbs the
    approximation)."""
    for _ in range(tries):
        q = np.array([rng.uniform(-np.pi, np.pi), rng.uniform(-2.4, 2.4)])
        if avoid is not None and np.linalg.norm(q - avoid) < min_dist:
            continue
        centers = fk_np(q)  # (6, 2)
        row, col = world_to_pix(centers)
        ri = np.clip(np.round(row).astype(int), 0, IM - 1)
        ci = np.clip(np.round(col).astype(int), 0, IM - 1)
        if np.min(sdf_np[ri, ci]) > margin:
            return q
    return None


def gen_problems(n, seed, spec, chunk=512, restarts=8, amp=1.2):
    """Generate ``n`` expert-labeled arm problems (per-problem worlds)."""
    rng = np.random.default_rng(seed)
    margin = ARM.sphere_radii[0] + COV["epsilon_dist"] + 0.06
    cfg = gn.OptimConfig(reg=0.1, max_iters=60, method="lm")
    ms_rng = jax.random.PRNGKey(seed)

    out = {k: [] for k in ("im", "sdf", "start", "goal", "th_opt")}
    kept = 0
    while kept < n:
        ims, starts, goals = [], [], []
        while len(ims) < chunk:
            img = gen_world(rng)
            sdf_np = np.asarray(
                sdf_ops.sdf_from_occupancy(jnp.asarray(img)[None], res=RES)[0]
            )
            qs = sample_config(rng, sdf_np, margin)
            if qs is None:
                continue
            qg = sample_config(rng, sdf_np, margin, avoid=qs)
            if qg is None:
                continue
            ims.append(img)
            starts.append(np.concatenate([qs, [0.0, 0.0]]))
            goals.append(np.concatenate([qg, [0.0, 0.0]]))
        imb = jnp.asarray(np.stack(ims))
        sdfb = sdf_ops.sdf_from_occupancy(imb, res=RES)
        startb = jnp.asarray(np.stack(starts), jnp.float32)
        goalb = jnp.asarray(np.stack(goals), jnp.float32)
        params = graph.default_params(spec, ARM, startb, goalb, **COV,
                                      dtype=jnp.float32)
        th0 = straight_line_traj(startb[:, :2], goalb[:, :2],
                                 spec.total_time_sec,
                                 spec.total_time_step).astype(jnp.float32)
        res = multistart.plan_multistart(spec, ARM, params, th0, sdfb, cfg,
                                         ms_rng, restarts=restarts, amp=amp)
        ms_rng = jax.random.fold_in(ms_rng, kept)
        ok = np.asarray(res.contact_free) & np.isfinite(
            np.asarray(res.th).reshape(len(ims), -1)).all(-1)
        print(f"[gen] chunk: expert solved {ok.sum()}/{len(ims)}", flush=True)
        out["im"].append(np.stack(ims)[ok])
        out["sdf"].append(np.asarray(sdfb)[ok])
        out["start"].append(np.stack(starts)[ok].astype(np.float32))
        out["goal"].append(np.stack(goals)[ok].astype(np.float32))
        out["th_opt"].append(np.asarray(res.th)[ok])
        kept += int(ok.sum())
    return {k: np.concatenate(v)[:n] for k, v in out.items()}


def as_batches(data, idxs, bs, rng=None):
    if rng is not None:
        idxs = rng.permutation(idxs)
    for i in range(0, len(idxs) - bs + 1, bs):
        sel = idxs[i:i + bs]
        yield {k: v[sel] for k, v in data.items()}


def static_sweep(spec, test, bs, out_file):
    if os.path.exists(out_file):
        with open(out_file) as fp:
            return yaml.safe_load(fp)
    cfg = gn.OptimConfig(reg=0.1, max_iters=50)
    plan_jit = jax.jit(
        lambda p, th0, s: gn.plan(spec, ARM, p, th0, s, cfg,
                                  track_best=True).best_th
    )
    results = {}
    for sigma in SIGMAS:
        cov = dict(COV, cost_sigma=sigma)
        all_m = []
        for b in as_batches(test, np.arange(len(test["im"])), bs):
            start, goal = jnp.asarray(b["start"]), jnp.asarray(b["goal"])
            params = graph.default_params(spec, ARM, start, goal, **cov,
                                          dtype=jnp.float32)
            th0 = straight_line_traj(start[:, :2], goal[:, :2],
                                     spec.total_time_sec,
                                     spec.total_time_step).astype(jnp.float32)
            th = plan_jit(params, th0, jnp.asarray(b["sdf"]))
            params_eval = graph.default_params(spec, ARM, start, goal, **COV,
                                               dtype=jnp.float32)
            all_m.append(evaluate_batch(spec, ARM, params_eval, th,
                                        jnp.asarray(b["th_opt"]),
                                        jnp.asarray(b["sdf"])))
        merged = {k: np.concatenate([m[k] for m in all_m]) for k in all_m[0]}
        results[float(sigma)] = summarize(merged)
        print(f"[static] sigma={sigma}: solve="
              f"{results[float(sigma)]['solve_rate']:.3f} contact_free="
              f"{results[float(sigma)]['contact_free_rate']:.3f}", flush=True)
    with open(out_file, "w") as fp:
        yaml.safe_dump(results, fp)
    return results


def _val_rates(planner, variables, spec, val_batches, plan_fn):
    solves, cfree = [], []
    for b in val_batches:
        start, goal = jnp.asarray(b["start"]), jnp.asarray(b["goal"])
        params = graph.default_params(spec, ARM, start, goal, **COV,
                                      dtype=jnp.float32)
        th0 = straight_line_traj(start[:, :2], goal[:, :2],
                                 spec.total_time_sec,
                                 spec.total_time_step).astype(jnp.float32)
        th = plan_fn(variables, params, th0, jnp.asarray(b["sdf"]),
                     jnp.asarray(b["im"]))
        m = evaluate_batch(spec, ARM, params, th, jnp.asarray(b["th_opt"]),
                           jnp.asarray(b["sdf"]))
        solves.append(~m["in_coll"].astype(bool))
        cfree.append(~m["in_contact"].astype(bool))
    return (float(np.mean(np.concatenate(solves))),
            float(np.mean(np.concatenate(cfree))))


def train_config(name, w_over, lcfg_over, train, args, out_dir):
    w_over = dict(w_over)
    alpha = w_over.pop("_alpha", args.alpha)
    ckpt = os.path.join(out_dir, f"{name}_vars.npz")
    lcfg = LearnedPlannerConfig(
        dynamics_mode="diag_identity", dropout_prob=0.1, **lcfg_over)
    planner = LearnedDiffGPMP2Planner(
        graph.GraphSpec(total_time_step=T_STEP, nlinks=ARM.nlinks), ARM,
        gn.OptimConfig(reg=0.1, max_iters=50), lcfg,
    )
    spec = planner.spec
    rng_np = np.random.default_rng(123)
    all_idxs = rng_np.permutation(len(train["im"]))
    n_val = max(args.batch, len(all_idxs) // 10)
    n_val -= n_val % args.batch
    # Tiny-split guard: keep at least one training batch.
    n_val = min(n_val, len(all_idxs) - args.batch)
    val_idxs, idxs = all_idxs[:n_val], all_idxs[n_val:]
    if n_val <= 0:  # smoke runs: reuse the train batch for epoch selection
        val_idxs = idxs[:args.batch]
    val_batches = list(as_batches(train, val_idxs, args.batch))

    tx = make_optimizer("adam", {"alpha": alpha})
    train_step = make_train_step(planner, tx, LossWeights(**w_over),
                                 TrainConfig(T=args.unroll, tk=args.tk,
                                             use_inter_loss=True))
    plan_fn = jax.jit(
        lambda v, p, th0, s, im: planner.plan(v, p, th0, s, im, max_iters=50,
                                              track_best=True)[0]
    )

    sample = next(as_batches(train, idxs, args.batch))
    rng = jax.random.PRNGKey(0)
    state = init_train_state(
        planner, tx, rng,
        planner.stack_inputs(jnp.asarray(sample["im"]),
                             jnp.asarray(sample["sdf"])),
        jnp.asarray(sample["th_opt"]),
    )
    if os.path.exists(ckpt):
        state = state.replace(
            variables=checkpoints.load_flat_variables(ckpt, state.variables))
        print(f"[train:{name}] loaded checkpoint, skipping training")
        return planner, state

    best = _val_rates(planner, state.variables, spec, val_batches, plan_fn)
    best_vars = state.variables
    print(f"[train:{name}] {len(idxs)} problems; epoch -1 (init): "
          f"val solve={best[0]:.3f} cfree={best[1]:.3f}", flush=True)
    hist = []
    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        for b in as_batches(train, idxs, args.batch, rng=rng_np):
            batch = {k: jnp.asarray(v) for k, v in b.items()}
            batch["cov_scalars"] = COV
            state, m = train_step(state, batch,
                                  jax.random.fold_in(rng, int(state.step)))
            losses.append(float(m["loss"]))
        hist.append(float(np.mean(losses)))
        if (epoch + 1) % args.eval_every == 0 or epoch == args.epochs - 1:
            rates = _val_rates(planner, state.variables, spec, val_batches,
                               plan_fn)
            tag = ""
            if rates > best:
                best, best_vars, tag = rates, state.variables, " *best*"
            print(f"[train:{name}] epoch {epoch}: loss={hist[-1]:.4f} "
                  f"val solve={rates[0]:.3f} cfree={rates[1]:.3f}{tag} "
                  f"({time.time() - t0:.1f}s)", flush=True)
    state = state.replace(variables=best_vars)
    print(f"[train:{name}] selected val solve={best[0]:.3f} "
          f"cfree={best[1]:.3f}")
    checkpoints.save_flat_variables(ckpt, state.variables)
    with open(os.path.join(out_dir, f"{name}_train_loss.yaml"), "w") as fp:
        yaml.safe_dump(hist, fp)
    return planner, state


def eval_learned(planner, state, spec, test, bs):
    plan_jit = jax.jit(
        lambda v, p, th0, s, im: planner.plan(v, p, th0, s, im, max_iters=50,
                                              track_best=True)[0]
    )
    all_m = []
    for b in as_batches(test, np.arange(len(test["im"])), bs):
        start, goal = jnp.asarray(b["start"]), jnp.asarray(b["goal"])
        params = graph.default_params(spec, ARM, start, goal, **COV,
                                      dtype=jnp.float32)
        th0 = straight_line_traj(start[:, :2], goal[:, :2],
                                 spec.total_time_sec,
                                 spec.total_time_step).astype(jnp.float32)
        th = plan_jit(state.variables, params, th0, jnp.asarray(b["sdf"]),
                      jnp.asarray(b["im"]))
        all_m.append(evaluate_batch(spec, ARM, params, th,
                                    jnp.asarray(b["th_opt"]),
                                    jnp.asarray(b["sdf"])))
    merged = {k: np.concatenate([m[k] for m in all_m]) for k in all_m[0]}
    return summarize(merged)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--num_train", type=int, default=2048)
    p.add_argument("--num_test", type=int, default=512)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--alpha", type=float, default=3e-4)
    p.add_argument("--unroll", type=int, default=10)
    p.add_argument("--tk", type=int, default=5)
    p.add_argument("--eval_every", type=int, default=4)
    p.add_argument("--configs", nargs="+",
                   default=["eps_bounded", "eps_anchor"])
    args = p.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    spec = graph.GraphSpec(total_time_step=T_STEP, nlinks=ARM.nlinks)

    splits = {}
    for mode, n, seed in (("train", args.num_train, 0),
                          ("test", args.num_test, 777)):
        path = os.path.join(args.out, f"data_{mode}.npz")
        if os.path.exists(path):
            with np.load(path) as z:
                splits[mode] = {k: z[k] for k in z.files}
            print(f"[data] {mode}: loaded {len(splits[mode]['im'])}")
        else:
            t0 = time.time()
            splits[mode] = gen_problems(n, seed, spec)
            np.savez_compressed(path, **splits[mode])
            print(f"[data] {mode}: {n} problems in {time.time() - t0:.0f}s")

    static = static_sweep(spec, splits["test"], args.batch,
                          os.path.join(args.out, "static_sensitivity.yaml"))
    best_sigma = max(static, key=lambda s: (static[s]["solve_rate"],
                                            static[s]["contact_free_rate"]))
    print(f"[static] best sigma={best_sigma}: {static[best_sigma]}")

    eps_b = dict(learn_eps=True, eps_max=2 * COV["epsilon_dist"],
                 static_init=(1.0, float(best_sigma), COV["epsilon_dist"]))
    eps_a = dict(learn_eps=True,
                 static_init=(1.0, float(best_sigma), COV["epsilon_dist"]))
    task = dict(pos_loss_weight=0.0, ext_loss_weight=1.0, ext_obs_lambda=5.0)
    configs = {
        "eps_bounded": (task, eps_b),
        "eps_anchor": (dict(task, pos_loss_weight=0.05), eps_a),
        # At 3e-4 the arm losses oscillate (eps_bounded) or diverge
        # (eps_anchor) and epoch selection falls back to the init weights
        # — the same symptom the XL point campaign fixed with a lower
        # step size (PERFORMANCE.md "XL replication", eps_bounded_lr1).
        "eps_bounded_lr1": (dict(task, _alpha=1e-4), eps_b),
        "eps_bounded_lr2": (dict(task, _alpha=3e-5), eps_b),
        "eps_anchor_lr1": (dict(task, pos_loss_weight=0.05, _alpha=1e-4),
                           eps_a),
    }

    results_file = os.path.join(args.out, "results.yaml")
    results = {}
    if os.path.exists(results_file):
        with open(results_file) as fp:
            results = yaml.safe_load(fp) or {}
    results["static_best"] = {"sigma": float(best_sigma),
                              **static[best_sigma]}
    for name in args.configs:
        w_over, lcfg_over = configs[name]
        planner, state = train_config(name, w_over, lcfg_over,
                                      splits["train"], args, args.out)
        summary = eval_learned(planner, state, planner.spec, splits["test"],
                               args.batch)
        results[name] = summary
        print(f"[eval:{name}] {json.dumps(summary)}")
        with open(results_file, "w") as fp:
            yaml.safe_dump(results, fp)

    keys = ["solve_rate", "contact_free_rate", "avg_gp_error",
            "avg_sg_error", "avg_max_penetration", "avg_coll_intensity",
            "avg_pos_mse"]
    lines = ["| config | " + " | ".join(keys) + " |",
             "|---|" + "---|" * len(keys)]
    for name, r in results.items():
        lines.append("| " + name + " | "
                     + " | ".join(f"{r.get(k, float('nan')):.4f}"
                                  for k in keys) + " |")
    table = "\n".join(lines)
    with open(os.path.join(args.out, "table.md"), "w") as fp:
        fp.write(table + "\n")
    print(table)


if __name__ == "__main__":
    main()
