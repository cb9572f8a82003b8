#!/usr/bin/env python
"""One-command reproducible headline campaign: learned-vs-static, all five
obstacle families, straight-seed AND multi-start composition (+ optional
arm transfer) — from fixed seeds to the committed markdown table.

This is the single entry point that regenerates the learned-planner
headline claims in PERFORMANCE.md ("XL replication" / "Generalist model"
sections).  It chains the three campaign stages with their protocols baked
in, so the table cannot silently drift from the procedure that produced it:

1. **Data** — all five reference obstacle families
   (``generate_2d_dataset.py:26``), fixed RNG streams, expert labels from
   the framework's own LM planner.
2. **Static opponent** — 9-sigma sensitivity sweep per family and pooled
   (``test_dataset_sensitivity.py`` semantics); each family is judged
   against its OWN best sigma (stricter than the pooled oracle).
3. **Generalist training** — ONE ``eps_bounded`` model over the pooled
   families, 90/10 train/val split (val never overlaps test), checkpoint
   = best-val-solve-rate epoch (the val-selection protocol; mirrors the
   reference's eval_epoch validation, ``train_planner.py:458-468``).
4. **Straight-seed eval** — per-family learned vs static_best.
5. **Multi-start composition** — learned+msK vs the sigma-oracle
   static+msK (same restarts/pruning both sides; control sigmas
   {0.01, 0.02, 0.05} around the straight-seed winner, the protocol of
   PERFORMANCE.md "XL replication").
6. **Arm transfer** (``--arm``) — the same learning stack on the 2-link
   planar arm (no reference analog; SURVEY.md §2.4).

Scales (one flag, everything else pinned):
  smoke: minutes, CI-sized     — proves the pipeline, numbers meaningless
  midi:  ~1-2 h on one v5e     — the committed reproduction artifact
  xl:    ~a day on one v5e     — the PERFORMANCE.md XL replication

Usage:
  python tools/headline_campaign.py --out runs/headline --scale midi
  python tools/headline_campaign.py --out runs/headline --scale midi \
      --check runs/headline/headline.md     # re-run + diff vs committed
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(__file__), "..", ".jax_cache")),
)

import yaml

FAMILIES = ["multi_obs", "forest", "passage", "tar_pit", "mixed_clutter"]
HEADLINE_CONFIG = "eps_bounded"  # the selected generalist (PERFORMANCE.md)

# scale -> (train envs/family, test envs/family, probs/env, epochs,
#           batch, restarts, prune_iters, keep, ms batch)
SCALES = {
    "smoke": dict(num_train=6, num_test=2, probs=2, epochs=2, batch=8,
                  restarts=4, prune_iters=0, keep=0, ms_batch=4, t=30,
                  eval_every=1),
    "midi": dict(num_train=100, num_test=20, probs=4, epochs=12, batch=128,
                 restarts=32, prune_iters=10, keep=8, ms_batch=32, t=100,
                 eval_every=2),
    "xl": dict(num_train=500, num_test=40, probs=4, epochs=36, batch=128,
               restarts=32, prune_iters=10, keep=8, ms_batch=32, t=100,
               eval_every=3),
}
# Multi-start static control: best of these sigmas per family.  Most
# families get the straight-seed winners' neighborhood (the PERFORMANCE.md
# XL-replication protocol); forest additionally gets the weak-hinge
# equilibrium region around sigma=0.5, the optimum the round-4 sweep found
# (PERFORMANCE.md "RRT*-seeded multistart": cf 0.9727 at 0.5 vs <=0.91 at
# the tight sigmas) — without it the static control is unfairly weak on
# the one family where the tight-sigma equilibrium lies in contact.
MS_CONTROL_SIGMAS = {
    "multi_obs": [0.01, 0.02, 0.05],
    "passage": [0.01, 0.02, 0.05],
    "tar_pit": [0.01, 0.02, 0.05],
    "mixed_clutter": [0.01, 0.02, 0.05],
    "forest": [0.01, 0.05, 0.2, 0.5],
}


def run_arm_only(args):
    """Arm-transfer stage alone at the chosen scale (VERDICT r3 item 5:
    make the round-2 XL arm win reproducible end-to-end).  Writes
    ``<out>/headline_arm.md``; ``--check`` diffs against a committed copy.
    """
    import arm_campaign

    out = args.out
    os.makedirs(out, exist_ok=True)
    arm_scale = {"smoke": (32, 16, 2), "midi": (1024, 256, 20),
                 "xl": (2048, 512, 40)}[args.scale]
    arm_campaign.main([
        "--out", os.path.join(out, "arm"),
        "--num_train", str(arm_scale[0]),
        "--num_test", str(arm_scale[1]),
        "--epochs", str(arm_scale[2]),
        "--configs", "eps_bounded_lr1",
    ])
    with open(os.path.join(out, "arm", "results.yaml")) as fp:
        arm = yaml.safe_load(fp)
    L = [f"# Arm-transfer stage — scale `{args.scale}` "
         f"({arm_scale[0]}+{arm_scale[1]} problems, {arm_scale[2]} epochs)",
         "",
         f"Regenerate with: `python tools/headline_campaign.py --out {out} "
         f"--scale {args.scale} --arm-only`", ""]
    keys_a = ["solve_rate", "contact_free_rate", "avg_gp_error",
              "avg_max_penetration"]
    L.append("| config | " + " | ".join(keys_a) + " |")
    L.append("|---|" + "---|" * len(keys_a))
    for name, r in arm.items():
        L.append(f"| {name} | "
                 + " | ".join(f"{r.get(k, float('nan')):.4f}"
                              for k in keys_a) + " |")
    L.append("")
    table = "\n".join(L)
    path = os.path.join(out, "headline_arm.md")
    with open(path, "w") as fp:
        fp.write(table + "\n")
    print(table)
    return path


def run(args):
    import learned_campaign
    import multistart_sweep

    s = SCALES[args.scale]
    out = args.out
    os.makedirs(out, exist_ok=True)

    # -- stages 1-4: data, static sweep, generalist training (val-selected
    #    checkpoint), straight-seed eval — learned_campaign owns the
    #    protocol; this tool only pins the arguments.
    learned_campaign.main([
        "--out", out,
        "--families", *FAMILIES,
        "--num_train", str(s["num_train"]),
        "--num_test", str(s["num_test"]),
        "--probs", str(s["probs"]),
        "--t", str(s["t"]),
        "--epochs", str(s["epochs"]),
        "--batch", str(s["batch"]),
        "--eval_every", str(s["eval_every"]),
        "--configs", HEADLINE_CONFIG,
    ])

    # -- stage 5: multi-start composition, both arms under identical
    #    restart/pruning budgets.
    ms_out = os.path.join(out, "multistart")
    ms_common = [
        "--data_root", out,
        "--families", *FAMILIES,
        "--out", ms_out,
        "--t", str(s["t"]),
        "--restarts", str(s["restarts"]),
        "--amp", "2.0",
        "--batch", str(s["ms_batch"]),
    ]
    if s["keep"]:
        ms_common += ["--prune_iters", str(s["prune_iters"]),
                      "--keep", str(s["keep"])]
    # Per-family static control grids (forest includes the sigma=0.5
    # equilibrium optimum): group families sharing a grid into one sweep
    # call so compile caching still amortizes across families.
    by_grid = {}
    for fam in FAMILIES:
        by_grid.setdefault(tuple(MS_CONTROL_SIGMAS[fam]), []).append(fam)
    for grid, fams in by_grid.items():
        ms_fam = list(ms_common)
        i = ms_fam.index("--families")
        j = i + 1 + len(FAMILIES)
        ms_fam[i + 1: j] = fams
        multistart_sweep.main(ms_fam + ["--sigmas"]
                              + [str(x) for x in grid])
    ckpt = os.path.join(out, f"{HEADLINE_CONFIG}_vars.npz")
    multistart_sweep.main(
        ms_common + ["--no_static", "--cov_model", f"{HEADLINE_CONFIG}:{ckpt}"]
    )

    # -- stage 6 (optional): arm transfer.
    if args.arm:
        import arm_campaign
        arm_scale = {"smoke": (32, 16, 2), "midi": (1024, 256, 20),
                     "xl": (2048, 512, 40)}[args.scale]
        arm_campaign.main([
            "--out", os.path.join(out, "arm"),
            "--num_train", str(arm_scale[0]),
            "--num_test", str(arm_scale[1]),
            "--epochs", str(arm_scale[2]),
            "--configs", "eps_bounded_lr1",
        ])

    return assemble_table(args, s)


def assemble_table(args, s):
    """Combine the stage outputs into the single headline markdown table."""
    out = args.out
    with open(os.path.join(out, "results.yaml")) as fp:
        pooled = yaml.safe_load(fp)
    with open(os.path.join(out, "results_by_family.yaml")) as fp:
        by_family = yaml.safe_load(fp)
    with open(os.path.join(out, "multistart", "results.yaml")) as fp:
        ms = yaml.safe_load(fp)

    L = []
    L.append(f"# Headline campaign — scale `{args.scale}`, config "
             f"`{HEADLINE_CONFIG}`")
    L.append("")
    L.append(f"Regenerate with: `python tools/headline_campaign.py --out "
             f"{out} --scale {args.scale}`  ")
    L.append(f"Protocol: {s['num_train']} train + {s['num_test']} test "
             f"envs/family x {s['probs']} problems, {s['epochs']} epochs, "
             "checkpoint = best-val-solve-rate epoch (90/10 split), "
             "canonical-margin judging; multi-start K="
             f"{s['restarts']}, amp 2.0"
             + (f", staged pruning p={s['prune_iters']}/keep={s['keep']}"
                if s["keep"] else "") + ".")
    L.append("")

    L.append("## Straight seed, pooled test split")
    L.append("")
    keys = ["solve_rate", "contact_free_rate", "avg_gp_error",
            "avg_max_penetration", "avg_coll_intensity"]
    L.append("| config | " + " | ".join(keys) + " |")
    L.append("|---|" + "---|" * len(keys))
    for name in ("static_best", HEADLINE_CONFIG):
        r = pooled[name]
        tag = (f"static_best (sigma {r['sigma']})" if name == "static_best"
               else f"**{name}** (one model)")
        L.append(f"| {tag} | "
                 + " | ".join(f"{r[k]:.4f}" for k in keys) + " |")
    # Val-gated selection (VERDICT r3 item 6): the emitted model is the
    # learned checkpoint only when it beat the static baseline on the
    # shared val split; otherwise the static config IS the selected model.
    # When static wins, the selected row reports the VAL-chosen sigma's
    # test metrics — quoting the test-oracle static_best there would leak
    # the test split through the gate (advisor r4, medium).
    gate = pooled.get(HEADLINE_CONFIG, {}).get("val_gate")

    def _sigma_row(sweep_yaml, sigma):
        """Row of a static-sensitivity sweep file at (float-keyed) sigma."""
        if not os.path.exists(sweep_yaml) or sigma is None:
            return None
        with open(sweep_yaml) as fp:
            sweep = yaml.safe_load(fp)
        for k, v in sweep.items():
            if abs(float(k) - float(sigma)) < 1e-12:
                return v
        return None

    def _selected_row(gate, learned_row, sweep_yaml):
        if gate["selected"] == "learned":
            return learned_row
        return (_sigma_row(sweep_yaml, gate.get("static_val_sigma"))
                or None)

    if gate:
        r = _selected_row(gate, pooled[HEADLINE_CONFIG],
                          os.path.join(out, "static_sensitivity.yaml"))
        sel_tag = (gate["selected"] if gate["selected"] == "learned" else
                   f"static @ val sigma {gate.get('static_val_sigma')}")
        if r is not None:
            L.append(
                f"| **selected** (val gate: learned "
                f"{gate['learned_val_solve']:.3f} vs static "
                f"{gate['static_val_solve']:.3f} -> {sel_tag}) | "
                + " | ".join(f"{r[k]:.4f}" for k in keys) + " |")
    L.append("")

    L.append("## Straight seed, per family (static = each family's own "
             "best sigma)")
    L.append("")
    fams = [f for f in FAMILIES if f in by_family]
    for metric in ("solve_rate", "contact_free_rate"):
        L.append(f"**{metric}**")
        L.append("")
        L.append("| config | " + " | ".join(fams) + " |")
        L.append("|---|" + "---|" * len(fams))
        for cfg in ("static_best", HEADLINE_CONFIG):
            cells = [f"{by_family[f][cfg][metric]:.4f}"
                     if cfg in by_family.get(f, {}) else "—" for f in fams]
            L.append(f"| {cfg} | " + " | ".join(cells) + " |")
        if gate:
            if gate["selected"] == "learned":
                cells = [f"{by_family[f][HEADLINE_CONFIG][metric]:.4f}"
                         if HEADLINE_CONFIG in by_family.get(f, {}) else "—"
                         for f in fams]
                sel_tag = "learned"
            else:
                # Per-family metrics of the ONE val-chosen sigma (the
                # campaign ships one config, not a per-family oracle).
                cells = []
                for f in fams:
                    row = _sigma_row(
                        os.path.join(out, f"static_sensitivity_{f}.yaml"),
                        gate.get("static_val_sigma"))
                    cells.append(f"{row[metric]:.4f}" if row else "—")
                sel_tag = f"static @ val sigma {gate.get('static_val_sigma')}"
            L.append(f"| **selected** ({sel_tag}) | "
                     + " | ".join(cells) + " |")
        L.append("")

    L.append("## Multi-start composition (identical K both arms; static = "
             "best of the per-family control grid "
             + "; ".join(f"{f}: {MS_CONTROL_SIGMAS[f]}" for f in fams)
             + ")")
    L.append("")
    lk = [k for k in next(iter(ms.values()))
          if k.startswith(HEADLINE_CONFIG + "_ms")]
    lkey = lk[0] if lk else None
    L.append("| family | static+ms (sigma oracle) | learned+ms | "
             "learned+ms contact_free |")
    L.append("|---|---|---|---|")
    for fam in fams:
        row = ms.get(fam, {})
        st = row.get("best_solve", {})
        lr = row.get(lkey, {}) if lkey else {}
        s_sr = st.get("solve_rate", float("nan"))
        l_sr = lr.get("solve_rate", float("nan"))
        # Bold only the actual winner (ties bold neither).
        s_cell = f"**{s_sr:.4f}**" if s_sr > l_sr else f"{s_sr:.4f}"
        l_cell = f"**{l_sr:.4f}**" if l_sr > s_sr else f"{l_sr:.4f}"
        L.append(f"| {fam} | {s_cell} | {l_cell} | "
                 f"{lr.get('contact_free_rate', float('nan')):.4f} |")
    L.append("")

    arm_results = os.path.join(out, "arm", "results.yaml")
    if args.arm and os.path.exists(arm_results):
        with open(arm_results) as fp:
            arm = yaml.safe_load(fp)
        L.append("## Arm transfer (2-link planar arm, same learning stack)")
        L.append("")
        keys_a = ["solve_rate", "contact_free_rate", "avg_gp_error",
                  "avg_max_penetration"]
        L.append("| config | " + " | ".join(keys_a) + " |")
        L.append("|---|" + "---|" * len(keys_a))
        for name, r in arm.items():
            L.append(f"| {name} | "
                     + " | ".join(f"{r.get(k, float('nan')):.4f}"
                                  for k in keys_a) + " |")
        L.append("")

    table = "\n".join(L)
    path = os.path.join(out, "headline.md")
    with open(path, "w") as fp:
        fp.write(table + "\n")
    print(table)
    print(f"\n[headline] table written to {path}")
    return path


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--scale", choices=list(SCALES), default="midi")
    p.add_argument("--arm", action="store_true",
                   help="also run the arm-transfer stage")
    p.add_argument("--arm-only", action="store_true", dest="arm_only",
                   help="run ONLY the arm-transfer stage at the chosen "
                        "scale (reproduces the XL arm result end-to-end)")
    p.add_argument("--check", default=None, metavar="COMMITTED_MD",
                   help="after the run, diff the regenerated table against "
                        "this committed table and exit non-zero on drift")
    args = p.parse_args(argv)

    path = run_arm_only(args) if args.arm_only else run(args)

    if args.check:
        import difflib

        with open(path) as fp:
            new = fp.read().splitlines()
        with open(args.check) as fp:
            old = fp.read().splitlines()
        diff = list(difflib.unified_diff(old, new, fromfile=args.check,
                                         tofile=path, lineterm=""))
        if diff:
            print("\n".join(diff))
            print(f"[headline] DRIFT vs {args.check}")
            sys.exit(1)
        print(f"[headline] regenerated table matches {args.check}")


if __name__ == "__main__":
    main()
