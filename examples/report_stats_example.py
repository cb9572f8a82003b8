#!/usr/bin/env python
"""Aggregate evaluation YAMLs across epochs vs the best-fixed-covariance
baseline (mirrors examples/report_stats_example.py:10-129): reads per-epoch
results files + sensitivity_results.yaml, prints a comparison table and
writes a solve-rate curve plot."""
import argparse
import glob
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import yaml

p = argparse.ArgumentParser()
p.add_argument("--results_glob", default="runs/exp1/results_epoch*.yaml")
p.add_argument("--sensitivity_file", default="sensitivity_results.yaml")
p.add_argument("--out", default="out/report_stats.png")
args = p.parse_args()

rows = []
for f in sorted(glob.glob(args.results_glob)):
    with open(f) as fp:
        r = yaml.safe_load(fp)
    epoch = int("".join(c for c in os.path.basename(f) if c.isdigit()) or 0)
    rows.append((epoch, r))

baseline = None
if os.path.exists(args.sensitivity_file):
    with open(args.sensitivity_file) as fp:
        sens = yaml.safe_load(fp)
    baseline = sens["best"]
    print(f"best static baseline (sigma={sens['best_sigma']}): "
          f"solve_rate={baseline['solve_rate']:.3f}")

if not rows:
    print("no results files matched", args.results_glob)
    raise SystemExit(0)

print(f"{'epoch':>6} {'solve_rate':>10} {'gp_error':>10} {'in_coll':>8}")
for epoch, r in rows:
    print(f"{epoch:>6} {r['solve_rate']:>10.3f} {r['avg_gp_error']:>10.4f} "
          f"{r['avg_in_coll']:>8.3f}")

os.makedirs(os.path.dirname(args.out), exist_ok=True)
fig, ax = plt.subplots()
ax.plot([e for e, _ in rows], [r["solve_rate"] for _, r in rows],
        "o-", label="learned")
if baseline:
    ax.axhline(baseline["solve_rate"], color="gray", linestyle="--",
               label="best static sigma")
ax.set_xlabel("epoch"); ax.set_ylabel("solve rate"); ax.legend()
fig.savefig(args.out, bbox_inches="tight", dpi=110)
print("wrote", args.out)
