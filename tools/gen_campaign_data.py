#!/usr/bin/env python
"""Generate one campaign dataset split on CPU (latency-free).

The expert data generator plans 4-problem batches per environment — on
the tunneled TPU backend every env pays several RPC round-trips, so the
chip is idle 99% of the time and a 250-env split takes hours.  On local
CPU the same split takes minutes, and splits are embarrassingly parallel
across processes (one per family×split; see tools/learned_campaign.py
which skips existing data).

Usage: python tools/gen_campaign_data.py <out_root> <family> <mode> <n> \
           <probs> [seed]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import numpy as np

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.data import generate
from dgpmp2_tpu.robots import PointRobot2D

from learned_campaign import COV


def main():
    out_root, family, mode = sys.argv[1], sys.argv[2], sys.argv[3]
    n, probs = int(sys.argv[4]), int(sys.argv[5])
    # Default seed folds in (family, mode) so concurrent splits can never
    # share an RNG stream: a common seed 0 across train/test would make
    # the "held-out" test split an exact prefix of the train set.
    if len(sys.argv) > 6:
        seed = int(sys.argv[6])
    else:
        import zlib  # stable across processes (hash() is salted)

        seed = zlib.crc32(f"{family}/{mode}".encode())
    spec = graph.GraphSpec(total_time_step=100)
    robot = PointRobot2D()
    cfg = gn.OptimConfig(reg=0.1, max_iters=60, method="lm")
    out_dir = os.path.join(out_root, f"data_{family}", mode)
    if os.path.exists(os.path.join(out_dir, "meta.yaml")):
        print(f"[gen] {family}/{mode}: exists")
        return
    rng = np.random.default_rng(seed)
    t0 = time.time()
    generate.generate_split(out_dir, n, probs, family, 128, rng, spec, robot,
                            cfg, COV)
    print(f"[gen] {family}/{mode}: {n} envs x {probs} in {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
