#!/usr/bin/env python
"""Headline benchmark: batched Gauss-Newton iteration latency on TPU.

North-star (BASELINE.json): plan 1024 2-D trajectories in parallel with
< 1 ms per GN iteration on a v5e.  The reference publishes no numbers
(BASELINE.md); the driver-set target is the bar.

Prints ONE JSON line:
  {"metric": "gn_iter_ms_b1024", "value": <ms>, "unit": "ms",
   "vs_baseline": <north_star_ms / value>}   (>1.0 means faster than target)
"""
import json
import subprocess
import sys
import time

import os

import jax

# Persistent compilation cache: the plan-loop graph takes minutes to compile
# on the tunneled backend; cache hits make repeat runs fast.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(__file__), ".jax_cache")),
)

import jax.numpy as jnp
import numpy as np

from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import PointRobot2D
from dgpmp2_tpu.utils.trajectory import straight_line_traj

NORTH_STAR_MS = 1.0
B = 1024
T = 100  # reference default (gpmp2_2d_params.yaml:6) -> 101 states
IMSIZE = 128
DTYPE = jnp.float32


def build_problem():
    rng = np.random.default_rng(0)
    spec = graph.GraphSpec(total_time_step=T)
    robot = PointRobot2D()

    imgs = np.ones((B, IMSIZE, IMSIZE), np.float32)
    for i in range(B):
        r, c = rng.integers(20, 90, 2)
        imgs[i, r : r + 20, c : c + 20] = 0.0
    res = 10.0 / IMSIZE
    sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(imgs), res=res).astype(DTYPE)

    start = jnp.zeros((B, 4), DTYPE).at[:, :2].set(
        jnp.asarray(rng.uniform(-4.5, -3.5, (B, 2)), DTYPE)
    )
    goal = jnp.zeros((B, 4), DTYPE).at[:, :2].set(
        jnp.asarray(rng.uniform(3.5, 4.5, (B, 2)), DTYPE)
    )
    params = graph.default_params(
        spec, robot, start, goal,
        qc_inv=np.eye(2), cost_sigma=0.05, epsilon_dist=0.4,
        k_s=0.01, k_g=0.01, dtype=DTYPE,
    )
    th0 = straight_line_traj(start[:, :2], goal[:, :2], spec.total_time_sec, T)
    return spec, robot, params, th0, sdf


def wait_for_backend(probe_timeout_s: int = 60,
                     budget_s: float = 2400.0) -> bool:
    """Bounded wait for the (tunneled) TPU backend.

    ``jax.devices()`` HANGS indefinitely when the axon tunnel is down, so
    each probe runs in a subprocess with a timeout.  Probes retry with
    exponential backoff (30 s → 5 min caps) for up to ``budget_s``
    (default 40 min; override via DGPMP2_BENCH_PROBE_BUDGET_S): the
    round-2 artifact was lost to a tunnel flap that a 5-minute probe
    window could not outlast, and the driver runs bench once per round —
    waiting out a transient flap is cheap, faking a number is not.
    """
    budget_s = float(os.environ.get("DGPMP2_BENCH_PROBE_BUDGET_S", budget_s))
    deadline = time.monotonic() + budget_s
    wait_s, attempt = 30.0, 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import jax; jax.devices(); print('BACKEND_OK')"],
                capture_output=True, text=True, timeout=probe_timeout_s,
            )
            if "BACKEND_OK" in proc.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        sleep_for = min(wait_s, remaining)
        print(f"backend probe {attempt} failed; retrying in "
              f"{sleep_for:.0f}s ({remaining / 60:.1f} min of probe "
              f"budget left)", file=sys.stderr)
        time.sleep(sleep_for)
        wait_s = min(wait_s * 2.0, 300.0)


def main():
    if not wait_for_backend():
        # Explicit failure beats a hang the driver has to kill.
        print(json.dumps({
            "metric": "gn_iter_ms_b1024", "value": None, "unit": "ms",
            "error": "device backend unavailable (tunnel down?) after "
                     "bounded retries",
        }))
        sys.exit(2)
    spec, robot, params, th0, sdf = build_problem()
    iters_short, iters_long = 50, 500

    # Measure the production hot path: the compiled plan loop (assembly +
    # solve + err/err_ext traces per iteration, the reference's
    # DiffGPMP2Planner.step semantics).  The loop lives INSIDE one jit: on
    # the tunneled TPU backend, per-dispatch timing of chained host calls is
    # unreliable (async pipelining), so the only trustworthy number is a
    # compiled N-step program, and the value must be fetched to guarantee
    # completion.
    # The stream-layout engine (core/stream.py) is the fastest verified
    # path at this batch size: 1.67 vs 1.91 ms/iter for the standard
    # engine, parity-tested in tests/test_gn_stream.py.  It is also what
    # engine="auto" resolves to on TPU f32 (gn.resolve_engine);
    # DGPMP2_ENGINE=standard benchmarks the standard path.
    engine = os.environ.get("DGPMP2_ENGINE", "stream")
    # Lookup-engine A/B (DGPMP2_LOOKUP=pallas_v3 etc.); default auto.
    lookup = os.environ.get("DGPMP2_LOOKUP")
    if lookup:
        sdf_ops.set_lookup_method(lookup)

    # Steady-state throughput by program-length differencing: one dispatch
    # on the tunneled backend carries a FIXED ~30 ms of RPC/launch/fetch
    # overhead regardless of program length (measured: 50 iters -> 37.8 ms,
    # 200 -> 60.2, 500 -> 104.8; perfectly linear at 0.149 ms/iter +
    # 30.3 ms).  Timing one N-iter program and dividing by N therefore
    # overstates per-iteration cost by overhead/N (the round-1 "1.62
    # ms/iter" was ~0.6 ms of tunnel overhead).  Timing the SAME compiled
    # loop at two lengths and differencing removes the constant exactly
    # while keeping every per-iteration cost inside the measurement.
    def timed(iters, th_in):
        cfg = gn.OptimConfig(reg=0.1, max_iters=iters, tol_delta=0.0,
                             engine=engine)
        # Overhead-corrected unroll sweep: 1 -> 0.1352, 2 -> 0.1339,
        # 4 -> 0.1433, 8 -> 0.1427 ms/iter.  (The old unroll=4 choice was
        # an artifact of the contaminated 50-iter methodology.)
        run_n = jax.jit(
            lambda p, th, s: gn.plan(spec, robot, p, th, s, cfg, unroll=2).th
        )
        th = run_n(params, th_in, sdf)  # compile + warm-up
        assert np.isfinite(float(jnp.sum(th))), "non-finite trajectories"
        best = float("inf")
        # Best-of-5: process-to-process variance of the tunneled chip is
        # ±10% (PERFORMANCE.md); more repeats cost ~0.1 s each.
        for k in range(5):
            t0 = time.perf_counter()
            out = run_n(params, th + 1e-6 * k, sdf)
            float(jnp.sum(out))  # forces true completion on remote backend
            best = min(best, time.perf_counter() - t0)
        return best

    t_short = timed(iters_short, th0)
    t_long = timed(iters_long, th0)
    ms = (t_long - t_short) / (iters_long - iters_short) * 1e3
    overhead_ms = t_short * 1e3 - iters_short * ms

    print(
        json.dumps(
            {
                "metric": "gn_iter_ms_b1024",
                "value": round(ms, 4),
                "unit": "ms",
                "vs_baseline": round(NORTH_STAR_MS / ms, 4),
                "dispatch_overhead_ms": round(overhead_ms, 1),
                "total_ms_50_iters": round(t_short * 1e3, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
