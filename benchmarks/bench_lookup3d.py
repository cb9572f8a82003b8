#!/usr/bin/env python
"""Microbenchmark: 3-D trilinear SDF lookup engines on the real TPU.

The committed evidence for the 3-D lookup-engine choice (VERDICT r4
item 1): measures the XLA 8-tap gather (`ops/sdf.trilinear_lookup`, the
`lookup_nd` default) against the trajectory-locality tiled Pallas kernel
(`ops/pallas/sdf_lookup3d.trilinear_lookup_pallas`, opt-in) under the
exact conditions the `ops/sdf.py` auto-dispatch comment claims:
B∈{128, 1024}, 64³ f32 voxel worlds, P=101 trajectory-shaped queries,
loop-in-jit (PERFORMANCE.md timing methodology — the variant runs inside
one compiled fori_loop and the result is fetched inside the timed
region, so tunnel dispatch overhead is amortized out).

Query points are smooth start→goal trajectories with mild noise — the
access pattern the tiled kernel targets (its in-brick fast path); a
`--scattered` flag switches to uniform random points (every tile takes
the kernel's full-volume fallback, its worst case).

Reference hot path this generalizes: the 2-D batched bilinear gather at
``diff_gpmp2/gpmp2/obstacle/obstacle_cost.py:35`` →
``utils/sdf_utils.py:38-107`` (the reference is planar; 3-D is new
surface).

Usage: python benchmarks/bench_lookup3d.py [B ...] [--scattered]
           [--engines gather pallas_tile:8 pallas_tile:16]
"""
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

from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.ops.pallas.sdf_lookup3d import trilinear_lookup_pallas

P, VOX = 101, 64
RES = 10.0 / VOX
LIMS = (-5.0, 5.0)
ITERS = 50


def build(b, scattered, seed=0):
    rng = np.random.default_rng(seed)
    # Synthesized on-device: lookup timing is value-independent, and a real
    # (B, 64^3) EDT field would cost a 1 GB host->device transfer over the
    # tunnel plus minutes of EDT build before the first timed line (the
    # B=1024 case blew a 15-minute budget that way).  A smooth random field
    # keeps gradients finite for the non-finite guard below.
    key = jax.random.PRNGKey(seed)
    sdf = 0.1 * jax.random.normal(key, (b, VOX, VOX, VOX),
                                  jnp.float32) + 1.0
    if scattered:
        pts = rng.uniform(-4.5, 4.5, (b, P, 3))
    else:
        t = np.linspace(0, 1, P)[None, :, None]
        s = rng.uniform(-4.5, -3.5, (b, 1, 3))
        g = rng.uniform(3.5, 4.5, (b, 1, 3))
        pts = s + t * (g - s) + 0.1 * rng.standard_normal((b, P, 3))
    return sdf, jnp.asarray(pts, jnp.float32)


def engine_fn(name):
    if name == "gather":
        return lambda s, p: sdf_ops.trilinear_lookup(
            s, p, RES, LIMS, LIMS, LIMS)
    if name.startswith("pallas_tile"):
        p_t = int(name.split(":")[1]) if ":" in name else 8
        return lambda s, p: trilinear_lookup_pallas(
            s, p, RES, LIMS, LIMS, LIMS, p_t)
    raise ValueError(name)


def bench(name, sdf, pts):
    fn = engine_fn(name)
    b = sdf.shape[0]

    # The SDF must be a jit ARGUMENT, not a closure capture: a captured
    # device array is lowered as an HLO literal, and at B=1024 the 1 GB
    # table turned into a multi-GB program upload through the tunnel
    # (~20 min in remote_compile before the first timed line).
    @jax.jit
    def run(sdf0, pts0):
        def body(i, carry):
            d, g = fn(sdf0, carry)
            # Fold outputs back into the carry so no iteration is dead.
            return carry + 1e-12 * (d[..., None] + g)

        return jax.lax.fori_loop(0, ITERS, body, pts0)

    out = run(sdf, pts)
    assert bool(jnp.all(jnp.isfinite(out))), f"{name}: non-finite"
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(sdf, pts)))
        best = min(best, time.perf_counter() - t0)
    per_eval = best / ITERS
    ns_per_sample = per_eval / (b * P) * 1e9
    print(f"B={b:5d} {name:16s} {per_eval * 1e3:8.3f} ms/eval  "
          f"{ns_per_sample:7.1f} ns/sample")
    return per_eval


def main():
    scattered = "--scattered" in sys.argv
    if scattered:
        sys.argv.remove("--scattered")
    engines = ["gather", "pallas_tile:8", "pallas_tile:16"]
    if "--engines" in sys.argv:
        i = sys.argv.index("--engines")
        engines = sys.argv[i + 1:]
        sys.argv = sys.argv[:i]
    batches = [int(a) for a in sys.argv[1:]] or [128, 1024]
    kind = "scattered (full-volume fallback)" if scattered \
        else "trajectory-shaped"
    print(f"# 3-D trilinear lookup, {VOX}^3 f32, P={P} {kind} queries, "
          f"loop-in-jit x{ITERS}, backend={jax.default_backend()}")
    for b in batches:
        sdf, pts = build(b, scattered)
        for name in engines:
            bench(name, sdf, pts)


if __name__ == "__main__":
    main()
