#!/usr/bin/env python
"""Microbenchmark: bilinear SDF lookup variants on the real TPU.

Loop-in-jit methodology (PERFORMANCE.md): the variant runs inside one
compiled fori_loop and the result is fetched inside the timed region.
Carry = sum of outputs folded into a dummy point offset so the loop body
cannot be hoisted.

Usage: python benchmarks/bench_lookup.py [variant ...]
Variants: mxu rows pallas pallas_v2:<S> (e.g. pallas_v2:32)
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
from dgpmp2_tpu.ops.pallas.sdf_lookup import (
    bilinear_lookup_pallas, bilinear_lookup_pallas_v2,
    bilinear_lookup_pallas_v3,
)

B, P, IMSIZE = 1024, 101, 128
RES = 10.0 / IMSIZE
LIMS = (-5.0, 5.0)
ITERS = 50


def build():
    rng = np.random.default_rng(0)
    imgs = np.ones((B, IMSIZE, IMSIZE), np.float32)
    for i in range(B):
        r, c = rng.integers(20, 90, 2)
        imgs[i, r : r + 20, c : c + 20] = 0.0
    sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(imgs), res=RES)
    pts = jnp.asarray(rng.uniform(-4.5, 4.5, (B, P, 2)), jnp.float32)
    return sdf.astype(jnp.float32), pts


def variant_fn(name):
    if name == "mxu":
        return lambda s, p: sdf_ops.bilinear_lookup_mxu(s, p, RES, LIMS, LIMS)
    if name == "rows":
        return lambda s, p: sdf_ops.bilinear_lookup_rows(s, p, RES, LIMS, LIMS)
    if name == "gather":
        return lambda s, p: sdf_ops.bilinear_lookup(s, p, RES, LIMS, LIMS)
    if name == "pallas":
        return lambda s, p: bilinear_lookup_pallas(s, p, RES, LIMS, LIMS, 32)
    if name.startswith("pallas_v2"):
        spp = int(name.split(":")[1]) if ":" in name else 32
        return lambda s, p: bilinear_lookup_pallas_v2(
            s, p, RES, LIMS, LIMS, spp
        )
    if name.startswith("pallas_v3"):
        # pallas_v3[:<spp>[:<n_limbs>]]
        parts = name.split(":")
        spp = int(parts[1]) if len(parts) > 1 else 32
        n_limbs = int(parts[2]) if len(parts) > 2 else 3
        return lambda s, p: bilinear_lookup_pallas_v3(
            s, p, RES, LIMS, LIMS, spp, n_limbs
        )
    raise ValueError(name)


def bench(name, sdf, pts):
    fn = variant_fn(name)

    @jax.jit
    def run(pts0):
        def body(i, carry):
            d, g = fn(sdf, carry)
            # Fold outputs back into the carry so no iteration is dead.
            return carry + 1e-12 * (d[..., None] + g)

        return jax.lax.fori_loop(0, ITERS, body, pts0)

    out = run(pts)
    assert bool(jnp.all(jnp.isfinite(out))), f"{name}: non-finite"
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(pts)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:16s} {best / ITERS * 1e3:7.3f} ms/eval")


def main():
    names = sys.argv[1:] or ["mxu", "pallas_v2:32"]
    sdf, pts = build()
    for n in names:
        bench(n, sdf, pts)


if __name__ == "__main__":
    main()
