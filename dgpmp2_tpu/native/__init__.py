"""ctypes bindings for the native C++ host runtime (csrc/dgpmp2_native.cpp).

Provides the fast host-side EDT / SDF used by the data pipeline and the
RRT* expert planner that replaces the reference's external OMPL C++
dependency (``diff_gpmp2/ompl_rrtstar.py``).  The shared library is built
on demand with g++; every entry point has a pure-Python/JAX fallback so the
framework degrades gracefully without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc",
                    "dgpmp2_native.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libdgpmp2_native.so")
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return False
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _LIB, src]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.edt_2d_sq.argtypes = [u8, f32, ctypes.c_int, ctypes.c_int]
    lib.sdf_2d.argtypes = [u8, f32, ctypes.c_int, ctypes.c_int, ctypes.c_float]
    lib.rrt_star_2d.argtypes = [
        f32, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_uint64,
        f32, ctypes.c_int,
    ]
    lib.rrt_star_2d.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def edt_sq(mask: np.ndarray) -> np.ndarray:
    """Exact squared EDT (pixels²) to the nearest True cell; native or numpy."""
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    lib = load()
    h, w = mask.shape
    if lib is not None:
        out = np.empty((h, w), np.float32)
        lib.edt_2d_sq(mask, out, h, w)
        return out
    from scipy import ndimage  # fallback

    return (ndimage.distance_transform_edt(~mask.astype(bool)) ** 2).astype(
        np.float32
    )


def sdf_2d(free_mask: np.ndarray, res: float) -> np.ndarray:
    """Signed distance field from a free-space mask (native fast path;
    matches dgpmp2_tpu.ops.sdf.sdf_from_occupancy)."""
    free_mask = np.ascontiguousarray(free_mask.astype(np.uint8))
    lib = load()
    h, w = free_mask.shape
    if lib is not None:
        out = np.empty((h, w), np.float32)
        lib.sdf_2d(free_mask, out, h, w, float(res))
        return out
    import jax.numpy as jnp

    from dgpmp2_tpu.ops import sdf as sdf_ops

    return np.asarray(
        sdf_ops.sdf_from_occupancy(jnp.asarray(free_mask, jnp.float32), res=res)
    ).astype(np.float32)


def rrt_star(
    sdf: np.ndarray,
    start,
    goal,
    x_lims,
    y_lims,
    clearance: float,
    plan_time: float = 2.0,
    max_iters: int = 20000,
    seed: int = 0,
    max_waypoints: int = 512,
) -> Optional[np.ndarray]:
    """RRT* expert path (S, 2) from start to goal, or None if not found.

    API analog of the reference's ``RRTStar.plan`` (``ompl_rrtstar.py:
    12-50``): state validity is ``sdf(x) > clearance``, budgeted by
    ``plan_time`` seconds.
    """
    lib = load()
    if lib is None:
        return None
    sdf = np.ascontiguousarray(sdf.astype(np.float32))
    h, w = sdf.shape
    out = np.empty((max_waypoints, 2), np.float32)
    n = lib.rrt_star_2d(
        sdf, h, w,
        float(x_lims[0]), float(x_lims[1]), float(y_lims[0]), float(y_lims[1]),
        float(start[0]), float(start[1]), float(goal[0]), float(goal[1]),
        float(clearance), float(plan_time), int(max_iters), int(seed),
        out.reshape(-1), max_waypoints,
    )
    if n <= 0:
        return None
    return out[:n].copy()


def interpolate_path(path: np.ndarray, num_states: int) -> np.ndarray:
    """Arc-length resample a waypoint path to ``num_states`` points
    (analog of OMPL's ``path.interpolate``, ``ompl_rrtstar.py:41-46``)."""
    seg = np.linalg.norm(np.diff(path, axis=0), axis=-1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    total = s[-1] if s[-1] > 0 else 1.0
    tq = np.linspace(0.0, total, num_states)
    x = np.interp(tq, s, path[:, 0])
    y = np.interp(tq, s, path[:, 1])
    return np.stack([x, y], axis=-1)
