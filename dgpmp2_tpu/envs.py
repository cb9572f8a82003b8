"""Occupancy environments: SDF queries, transforms, rendering.

Env2D is a rebuild of ``diff_gpmp2/env/env_2d.py`` (SURVEY.md §2.5).  The
planner hot path never touches this class — it consumes raw SDF arrays
through :mod:`dgpmp2_tpu.ops.sdf` — but Env2D keeps the reference's
user-facing surface: initialize from file/array (``env_2d.py:33-62``),
signed-distance queries with Jacobians (``:119-175``), world↔pixel
transforms with the y-flip (``:76-99``), feasibility checks (``:86``), and
matplotlib rendering (``:190-326``).

Env3D extends the same surface to voxel grids (no reference analog — the
reference is strictly planar).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from dgpmp2_tpu.ops import sdf as sdf_ops


class Env2D:
    MAX_D: float

    def __init__(self, env_params: dict):
        self.x_lims = tuple(float(v) for v in env_params["x_lims"])
        self.y_lims = tuple(float(v) for v in env_params["y_lims"])
        self.MAX_D = self.x_lims[1] - self.x_lims[0]
        self.image: Optional[np.ndarray] = None
        self.sedt: Optional[jnp.ndarray] = None
        self._plot = None

    # -- initialization (env_2d.py:33-62) ---------------------------------

    def initialize_from_file(self, envfile: str):
        import matplotlib.pyplot as plt

        img = plt.imread(envfile)
        if img.ndim > 2:
            img = img[..., :3] @ np.array([0.299, 0.587, 0.114])
        self.initialize_from_image(np.asarray(img))

    def initialize_from_image(self, img, sedt=None):
        self.image = np.asarray(img, np.float64)
        self.res = (self.x_lims[1] - self.x_lims[0]) / self.image.shape[1]
        if sedt is None:
            self.sedt = sdf_ops.sdf_from_occupancy(
                jnp.asarray(self.image), res=self.res
            )
        else:
            self.sedt = jnp.asarray(sedt)

    # -- transforms (env_2d.py:76-99) --------------------------------------

    def to_pixel(self, pts):
        pts = np.asarray(pts, np.float64)
        out = np.empty_like(pts)
        out[..., 0] = -self.x_lims[0] / self.res + pts[..., 0] / self.res
        out[..., 1] = -self.y_lims[0] / self.res - pts[..., 1] / self.res
        return out

    def to_world(self, pix):
        pix = np.asarray(pix, np.float64)
        out = np.empty_like(pix)
        out[..., 0] = (pix[..., 0] + self.x_lims[0] / self.res) * self.res
        out[..., 1] = -(pix[..., 1] + self.y_lims[0] / self.res) * self.res
        return out

    def in_limits(self, pt) -> bool:
        return bool(
            self.x_lims[0] <= pt[0] <= self.x_lims[1]
            and self.y_lims[0] <= pt[1] <= self.y_lims[1]
        )

    # -- queries (env_2d.py:119-175) ---------------------------------------

    def get_signed_obstacle_distance(self, pts):
        """(…, 2) world points -> (d, ∇d); out-of-bounds clamp to MAX_D with
        zero gradient (intended reference semantics, SURVEY.md §2.10)."""
        pts = jnp.asarray(pts)
        d, g = sdf_ops.bilinear_lookup(
            self.sedt, pts, self.res, self.x_lims, self.y_lims
        )
        return d, g

    def is_feasible(self, pt, eps: float = 0.0) -> bool:
        """d(pt) > eps (``env_2d.py:86``)."""
        d, _ = self.get_signed_obstacle_distance(jnp.asarray(pt)[None])
        return bool(d[0] > eps)

    # -- rendering (env_2d.py:190-326) --------------------------------------

    def initialize_plot(self, start=None, goal=None, figsize=(6, 6)):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=figsize)
        ax.imshow(
            self.image, cmap="gray",
            extent=(*self.x_lims, *self.y_lims), origin="upper",
        )
        if start is not None:
            ax.plot([start[0]], [start[1]], "go", markersize=9, label="start")
        if goal is not None:
            ax.plot([goal[0]], [goal[1]], "r*", markersize=12, label="goal")
        ax.set_xlim(self.x_lims)
        ax.set_ylim(self.y_lims)
        self._plot = (fig, ax)
        return fig, ax

    def plot_edge(self, path, color="blue", linestyle="-", label=None, **kw):
        _, ax = self._plot
        path = np.asarray(path)
        ax.plot(path[:, 0], path[:, 1], color=color, linestyle=linestyle,
                label=label, **kw)

    def plot_signed_distance_transform(self):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        m = ax.imshow(
            np.asarray(self.sedt), cmap="coolwarm",
            extent=(*self.x_lims, *self.y_lims), origin="upper",
        )
        fig.colorbar(m, ax=ax)
        return fig, ax

    def plot_costmap(self, eps: float):
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        cm = np.asarray(sdf_ops.costmap_2d(self.sedt, eps))
        m = ax.imshow(cm, extent=(*self.x_lims, *self.y_lims), origin="upper")
        fig.colorbar(m, ax=ax)
        return fig, ax

    def save_plot(self, path: str):
        self._plot[0].savefig(path, bbox_inches="tight", dpi=120)

    def close_plot(self):
        if self._plot is not None:
            import matplotlib.pyplot as plt

            plt.close(self._plot[0])
            self._plot = None


class Env3D:
    """3-D voxel-occupancy environment (beyond the 2-D-only reference).

    Same surface as :class:`Env2D` — SDF construction, world↔voxel
    transforms, distance queries with gradients, feasibility — over a
    ``(D, H, W)`` occupancy grid indexed ``[z, row, col]``: the trailing
    two axes keep the 2-D image convention (x → col, y → row with the
    y-flip), and z is unflipped with voxel 0 at ``z_lims[0]``.  Rendering
    is by z-slice through the underlying 2-D machinery.
    """

    MAX_D: float

    def __init__(self, env_params: dict):
        self.x_lims = tuple(float(v) for v in env_params["x_lims"])
        self.y_lims = tuple(float(v) for v in env_params["y_lims"])
        self.z_lims = tuple(float(v) for v in env_params["z_lims"])
        self.MAX_D = self.x_lims[1] - self.x_lims[0]
        self.voxels: Optional[np.ndarray] = None
        self.sedt: Optional[jnp.ndarray] = None

    def initialize_from_voxels(self, vox, sedt=None):
        """``vox``: (D, H, W) occupancy, >0.75 ⇒ free (image convention)."""
        self.voxels = np.asarray(vox, np.float64)
        self.res = (self.x_lims[1] - self.x_lims[0]) / self.voxels.shape[-1]
        if sedt is None:
            self.sedt = sdf_ops.sdf_from_occupancy_3d(
                jnp.asarray(self.voxels), res=self.res
            )
        else:
            self.sedt = jnp.asarray(sedt)

    # -- transforms ---------------------------------------------------------

    def to_voxel_xyz(self, pts):
        """(…, 3) world (x, y, z) -> fractional (col, row, depth) indices.

        AXIS-ORDER WARNING: this returns **xyz order** (col, row, depth) —
        the order :func:`ops.sdf.trilinear_lookup` expects for query
        points.  The dataset generator's
        :func:`data.generate3d.world_to_vox_zyx` returns the OPPOSITE
        **zyx order** (depth, row, col), matching the ``(D, H, W)`` grid
        indexing that ``data.obstacles3d`` carves into.  Both helpers name
        their order explicitly so a caller can never silently transpose.
        """
        pts = np.asarray(pts, np.float64)
        out = np.empty_like(pts)
        out[..., 0] = -self.x_lims[0] / self.res + pts[..., 0] / self.res
        out[..., 1] = -self.y_lims[0] / self.res - pts[..., 1] / self.res
        out[..., 2] = -self.z_lims[0] / self.res + pts[..., 2] / self.res
        return out

    def to_world(self, vox):
        vox = np.asarray(vox, np.float64)
        out = np.empty_like(vox)
        out[..., 0] = (vox[..., 0] + self.x_lims[0] / self.res) * self.res
        out[..., 1] = -(vox[..., 1] + self.y_lims[0] / self.res) * self.res
        out[..., 2] = (vox[..., 2] + self.z_lims[0] / self.res) * self.res
        return out

    def in_limits(self, pt) -> bool:
        return bool(
            self.x_lims[0] <= pt[0] <= self.x_lims[1]
            and self.y_lims[0] <= pt[1] <= self.y_lims[1]
            and self.z_lims[0] <= pt[2] <= self.z_lims[1]
        )

    # -- queries -------------------------------------------------------------

    def get_signed_obstacle_distance(self, pts):
        """(…, 3) world points -> (d, ∇d); out-of-bounds clamp to MAX_D
        with zero gradient (same semantics as the 2-D lookup)."""
        pts = jnp.asarray(pts)
        return sdf_ops.trilinear_lookup(
            self.sedt, pts, self.res, self.x_lims, self.y_lims, self.z_lims
        )

    def is_feasible(self, pt, eps: float = 0.0) -> bool:
        d, _ = self.get_signed_obstacle_distance(jnp.asarray(pt)[None])
        return bool(d[0] > eps)

    # -- rendering ------------------------------------------------------------

    def slice_env2d(self, z: float) -> Env2D:
        """The occupancy slice nearest world height ``z`` as an Env2D
        (full 2-D plotting surface on that slice).  The attached SDF is
        the z-slice of the TRUE 3-D field — distances account for
        obstacles above/below the plane, unlike a 2-D EDT of the slice."""
        iz = int(round(-self.z_lims[0] / self.res + z / self.res))
        iz = max(0, min(self.voxels.shape[0] - 1, iz))
        env = Env2D({"x_lims": self.x_lims, "y_lims": self.y_lims})
        env.initialize_from_image(self.voxels[iz], sedt=self.sedt[iz])
        return env
