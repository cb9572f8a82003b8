"""Robot models: forward kinematics to workspace collision spheres.

TPU-native rebuild of ``diff_gpmp2/robot_models/`` (``robot_model.py:4``,
``point_robot_2d.py:5``, ``point_robot_xyh.py:5``).  The reference models
are mutable objects with precomputed byte-mask selectors; here each robot is
a frozen (hashable) dataclass of *static* geometry so it can ride along as a
``jax.jit`` static argument, and FK is a pure function over a batched
trajectory pytree.

The collision model is GPMP2's sphere model: the robot body is approximated
by ``nlinks`` spheres; :meth:`fk` maps trajectory states to workspace sphere
centers plus the FK Jacobian consumed by the obstacle factor's chain rule
(``gpmp2/obstacle/obstacle_factor.py:35-40``).

FK output shapes (for input ``th`` of shape (..., D)):
  centers: (..., L, W)     sphere centers in workspace
  jac:     (..., L, W, D)  ∂center/∂state per sphere

An articulated arm plugs in by subclassing :class:`RobotModel` with a real
FK — the interface is the extension point, exactly as in the reference
(``robot_models/robot_model.py:5-15``).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RobotModel:
    """Base robot: static geometry + FK interface."""

    dofs: int
    nlinks: int
    wksp_dim: int
    state_dim: int
    sphere_radii: Tuple[float, ...]

    def fk(self, th: jnp.ndarray):
        raise NotImplementedError

    def radii_array(self, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.asarray(self.sphere_radii, dtype=dtype)


@dataclasses.dataclass(frozen=True)
class PointRobot2D(RobotModel):
    """Holonomic 2-D point robot, state ``[x, y, vx, vy]``.

    FK is the identity on position (``point_robot_2d.py:14-33``): one sphere
    at (x, y) with a constant selector Jacobian.
    """

    dofs: int = 2
    nlinks: int = 1
    wksp_dim: int = 2
    state_dim: int = 4
    sphere_radii: Tuple[float, ...] = (0.4,)

    def fk(self, th: jnp.ndarray):
        centers = th[..., None, :2]  # (..., 1, 2)
        jac = jnp.zeros((2, 4), th.dtype).at[0, 0].set(1.0).at[1, 1].set(1.0)
        jac = jnp.broadcast_to(jac, (*th.shape[:-1], 1, 2, 4))
        return centers, jac


@dataclasses.dataclass(frozen=True)
class PointRobotXYH(RobotModel):
    """Planar robot with heading, state ``[x, y, θ, vx, vy, ω]``.

    FK projects out the heading (``point_robot_xyh.py:20-38``): one sphere at
    (x, y), constant 2×6 selector Jacobian.
    """

    dofs: int = 3
    nlinks: int = 1
    wksp_dim: int = 2
    state_dim: int = 6
    sphere_radii: Tuple[float, ...] = (0.4,)

    def fk(self, th: jnp.ndarray):
        centers = th[..., None, :2]
        jac = jnp.zeros((2, 6), th.dtype).at[0, 0].set(1.0).at[1, 1].set(1.0)
        jac = jnp.broadcast_to(jac, (*th.shape[:-1], 1, 2, 6))
        return centers, jac


def make_robot(robot_data: dict) -> RobotModel:
    """Build a robot from the reference's robot-YAML schema.

    Schema (``examples/configs/robot_2d.yaml``): ``{type, dof,
    sphere_radius, xs, ys}``.
    """
    radii = tuple(float(r) for r in robot_data.get("sphere_radius", [0.4]))
    rtype = robot_data.get("type", "point_robot")
    dof = int(robot_data.get("dof", 2))
    if rtype == "point_robot_xyh" or dof == 3:
        return PointRobotXYH(sphere_radii=radii)
    return PointRobot2D(sphere_radii=radii)
