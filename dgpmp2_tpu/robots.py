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


@dataclasses.dataclass(frozen=True)
class PointRobot3D(RobotModel):
    """Holonomic 3-D point robot, state ``[x, y, z, vx, vy, vz]``.

    3-D workspaces are beyond the 2-D-only reference (its robots live in
    ``robot_models/``, all planar); the factor graph is workspace-dim
    generic, so this is just the identity FK in R³ — pair with
    ``GraphSpec(dof=3, state_dim=6, z_lims=...)`` and a voxel SDF from
    ``ops.sdf.sdf_from_occupancy_3d``.
    """

    dofs: int = 3
    nlinks: int = 1
    wksp_dim: int = 3
    state_dim: int = 6
    sphere_radii: Tuple[float, ...] = (0.4,)

    def fk(self, th: jnp.ndarray):
        centers = th[..., None, :3]  # (..., 1, 3)
        jac = jnp.zeros((3, 6), th.dtype)
        jac = jac.at[0, 0].set(1.0).at[1, 1].set(1.0).at[2, 2].set(1.0)
        jac = jnp.broadcast_to(jac, (*th.shape[:-1], 1, 3, 6))
        return centers, jac


@dataclasses.dataclass(frozen=True)
class PlanarArm2Link(RobotModel):
    """Two-link planar arm, state ``[q1, q2, dq1, dq2]`` (joint space).

    Goes beyond the reference's point robots (SURVEY.md §2.4 names the
    FK interface as the extension point but ships none): real forward
    kinematics with collision spheres distributed along both links and the
    analytic FK Jacobian the obstacle factor chains through.  The GP prior
    lives in joint space unchanged — only :meth:`fk` differs.

    Sphere layout: ``spheres_per_link`` equally spaced centers on each link
    (at fractions (i+1)/n of the link length), so ``nlinks = 2·n``.
    """

    dofs: int = 2
    wksp_dim: int = 2
    state_dim: int = 4
    link_lengths: Tuple[float, float] = (2.5, 2.0)
    base_xy: Tuple[float, float] = (0.0, 0.0)
    spheres_per_link: int = 3
    nlinks: int = 6
    sphere_radii: Tuple[float, ...] = (0.3,) * 6

    def __post_init__(self):
        if self.nlinks != 2 * self.spheres_per_link:
            object.__setattr__(self, "nlinks", 2 * self.spheres_per_link)
        if len(self.sphere_radii) != self.nlinks:
            object.__setattr__(
                self, "sphere_radii", (self.sphere_radii[0],) * self.nlinks
            )

    def fk(self, th: jnp.ndarray):
        l1, l2 = self.link_lengths
        bx, by = self.base_xy
        n = self.spheres_per_link
        q1 = th[..., 0]
        q12 = th[..., 0] + th[..., 1]
        c1, s1 = jnp.cos(q1), jnp.sin(q1)
        c12, s12 = jnp.cos(q12), jnp.sin(q12)

        fracs = [(i + 1) / n for i in range(n)]
        centers = []
        jacs = []
        zeros = jnp.zeros_like(c1)
        for f in fracs:  # link 1 spheres
            px = bx + f * l1 * c1
            py = by + f * l1 * s1
            centers.append(jnp.stack([px, py], -1))
            # ∂p/∂q1 = f·l1·(-s1, c1); ∂p/∂q2 = 0; velocities don't move FK.
            jac = jnp.stack(
                [
                    jnp.stack([-f * l1 * s1, zeros, zeros, zeros], -1),
                    jnp.stack([f * l1 * c1, zeros, zeros, zeros], -1),
                ],
                -2,
            )  # (..., 2, 4)
            jacs.append(jac)
        ex = bx + l1 * c1
        ey = by + l1 * s1
        for f in fracs:  # link 2 spheres
            px = ex + f * l2 * c12
            py = ey + f * l2 * s12
            centers.append(jnp.stack([px, py], -1))
            dq1x = -l1 * s1 - f * l2 * s12
            dq1y = l1 * c1 + f * l2 * c12
            dq2x = -f * l2 * s12
            dq2y = f * l2 * c12
            jac = jnp.stack(
                [
                    jnp.stack([dq1x, dq2x, zeros, zeros], -1),
                    jnp.stack([dq1y, dq2y, zeros, zeros], -1),
                ],
                -2,
            )
            jacs.append(jac)
        return jnp.stack(centers, -2), jnp.stack(jacs, -3)


@dataclasses.dataclass(frozen=True)
class PlanarArmNLink(RobotModel):
    """N-link planar revolute arm, state ``[q_1..q_n, dq_1..dq_n]``.

    Generalizes :class:`PlanarArm2Link` to any link count with one
    vectorized FK: absolute link angles are a ``cumsum`` over joint angles,
    sphere centers are cumulative link-vector sums, and the FK Jacobian
    uses the revolute-chain identity ``∂p/∂q_i = perp(p − joint_i)`` masked
    to joints proximal to the sphere's link — no per-joint special cases.
    The reference names this interface as its extension point but ships no
    arm (``robot_models/robot_model.py:5-15``); the GP prior, factor graph
    and solve are dimension-generic, so the planner works unchanged in
    joint space (``state_dim = 2n``).

    Sphere layout: ``spheres_per_link`` equally spaced centers per link at
    fractions (i+1)/spheres_per_link, so ``nlinks = n·spheres_per_link``.
    """

    link_lengths: Tuple[float, ...] = (1.8, 1.4, 1.0)
    base_xy: Tuple[float, float] = (0.0, 0.0)
    spheres_per_link: int = 2
    wksp_dim: int = 2
    # Derived in __post_init__ from link_lengths/spheres_per_link:
    dofs: int = 0
    state_dim: int = 0
    nlinks: int = 0
    sphere_radii: Tuple[float, ...] = (0.3,)

    def __post_init__(self):
        n = len(self.link_lengths)
        ns = n * self.spheres_per_link
        object.__setattr__(self, "dofs", n)
        object.__setattr__(self, "state_dim", 2 * n)
        object.__setattr__(self, "nlinks", ns)
        if len(self.sphere_radii) != ns:
            object.__setattr__(
                self, "sphere_radii", (self.sphere_radii[0],) * ns
            )

    def fk(self, th: jnp.ndarray):
        n = len(self.link_lengths)
        sp = self.spheres_per_link
        lengths = jnp.asarray(self.link_lengths, th.dtype)
        q = th[..., :n]
        theta = jnp.cumsum(q, axis=-1)  # absolute link angles (..., n)
        u = jnp.stack([jnp.cos(theta), jnp.sin(theta)], -1)  # (..., n, 2)
        seg = lengths[:, None] * u  # (..., n, 2) full link vectors
        base = jnp.asarray(self.base_xy, th.dtype)
        # joint_i position = base + sum of proximal link vectors (..., n, 2)
        joints = base + jnp.cumsum(seg, axis=-2) - seg
        # sphere centers: joint_k + f·seg_k for f = (i+1)/sp  (..., n, sp, 2)
        fracs = jnp.asarray(
            [(i + 1) / sp for i in range(sp)], th.dtype
        )
        centers = (
            joints[..., :, None, :] + fracs[:, None] * seg[..., :, None, :]
        ).reshape(*th.shape[:-1], n * sp, 2)
        # Revolute-chain Jacobian: ∂p/∂q_i = perp(p − joint_i) for joints
        # proximal to the sphere's link, 0 otherwise.
        diff = centers[..., :, None, :] - joints[..., None, :, :]  # (...,L,n,2)
        perp = jnp.stack([-diff[..., 1], diff[..., 0]], -1)  # (..., L, n, 2)
        link_idx = jnp.repeat(jnp.arange(n), sp)  # (L,)
        mask = (link_idx[:, None] >= jnp.arange(n)[None, :]).astype(th.dtype)
        jac_q = perp * mask[..., None]  # (..., L, n, 2)
        jac_q = jnp.swapaxes(jac_q, -1, -2)  # (..., L, 2, n)
        jac = jnp.concatenate([jac_q, jnp.zeros_like(jac_q)], axis=-1)
        return centers, jac


def self_collision_pairs(robot: RobotModel, eps_self: float = 0.05,
                         slack: float = 0.02) -> Tuple[Tuple[int, int], ...]:
    """Sphere index pairs for the self-collision factor
    (:func:`dgpmp2_tpu.core.factors.self_collision_residual`).

    Workspace distance between two spheres can never exceed their
    separation measured along the kinematic chain, so pairs whose rest
    arc separation is within contact range (``r_i + r_j + eps_self +
    slack``) are *permanently* in hinge contact and excluded — keeping
    them would bias every configuration.  Every remaining pair can
    genuinely fold into collision and is included.

    Supports the planar-arm families (anything exposing ``link_lengths``
    and ``spheres_per_link``).
    """
    lengths = getattr(robot, "link_lengths", None)
    sp = getattr(robot, "spheres_per_link", None)
    if lengths is None or sp is None:
        raise ValueError(
            f"{type(robot).__name__} has no chain geometry for "
            "self-collision pair construction")
    arcs = []
    links = []
    acc = 0.0
    for k, lk in enumerate(lengths):
        for i in range(sp):
            arcs.append(acc + (i + 1) / sp * lk)
            links.append(k)
        acc += lk
    pairs = []
    for i in range(len(arcs)):
        for j in range(i + 1, len(arcs)):
            if links[i] == links[j]:
                continue  # same rigid link: distance is constant
            reach = (robot.sphere_radii[i] + robot.sphere_radii[j]
                     + eps_self + slack)
            if arcs[j] - arcs[i] > reach:
                pairs.append((i, j))
    return tuple(pairs)


def make_robot(robot_data: dict) -> RobotModel:
    """Build a robot from the reference's robot-YAML schema.

    Schema (``examples/configs/robot_2d.yaml``): ``{type, dof,
    sphere_radius, xs, ys}``.
    """
    radii = tuple(float(r) for r in robot_data.get("sphere_radius", [0.4]))
    rtype = robot_data.get("type", "point_robot")
    dof = int(robot_data.get("dof", 2))
    if rtype == "planar_arm_2link":
        return PlanarArm2Link(
            link_lengths=tuple(robot_data.get("link_lengths", (2.5, 2.0))),
            base_xy=tuple(robot_data.get("base_xy", (0.0, 0.0))),
            spheres_per_link=int(robot_data.get("spheres_per_link", 3)),
            sphere_radii=radii,
        )
    if rtype == "planar_arm":
        return PlanarArmNLink(
            link_lengths=tuple(robot_data.get("link_lengths", (1.8, 1.4, 1.0))),
            base_xy=tuple(robot_data.get("base_xy", (0.0, 0.0))),
            spheres_per_link=int(robot_data.get("spheres_per_link", 2)),
            sphere_radii=radii,
        )
    if rtype == "point_robot_3d":
        return PointRobot3D(sphere_radii=radii)
    if rtype == "point_robot_xyh" or dof == 3:
        return PointRobotXYH(sphere_radii=radii)
    return PointRobot2D(sphere_radii=radii)
