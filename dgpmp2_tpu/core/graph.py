"""Factor-graph specification and block-sparse normal-equation assembly.

TPU-native replacement for the reference's linear-system engine
(``diff_gpmp2/gpmp2/plan_layer.py``, SURVEY.md §2.2).  The reference
precomputes boolean scatter masks and builds the dense ``(B, M, N)``
Jacobian ``A``, dense ``(B, M, M)`` weights ``K``, then forms ``AᵀKA`` with
two batched matmuls (``plan_layer.py:152-234``).  Because every factor is
unary or couples adjacent states, ``AᵀKA`` is symmetric block-tridiagonal —
so we assemble its ``D×D`` blocks *directly* from factor evaluations and
never materialize ``A``/``K`` at all:

    diag_i  = Σ  H_fᵀ Λ_f H_f      over factors touching state i
    off_i   = -Φᵀ Q⁻¹_i            (the only inter-state coupling: GP)
    rhs_i   = Σ  H_fᵀ Λ_f r_f

Work per GN iteration drops from O(B·M·N + B·N³) dense to O(B·T·D³), and
memory from O(B·M·N) to O(B·T·D²).

Everything here is a pure function of (spec, params, trajectory, sdf):
``spec`` is static (hashable) configuration, ``params`` a pytree of means /
inverse covariances that may be constants or network outputs — gradients
flow through assembly into learned covariances exactly as the reference's
autograd does through ``masked_scatter_``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import functools

import jax
import jax.numpy as jnp
from jax import lax
from flax import struct

from dgpmp2_tpu.core import factors
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import RobotModel

# Tiny-dim contractions written as explicit broadcast-multiply-reduce so
# they stay on the VPU: einsum/matmul at D<=6 lowers to MXU tiles padded to
# 128x128 (and 6-pass at HIGHEST precision) — measurably slower than the
# handful of fused elementwise ops they actually are.
def _mv(mat, vec):
    """(..., i, j) x (..., j) -> (..., i)."""
    return jnp.sum(mat * vec[..., None, :], axis=-1)


def _phiT_left(q, dof, dt):
    """Φᵀ·Q for the CV-GP transition: Φᵀ = [[I, 0], [dt·I, I]] — block adds,
    no matmul (Φ structure from ``gp_factor.py:31-37``)."""
    top = q[..., :dof, :]
    bot = dt * top + q[..., dof:, :]
    return jnp.concatenate([top, bot], axis=-2)


def _phi_right(m, dof, dt):
    """M·Φ with Φ = [[I, dt·I], [0, I]]: col₂ -> dt·col₁ + col₂."""
    left = m[..., :, :dof]
    right = dt * left + m[..., :, dof:]
    return jnp.concatenate([left, right], axis=-1)


@dataclasses.dataclass(frozen=True)
class GraphSpec:
    """Static problem dimensions & options (``plan_layer.py:26-46``)."""

    dof: int = 2
    state_dim: int = 4
    total_time_sec: float = 10.0
    total_time_step: int = 100  # T; trajectory has T+1 states
    nlinks: int = 1
    x_lims: Tuple[float, float] = (-5.0, 5.0)
    y_lims: Tuple[float, float] = (-5.0, 5.0)
    # 3-D workspace switch (beyond the 2-D-only reference): when set, the
    # SDF is a (..., D, H, W) voxel grid, obstacle lookups are trilinear,
    # and robots must produce 3-vector sphere centers (e.g. PointRobot3D).
    z_lims: Optional[Tuple[float, float]] = None
    non_holonomic: bool = False
    use_vel_limits: bool = False
    # GP-interpolated dense collision checking: `num_inter` obstacle checks
    # per GP segment at the CV-GP posterior mean (the mechanism the
    # reference only stubs out via use_gp_inter/total_check_step,
    # gpmp2_planner.py:29-41; SURVEY.md §5.7).
    use_gp_inter: bool = False
    num_inter: int = 3
    # Sphere-sphere self-collision hinges for articulated robots (beyond
    # the reference, which ships only point robots — SURVEY.md §2.4).
    # ``self_pairs`` is a static tuple of (sphere_i, sphere_j) index pairs;
    # see ``robots.self_collision_pairs`` for a geometry-aware default.
    use_self_collision: bool = False
    self_pairs: Tuple[Tuple[int, int], ...] = ()
    # Per-joint position-limit hinges (companion of use_vel_limits; the
    # original GPMP2 C++ has the analogous JointLimitFactor).
    use_joint_limits: bool = False
    # Terminal end-effector workspace goal (task-space targets without
    # explicit IK — GPMP2-C++ workspace-factor capability).
    use_workspace_goal: bool = False

    @property
    def num_self_pairs(self) -> int:
        return len(self.self_pairs)

    @property
    def num_traj_states(self) -> int:
        return self.total_time_step + 1

    @property
    def num_gp_factors(self) -> int:
        return self.total_time_step

    @property
    def dt(self) -> float:
        return float(self.total_time_sec) / float(self.total_time_step)

    @property
    def M(self) -> int:
        """Total residual dimension — the error normalizer (``plan_layer.py:43-45``)."""
        m = self.state_dim * (self.num_gp_factors + 2)
        m += self.num_traj_states * self.nlinks
        if self.non_holonomic:
            m += self.num_traj_states
        if self.use_vel_limits:
            m += self.dof * self.num_traj_states
        if self.use_joint_limits:
            m += self.dof * self.num_traj_states
        if self.use_workspace_goal:
            m += 2  # wksp_dim rows at the terminal state
        if self.use_self_collision:
            m += self.num_self_pairs * self.num_traj_states
        if self.use_gp_inter:
            m += self.num_gp_factors * self.num_inter * self.nlinks
        return m

    @property
    def N(self) -> int:
        return self.state_dim * self.num_traj_states

    def res(self, sdf_width: int) -> float:
        """Metres per pixel, recomputed from the SDF width exactly as the
        reference hot path does (``obstacle_cost.py:35``)."""
        return (self.x_lims[1] - self.x_lims[0]) / float(sdf_width)

    def validate_grid(self, sdf_shape) -> None:
        """Trace-time check that the SDF grid is consistent with the world
        extents at the x-derived resolution.

        ``res`` is derived solely from the x extent and the grid width; a
        non-cubic voxel grid or mismatched ``y_lims``/``z_lims`` would
        otherwise silently read the SDF at wrong y/z coordinates (the
        trilinear lookup takes a single scalar ``res``).  Shapes are
        static under jit, so this costs nothing at runtime.
        """
        r = self.res(sdf_shape[-1])
        y_ext = self.y_lims[1] - self.y_lims[0]
        checks = [("y_lims", y_ext, sdf_shape[-2])]
        if self.z_lims is not None:
            z_ext = self.z_lims[1] - self.z_lims[0]
            checks.append(("z_lims", z_ext, sdf_shape[-3]))
        for name, ext, cells in checks:
            got = ext / float(cells)
            if abs(got - r) > 1e-6 * max(abs(r), 1.0):
                raise ValueError(
                    f"SDF grid inconsistent with workspace extents: "
                    f"{name} extent {ext} over {cells} cells gives "
                    f"{got:.6g} m/cell but x-derived res is {r:.6g} "
                    f"m/cell (sdf shape {tuple(sdf_shape)}, x_lims "
                    f"{self.x_lims}, y_lims {self.y_lims}, z_lims "
                    f"{self.z_lims}); voxels must be square/cubical"
                )


class GraphParams(struct.PyTreeNode):
    """Per-problem factor parameters (batched pytree).

    Shapes (B = batch, T = total_time_step, D = state_dim, L = nlinks):
      start, goal: (B, D) prior means.
      q_inv:   (B, T, D, D) full GP inverse covariance per factor — expand a
               learned/static ``Q_c⁻¹`` with :func:`factors.gp_q_inv`, or
               inject directly (``dynamics_mode='q_full'``,
               ``plan_layer.py:90``).
      ks_inv, kg_inv: (B, D, D) start/goal prior inverse covariances.
      obs_inv: (B, T+1, L, L) obstacle inverse covariances.
      eps:     (B, T+1, L) obstacle safety margins.
      dyn_inv: (B, T+1) nonholonomic weights (None unless enabled).
      vel_inv: (B, T+1, dof, dof) velocity-limit inverse covs (None unless
               enabled).
      v_lim:   (B, T+1, dof) per-axis velocity limits.
      self_inv: (B, T+1, P) self-collision hinge weights (None unless
               enabled).
      self_eps: (B, T+1, P) self-collision safety margins.
      jl_inv:  (B, T+1, dof, dof) joint-limit inverse covs (None unless
               enabled).
      q_min, q_max: (B, T+1, dof) per-joint position limits.
      wg_inv:  (B, W, W) workspace-goal inverse covariance.
      p_goal:  (B, W) workspace end-effector target.
    """

    start: jnp.ndarray
    goal: jnp.ndarray
    q_inv: jnp.ndarray
    ks_inv: jnp.ndarray
    kg_inv: jnp.ndarray
    obs_inv: jnp.ndarray
    eps: jnp.ndarray
    dyn_inv: Optional[jnp.ndarray] = None
    vel_inv: Optional[jnp.ndarray] = None
    v_lim: Optional[jnp.ndarray] = None
    self_inv: Optional[jnp.ndarray] = None
    self_eps: Optional[jnp.ndarray] = None
    jl_inv: Optional[jnp.ndarray] = None
    q_min: Optional[jnp.ndarray] = None
    q_max: Optional[jnp.ndarray] = None
    wg_inv: Optional[jnp.ndarray] = None
    p_goal: Optional[jnp.ndarray] = None


class FactorResiduals(struct.PyTreeNode):
    """All factor residuals/Jacobians at one linearization point.

    Evaluating these is the expensive part of an iteration (the SDF lookup
    in particular); the reference re-evaluates the whole factor graph three
    or more times per GN step (system build + ``error_batch`` +
    ``error_ext_batch``, ``plan_layer.py:95-98``).  Here they are computed
    once and shared by assembly and every error functional.
    """

    r_gp: jnp.ndarray  # (B, T, D)
    r_s: jnp.ndarray  # (B, D)
    r_g: jnp.ndarray  # (B, D)
    r_obs: jnp.ndarray  # (B, T+1, L)
    h_obs: jnp.ndarray  # (B, T+1, L, D)
    r_dyn: Optional[jnp.ndarray] = None  # (B, T+1)
    h_dyn: Optional[jnp.ndarray] = None  # (B, T+1, D)
    r_vel: Optional[jnp.ndarray] = None  # (B, T+1, dof)
    h_vel: Optional[jnp.ndarray] = None  # (B, T+1, dof, D)
    r_obsi: Optional[jnp.ndarray] = None  # (B, T, nip, L) interp hinge
    h_obsi: Optional[jnp.ndarray] = None  # (B, T, nip, L, D) wrt interp state
    r_self: Optional[jnp.ndarray] = None  # (B, T+1, P) self-collision hinge
    h_self: Optional[jnp.ndarray] = None  # (B, T+1, P, D)
    r_jl: Optional[jnp.ndarray] = None  # (B, T+1, dof) joint-limit hinge
    h_jl: Optional[jnp.ndarray] = None  # (B, T+1, dof, D)
    r_wg: Optional[jnp.ndarray] = None  # (B, W) terminal workspace goal
    h_wg: Optional[jnp.ndarray] = None  # (B, W, D)


def eval_residuals(
    spec: GraphSpec,
    robot: RobotModel,
    params: GraphParams,
    th: jnp.ndarray,
    sdf: jnp.ndarray,
) -> FactorResiduals:
    """Evaluate every factor once at ``th`` (one SDF lookup total)."""
    spec.validate_grid(sdf.shape)
    dtype = th.dtype
    r_gp = factors.gp_residual(th, dt=spec.dt)
    r_s = factors.prior_residual(params.start, th[..., 0, :])
    r_g = factors.prior_residual(params.goal, th[..., -1, :])
    centers, jac_fk = robot.fk(th)
    r_obsi = h_obsi = None
    if spec.use_gp_inter:
        # One fused SDF lookup covers support AND interpolated states.
        lam, psi = factors.gp_interp_coeffs(spec.dof, spec.dt,
                                            spec.num_inter, dtype)
        th_tau = factors.gp_interpolate(th, lam, psi)  # (B, T, nip, D)
        centers_i, jac_fk_i = robot.fk(th_tau)  # (B, T, nip, L, W[, D])
        b_shape = th.shape[:-2]
        wd = centers.shape[-1]  # workspace dim: 2, or 3 with z_lims set
        tn, t, nip, l = (spec.num_traj_states, spec.num_gp_factors,
                         spec.num_inter, spec.nlinks)
        pts = jnp.concatenate(
            [centers.reshape(*b_shape, tn * l, wd),
             centers_i.reshape(*b_shape, t * nip * l, wd)], axis=-2,
        )
        d_all, grad_all = sdf_ops.lookup_nd(
            sdf, pts, spec.res(sdf.shape[-1]), spec.x_lims, spec.y_lims,
            spec.z_lims,
        )
        d_m = d_all[..., : tn * l].reshape(*b_shape, tn, l)
        g_m = grad_all[..., : tn * l, :].reshape(*b_shape, tn, l, wd)
        d_i = d_all[..., tn * l :].reshape(*b_shape, t, nip, l)
        g_i = grad_all[..., tn * l :, :].reshape(*b_shape, t, nip, l, wd)
        radii = robot.radii_array(dtype)
        r_obs, h_obs = factors.hinge_from_lookup(
            d_m, g_m, jac_fk, radii, params.eps
        )
        eps_i = params.eps[..., :-1, None, :]  # left-support margin
        r_obsi, h_obsi = factors.hinge_from_lookup(
            d_i, g_i, jac_fk_i, radii, eps_i
        )
    else:
        r_obs, h_obs = factors.hinge_obstacle_residual(
            centers, jac_fk, robot.radii_array(dtype), params.eps, sdf,
            spec.res(sdf.shape[-1]), spec.x_lims, spec.y_lims, spec.z_lims,
        )
    r_dyn = h_dyn = r_vel = h_vel = r_self = h_self = r_jl = h_jl = None
    if spec.non_holonomic:
        r_dyn, h_dyn = factors.nonholonomic_residual(th)
    if spec.use_vel_limits:
        r_vel, h_vel = factors.velocity_limit_residual(th, params.v_lim, spec.dof)
    if spec.use_joint_limits:
        r_jl, h_jl = factors.joint_limit_residual(th, params.q_min,
                                                  params.q_max, spec.dof)
    if spec.use_self_collision:
        pairs = jnp.asarray(spec.self_pairs, jnp.int32)
        r_self, h_self = factors.self_collision_residual(
            centers, jac_fk, robot.radii_array(dtype),
            pairs[:, 0], pairs[:, 1], params.self_eps,
        )
    r_wg = h_wg = None
    if spec.use_workspace_goal:
        r_wg, h_wg = factors.workspace_goal_residual(
            centers[..., -1, :, :], jac_fk[..., -1, :, :, :], params.p_goal
        )
    return FactorResiduals(r_gp=r_gp, r_s=r_s, r_g=r_g, r_obs=r_obs,
                           h_obs=h_obs, r_dyn=r_dyn, h_dyn=h_dyn,
                           r_vel=r_vel, h_vel=h_vel,
                           r_obsi=r_obsi, h_obsi=h_obsi,
                           r_self=r_self, h_self=h_self,
                           r_jl=r_jl, h_jl=h_jl, r_wg=r_wg, h_wg=h_wg)


class StaticBlocks(struct.PyTreeNode):
    """Iteration-invariant pieces of the normal equations.

    For the CV-GP prior + start/goal priors, ``H`` is constant, so their
    Gauss part (``HᵀΛH``) never changes across GN iterations — only the rhs
    does.  Precomputing it outside the plan loop removes ~half the
    per-iteration block traffic for fixed-covariance planning.

    diag_static: (B, T+1, D, D) GP/prior contributions to the diagonal.
    off:         (B, T, D, D) the full off-diagonal (-ΦᵀQ⁻¹ — GP only).
    phiT_q:      (B, T, D, D) ΦᵀQ⁻¹, reused for the GP rhs.
    """

    diag_static: jnp.ndarray
    off: jnp.ndarray
    phiT_q: jnp.ndarray


def assemble_static(spec: GraphSpec, params: GraphParams, dtype) -> StaticBlocks:
    """GP + prior Gauss blocks (constant across iterations)."""
    d = spec.state_dim
    tn = spec.num_traj_states
    dof = spec.dof
    q_inv = params.q_inv
    batch = q_inv.shape[:-3]
    # H1 = Φ (w.r.t. x_i), H2 = -I (w.r.t. x_{i+1}):
    #   diag_i += Φᵀ Q⁻¹ Φ ;  diag_{i+1} += Q⁻¹ ;  off_i = -Φᵀ Q⁻¹
    # Φ's block structure makes all of these elementwise (no matmuls).
    phiT_q = _phiT_left(q_inv, dof, spec.dt).astype(dtype)
    diag = jnp.zeros((*batch, tn, d, d), dtype)
    diag = diag.at[..., :-1, :, :].add(_phi_right(phiT_q, dof, spec.dt))
    diag = diag.at[..., 1:, :, :].add(q_inv)
    diag = diag.at[..., 0, :, :].add(params.ks_inv)
    diag = diag.at[..., -1, :, :].add(params.kg_inv)
    return StaticBlocks(diag_static=diag, off=-phiT_q, phiT_q=phiT_q)


def assemble_from_residuals(
    spec: GraphSpec,
    params: GraphParams,
    res: FactorResiduals,
    dtype=None,
    static: Optional[StaticBlocks] = None,
):
    """Assemble block-tridiagonal GN normal equations from residuals.

    Returns:
      diag (B, T+1, D, D), off (B, T, D, D), rhs (B, T+1, D) such that the
      dense system the reference builds satisfies ``AᵀKA = blocktridiag(diag,
      off)`` and ``AᵀKb = rhs``.

    Pass a precomputed ``static`` (from :func:`assemble_static`) inside
    iteration loops where ``params`` is fixed.
    """
    tn = spec.num_traj_states
    dtype = res.r_gp.dtype if dtype is None else dtype

    if static is None:
        static = assemble_static(spec, params, dtype)
    diag = static.diag_static
    off = static.off
    phiT_q = static.phiT_q
    q_inv = params.q_inv

    # --- rhs from GP + prior residuals -----------------------------------
    #   rhs_i += Φᵀ Q⁻¹ r ; rhs_{i+1} -= Q⁻¹ r ; endpoints += K⁻¹ r
    r_gp = res.r_gp  # (B, T, D)
    batch = r_gp.shape[:-2]
    d = spec.state_dim
    rhs = jnp.zeros((*batch, tn, d), dtype)
    rhs = rhs.at[..., :-1, :].add(_mv(phiT_q, r_gp))
    rhs = rhs.at[..., 1:, :].add(-_mv(q_inv, r_gp))
    rhs = rhs.at[..., 0, :].add(_mv(params.ks_inv, res.r_s))
    rhs = rhs.at[..., -1, :].add(_mv(params.kg_inv, res.r_g))

    def unary_gauss(diag, rhs, h, r, lam_h):
        """Per-state Gauss terms of a unary factor with K residual rows:
        diag += Σ_k h_k ⊗ (Λh)_k ; rhs += Σ_k (Λh)_k·r_k — every unary
        factor shares this shape; only Λh differs by weight structure."""
        diag = diag + jnp.sum(
            h[..., :, :, None] * lam_h[..., :, None, :], axis=-3
        )
        rhs = rhs + jnp.sum(lam_h * r[..., None], axis=-2)
        return diag, rhs

    def lam_full(w, h):  # full (K, K) inverse covariance
        return jnp.sum(w[..., :, :, None] * h[..., None, :, :], axis=-2)

    # --- Obstacle factors (unary; L is tiny and static) -------------------
    diag, rhs = unary_gauss(diag, rhs, res.h_obs, res.r_obs,
                            lam_full(params.obs_inv, res.h_obs))

    # --- Nonholonomic constraint (unary, scalar residual) ----------------
    if spec.non_holonomic:
        h_dyn = res.h_dyn[..., None, :]  # (B, T+1, 1, D)
        diag, rhs = unary_gauss(
            diag, rhs, h_dyn, res.r_dyn[..., None],
            params.dyn_inv[..., None, None] * h_dyn,
        )

    # --- Velocity limits (unary, dof residuals) --------------------------
    if spec.use_vel_limits:
        diag, rhs = unary_gauss(diag, rhs, res.h_vel, res.r_vel,
                                lam_full(params.vel_inv, res.h_vel))

    # --- Joint position limits (unary, dof residuals) --------------------
    if spec.use_joint_limits:
        diag, rhs = unary_gauss(diag, rhs, res.h_jl, res.r_jl,
                                lam_full(params.jl_inv, res.h_jl))

    # --- Self-collision hinges (unary, P pair residuals, diag weights) ---
    if spec.use_self_collision:
        diag, rhs = unary_gauss(diag, rhs, res.h_self, res.r_self,
                                params.self_inv[..., None] * res.h_self)

    # --- Terminal workspace goal (unary at the last state) ---------------
    if spec.use_workspace_goal:
        h_wg = res.h_wg  # (B, W, D)
        lam_hw = jnp.sum(
            params.wg_inv[..., :, :, None] * h_wg[..., None, :, :], axis=-2
        )  # (B, W, D)
        diag = diag.at[..., -1, :, :].add(
            jnp.sum(h_wg[..., :, :, None] * lam_hw[..., :, None, :], axis=-3)
        )
        rhs = rhs.at[..., -1, :].add(
            jnp.sum(lam_hw * res.r_wg[..., None], axis=-2)
        )

    # --- GP-interpolated obstacle factors (binary: couple x_t, x_{t+1}) --
    if spec.use_gp_inter:
        # H wrt supports chains through the interpolation matrices:
        #   H_t = h·Λ_k, H_{t+1} = h·Ψ_k  ->  a_L = Λᵀhᵀ, a_P = Ψᵀhᵀ.
        lam_m, psi_m = factors.gp_interp_coeffs(
            spec.dof, spec.dt, spec.num_inter, dtype
        )
        h_i = res.h_obsi  # (B, T, nip, L, D) wrt interpolated state
        lam_t = jnp.swapaxes(lam_m, -1, -2)[:, None, :, :]  # (nip,1,D,D)
        psi_t = jnp.swapaxes(psi_m, -1, -2)[:, None, :, :]
        a_l = jnp.sum(lam_t * h_i[..., None, :], axis=-1)  # (B,T,nip,L,D)
        a_p = jnp.sum(psi_t * h_i[..., None, :], axis=-1)
        w = params.obs_inv[..., :-1, None, :, :]  # left-support Λ_obs
        lam_al = jnp.sum(w[..., :, :, None] * a_l[..., None, :, :], axis=-2)
        lam_ap = jnp.sum(w[..., :, :, None] * a_p[..., None, :, :], axis=-2)
        lam_r = jnp.sum(w * res.r_obsi[..., None, :], axis=-1)  # (B,T,nip,L)
        # Sum over (nip, L).
        diag = diag.at[..., :-1, :, :].add(
            jnp.sum(a_l[..., :, None] * lam_al[..., None, :], axis=(-4, -3))
        )
        diag = diag.at[..., 1:, :, :].add(
            jnp.sum(a_p[..., :, None] * lam_ap[..., None, :], axis=(-4, -3))
        )
        off = off + jnp.sum(
            a_l[..., :, None] * lam_ap[..., None, :], axis=(-4, -3)
        )
        rhs = rhs.at[..., :-1, :].add(
            jnp.sum(a_l * lam_r[..., None], axis=(-3, -2))
        )
        rhs = rhs.at[..., 1:, :].add(
            jnp.sum(a_p * lam_r[..., None], axis=(-3, -2))
        )

    return diag, off, rhs


def assemble(
    spec: GraphSpec,
    robot: RobotModel,
    params: GraphParams,
    th: jnp.ndarray,
    sdf: jnp.ndarray,
):
    """Assemble block-tridiagonal GN normal equations at linearization ``th``."""
    res = eval_residuals(spec, robot, params, th, sdf)
    return assemble_from_residuals(spec, params, res, dtype=th.dtype)


def error_from_residuals(
    spec: GraphSpec,
    params: GraphParams,
    res: FactorResiduals,
    q_inv: Optional[jnp.ndarray] = None,
    obs_inv: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Total weighted factor-graph error from precomputed residuals.

    ``err = (Σ_f ½ r_fᵀ Λ_f r_f) / M`` over all factors
    (``plan_layer.py:273-345``).  Pass ``q_inv`` / ``obs_inv`` to override
    the GP/obstacle weights — that is how ``error_ext`` pins *fixed*
    external covariances so learned weights can't game the metric
    (``plan_layer.py:78-81,310-345``).  Returns (B,).
    """
    q_inv = params.q_inv if q_inv is None else q_inv
    obs_inv = params.obs_inv if obs_inv is None else obs_inv

    err = 0.5 * jnp.sum(_mv(params.ks_inv, res.r_s) * res.r_s, axis=-1)
    err += 0.5 * jnp.sum(_mv(params.kg_inv, res.r_g) * res.r_g, axis=-1)
    err += 0.5 * jnp.sum(_mv(q_inv, res.r_gp) * res.r_gp, axis=(-2, -1))
    err += 0.5 * jnp.sum(_mv(obs_inv, res.r_obs) * res.r_obs, axis=(-2, -1))
    if spec.non_holonomic:
        err += 0.5 * jnp.sum(params.dyn_inv * res.r_dyn**2, axis=-1)
    if spec.use_vel_limits:
        err += 0.5 * jnp.sum(
            _mv(params.vel_inv, res.r_vel) * res.r_vel, axis=(-2, -1)
        )
    if spec.use_joint_limits:
        err += 0.5 * jnp.sum(
            _mv(params.jl_inv, res.r_jl) * res.r_jl, axis=(-2, -1)
        )
    if spec.use_self_collision:
        err += 0.5 * jnp.sum(params.self_inv * res.r_self**2, axis=(-2, -1))
    if spec.use_workspace_goal:
        err += 0.5 * jnp.sum(_mv(params.wg_inv, res.r_wg) * res.r_wg, axis=-1)
    if spec.use_gp_inter:
        w = obs_inv[..., :-1, None, :, :]
        err += 0.5 * jnp.sum(
            jnp.sum(w * res.r_obsi[..., None, :], axis=-1) * res.r_obsi,
            axis=(-3, -2, -1),
        )
    return err / spec.M


def graph_error(
    spec: GraphSpec,
    robot: RobotModel,
    params: GraphParams,
    th: jnp.ndarray,
    sdf: jnp.ndarray,
    q_inv: Optional[jnp.ndarray] = None,
    obs_inv: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Total weighted factor-graph error at ``th``, normalized by M."""
    res = eval_residuals(spec, robot, params, th, sdf)
    return error_from_residuals(spec, params, res, q_inv, obs_inv)


def unweighted_errors_from_residuals(res: FactorResiduals):
    """Unweighted per-term errors for task losses (``plan_layer.py:374-388``).

    Returns ``(err_sg, err_gp, err_obs)`` each shaped (B,):
      err_sg  = ½‖r_start‖² + ½‖r_goal‖²
      err_gp  = mean_t ½‖r_gp,t‖²
      err_obs = mean_t ½‖r_obs,t‖²
    """
    err_sg = 0.5 * jnp.sum(res.r_s**2, -1) + 0.5 * jnp.sum(res.r_g**2, -1)
    err_gp = jnp.mean(0.5 * jnp.sum(res.r_gp**2, -1), axis=-1)
    err_obs = jnp.mean(0.5 * jnp.sum(res.r_obs**2, -1), axis=-1)
    return err_sg, err_gp, err_obs


def unweighted_errors(
    spec: GraphSpec,
    robot: RobotModel,
    params: GraphParams,
    th: jnp.ndarray,
    sdf: jnp.ndarray,
):
    return unweighted_errors_from_residuals(
        eval_residuals(spec, robot, params, th, sdf)
    )


def linear_error(
    spec: GraphSpec,
    robot: RobotModel,
    params: GraphParams,
    th: jnp.ndarray,
    sdf: jnp.ndarray,
) -> jnp.ndarray:
    """Stacked residual vector ``b`` (B, M) in the reference's row layout.

    ``PlanLayer.linear_error`` (``plan_layer.py:347-372``): start prior rows,
    GP rows, goal prior rows, obstacle rows, then optional
    nonholonomic / velocity / interpolated rows.
    """
    res = eval_residuals(spec, robot, params, th, sdf)
    batch = res.r_gp.shape[:-2]
    parts = [
        res.r_s,
        res.r_gp.reshape(*batch, -1),
        res.r_g,
        res.r_obs.reshape(*batch, -1),
    ]
    if spec.non_holonomic:
        parts.append(res.r_dyn)
    if spec.use_vel_limits:
        parts.append(res.r_vel.reshape(*batch, -1))
    if spec.use_joint_limits:
        parts.append(res.r_jl.reshape(*batch, -1))
    if spec.use_self_collision:
        parts.append(res.r_self.reshape(*batch, -1))
    if spec.use_workspace_goal:
        parts.append(res.r_wg)
    if spec.use_gp_inter:
        parts.append(res.r_obsi.reshape(*batch, -1))
    return jnp.concatenate(parts, axis=-1)


def obstacle_residuals(spec, robot, params, th, sdf):
    """Raw per-state hinge residuals (B, T+1, L) — used by collision metrics."""
    centers, jac_fk = robot.fk(th)
    r_obs, _ = factors.hinge_obstacle_residual(
        centers,
        jac_fk,
        robot.radii_array(th.dtype),
        params.eps,
        sdf,
        spec.res(sdf.shape[-1]),
        spec.x_lims,
        spec.y_lims,
        spec.z_lims,
    )
    return r_obs


def default_params(
    spec: GraphSpec,
    robot: RobotModel,
    start: jnp.ndarray,
    goal: jnp.ndarray,
    qc_inv,
    cost_sigma,
    epsilon_dist,
    k_s,
    k_g,
    k_d=None,
    k_v=None,
    v_x=None,
    v_y=None,
    k_self=None,
    eps_self=None,
    k_jl=None,
    q_min=None,
    q_max=None,
    k_wg=None,
    workspace_goal=None,
    dtype=jnp.float32,
) -> GraphParams:
    """Build fixed-covariance GraphParams from reference YAML scalars.

    Mirrors ``DiffGPMP2Planner.__init__`` static-covariance setup
    (``diff_gpmp2_planner.py:42-51``, ``plan_layer.py:52-68``): isotropic
    ``K_s⁻¹ = I/K_s²``, ``K_g⁻¹ = I/K_g²``, obstacle ``Λ = I/σ²``, GP
    ``Q_c⁻¹`` expanded via :func:`factors.gp_q_inv`.

    ``start``/``goal`` are (B, D); all covariances broadcast over B.
    """
    b = start.shape[0]
    d, tn, t, l = spec.state_dim, spec.num_traj_states, spec.total_time_step, spec.nlinks

    qc = jnp.broadcast_to(jnp.asarray(qc_inv, dtype), (b, t, spec.dof, spec.dof))
    q_inv = factors.gp_q_inv(qc, spec.dt)
    eye_d = jnp.eye(d, dtype=dtype)
    ks_inv = jnp.broadcast_to(eye_d / jnp.asarray(k_s, dtype) ** 2, (b, d, d))
    kg_inv = jnp.broadcast_to(eye_d / jnp.asarray(k_g, dtype) ** 2, (b, d, d))
    obs_inv = jnp.broadcast_to(
        jnp.eye(l, dtype=dtype) / jnp.asarray(cost_sigma, dtype) ** 2, (b, tn, l, l)
    )
    eps = jnp.full((b, tn, l), jnp.asarray(epsilon_dist, dtype))

    dyn_inv = None
    if spec.non_holonomic:
        dyn_inv = jnp.full((b, tn), 1.0 / jnp.asarray(k_d, dtype) ** 2)
    vel_inv = None
    v_lim = None
    if spec.use_vel_limits:
        vel_inv = jnp.broadcast_to(
            jnp.eye(spec.dof, dtype=dtype) / jnp.asarray(k_v, dtype) ** 2,
            (b, tn, spec.dof, spec.dof),
        )
        # Reference YAMLs name the per-axis limits v_x/v_y (dof=2); for a
        # higher-dof robot pass a length-dof sequence as v_x (v_y ignored).
        import numpy as np

        lims = (np.asarray(v_x, np.float64).reshape(-1)
                if np.ndim(v_x) else np.asarray([v_x, v_y], np.float64))
        if lims.size != spec.dof:
            raise ValueError(
                f"velocity limits have {lims.size} entries for dof="
                f"{spec.dof}; pass a length-dof sequence as v_x"
            )
        v_lim = jnp.broadcast_to(jnp.asarray(lims, dtype), (b, tn, spec.dof))
    self_inv = self_eps = None
    if spec.use_self_collision:
        p = spec.num_self_pairs
        self_inv = jnp.full((b, tn, p), 1.0 / jnp.asarray(k_self, dtype) ** 2)
        self_eps = jnp.full((b, tn, p), jnp.asarray(eps_self, dtype))
    wg_inv = p_goal_b = None
    if spec.use_workspace_goal:
        w = robot.wksp_dim
        wg_inv = jnp.broadcast_to(
            jnp.eye(w, dtype=dtype) / jnp.asarray(k_wg, dtype) ** 2, (b, w, w)
        )
        p_goal_b = jnp.broadcast_to(
            jnp.asarray(workspace_goal, dtype), (b, w))
    jl_inv = qmin_b = qmax_b = None
    if spec.use_joint_limits:
        jl_inv = jnp.broadcast_to(
            jnp.eye(spec.dof, dtype=dtype) / jnp.asarray(k_jl, dtype) ** 2,
            (b, tn, spec.dof, spec.dof),
        )
        qmin_b = jnp.broadcast_to(
            jnp.asarray(q_min, dtype).reshape(-1), (b, tn, spec.dof))
        qmax_b = jnp.broadcast_to(
            jnp.asarray(q_max, dtype).reshape(-1), (b, tn, spec.dof))
    return GraphParams(
        start=start.astype(dtype),
        goal=goal.astype(dtype),
        q_inv=q_inv,
        ks_inv=ks_inv,
        kg_inv=kg_inv,
        obs_inv=obs_inv,
        eps=eps,
        dyn_inv=dyn_inv,
        vel_inv=vel_inv,
        v_lim=v_lim,
        self_inv=self_inv,
        self_eps=self_eps,
        jl_inv=jl_inv,
        q_min=qmin_b,
        q_max=qmax_b,
        wg_inv=wg_inv,
        p_goal=p_goal_b,
    )
