"""Pure factor evaluations for the GPMP2 factor graph.

Functional rebuild of the reference factor library (SURVEY.md §2.1):
``gp/gp_factor.py``, ``gp/prior_factor.py``, ``obstacle/obstacle_factor.py``
+ ``obstacle/obstacle_cost.py``, ``custom_factors/nonholonomic_factor.py``,
``custom_factors/velocity_limit_factor.py``.  The reference's mutable factor
objects (``set_mean`` / ``set_inv_cov`` / ``get_error``) become pure
functions: covariances and targets are *inputs*, residuals and Jacobian
blocks are *outputs*, and everything is batched over arbitrary leading dims.

Sign convention (uniform across all factors): every factor returns
``(r, H)`` with ``H = -∂r/∂x``, so a Gauss-Newton step solves

    (Σ HᵀΛH + δI) dθ = Σ HᵀΛ r,      θ ← θ + dθ.

This is the convention the reference's GP / prior / obstacle / velocity
factors all follow (e.g. prior ``e = mean - x`` with ``H = +I``,
``prior_factor.py:15-18``).  The reference's nonholonomic factor has an
inconsistent sign on its θ/velocity Jacobian entries
(``nonholonomic_factor.py:22-27``); we implement the mathematically
consistent ``H = -∂r/∂x`` (documented deviation — the reference value is a
sign bug, see SURVEY.md §2.1).
"""
from __future__ import annotations

import jax.numpy as jnp

from dgpmp2_tpu.ops import sdf as sdf_ops


# ---------------------------------------------------------------------------
# GP prior (constant-velocity) — gp/gp_factor.py
# ---------------------------------------------------------------------------


def gp_phi(dof: int, dt: float, dtype=jnp.float32) -> jnp.ndarray:
    """State transition ``Φ(dt) = [[I, dt·I], [0, I]]`` (``gp_factor.py:31-37``)."""
    eye = jnp.eye(dof, dtype=dtype)
    zero = jnp.zeros((dof, dof), dtype)
    return jnp.block([[eye, dt * eye], [zero, eye]])


def gp_q_inv(qc_inv: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Expand ``Q_c⁻¹`` (..., dof, dof) to the full GP inverse covariance.

    ``Q⁻¹ = [[12 dt⁻³ Qc⁻¹, -6 dt⁻² Qc⁻¹], [-6 dt⁻² Qc⁻¹, 4 dt⁻¹ Qc⁻¹]]``
    (``gp_factor.py:55-73``).  Output shape (..., 2·dof, 2·dof).
    """
    m1 = 12.0 * dt**-3.0 * qc_inv
    m2 = -6.0 * dt**-2.0 * qc_inv
    m3 = 4.0 * dt**-1.0 * qc_inv
    top = jnp.concatenate([m1, m2], axis=-1)
    bot = jnp.concatenate([m2, m3], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def gp_residual(th: jnp.ndarray, phi: jnp.ndarray = None, dt: float = None) -> jnp.ndarray:
    """GP residual ``r_i = x_{i+1} - Φ x_i`` for i = 0..T-1.

    Args:
      th: (..., T+1, D) trajectory with layout [pos(dof), vel(dof)].
      dt: transition time step (preferred — applies Φ in closed form:
          ``Φ x = [pos + dt·vel, vel]``, no matmul).  ``phi`` is accepted
          for generality but only its (0, dof) entry (dt) is meaningful for
          the constant-velocity prior.

    Returns (..., T, D).  Jacobians are constant: ``H1 = Φ`` w.r.t. ``x_i``,
    ``H2 = -I`` w.r.t. ``x_{i+1}`` (``gp_factor.py:100-110``) — the
    assembler uses them in closed form rather than materializing per-factor
    copies.
    """
    if dt is None:
        dof = th.shape[-1] // 2
        dt = phi[0, dof]
    dof = th.shape[-1] // 2
    prev = th[..., :-1, :]
    phi_x = jnp.concatenate(
        [prev[..., :dof] + dt * prev[..., dof:], prev[..., dof:]], axis=-1
    )
    return th[..., 1:, :] - phi_x


# ---------------------------------------------------------------------------
# Start / goal priors — gp/prior_factor.py
# ---------------------------------------------------------------------------


def prior_residual(mean: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Unary anchor ``r = mean - x`` with ``H = I`` (``prior_factor.py:15-18``)."""
    return mean - x


# ---------------------------------------------------------------------------
# Obstacle factor — obstacle/obstacle_factor.py + obstacle_cost.py
# ---------------------------------------------------------------------------


def hinge_obstacle_residual(
    centers: jnp.ndarray,
    jac_fk: jnp.ndarray,
    radii: jnp.ndarray,
    eps: jnp.ndarray,
    sdf: jnp.ndarray,
    res: float,
    x_lims,
    y_lims,
    z_lims=None,
):
    """Hinge-loss obstacle residual + Jacobian per trajectory state.

    ``r = max(0, (ε + radius) - d(c))`` per sphere; inside the hinge
    ``H = ∇d · J_fk`` (= -∂r/∂x), zero outside
    (``obstacle_cost.py:29-38``, ``obstacle_factor.py:35-40``).

    Args:
      centers: (..., T, L, W) workspace sphere centers (W = 2, or 3 with
        ``z_lims`` set — 3-D workspaces, beyond the 2-D-only reference).
      jac_fk:  (..., T, L, W, D) FK Jacobians.
      radii:   (L,) sphere radii.
      eps:     (..., T, L) safety margin ε (may be learned per state).
      sdf:     (..., H, Wim) signed distance field, metric units
        ((..., D, H, Wim) voxels when ``z_lims`` is set).

    Returns:
      r: (..., T, L) hinge costs, H: (..., T, L, D) state-space Jacobians.
    """
    t, l = centers.shape[-3], centers.shape[-2]
    pts = centers.reshape(*centers.shape[:-3], t * l, centers.shape[-1])
    d, grad = sdf_ops.lookup_nd(sdf, pts, res, x_lims, y_lims, z_lims)
    d = d.reshape(*centers.shape[:-3], t, l)
    grad = grad.reshape(*centers.shape[:-1], centers.shape[-1])
    return hinge_from_lookup(d, grad, jac_fk, radii, eps)


def hinge_from_lookup(d, grad, jac_fk, radii, eps):
    """Hinge residual/Jacobian from precomputed SDF values & gradients.

    d (..., L), grad (..., L, W), jac_fk (..., L, W, Dstate), eps (..., L).
    Returns r (..., L), H = -∂r/∂x (..., L, Dstate).
    """
    eps_tot = eps + radii
    active = d <= eps_tot
    r = jnp.where(active, eps_tot - d, jnp.zeros_like(d))
    h_c = jnp.where(active[..., None], grad, jnp.zeros_like(grad))
    # Σ_w h_c[..., l, w] · J_fk[..., l, w, :] — tiny-dim contraction on VPU.
    h = jnp.sum(h_c[..., None] * jac_fk, axis=-2)
    return r, h


# ---------------------------------------------------------------------------
# GP interpolation — dense collision checking between support states
# ---------------------------------------------------------------------------
#
# The reference carries config plumbing for GP-interpolated obstacle
# up-sampling (``use_gp_inter``/``total_check_step``,
# ``gpmp2_planner.py:29-41``) but never implements it in factor evaluation
# (SURVEY.md §5.7).  We implement the real GPMP2 mechanism: the posterior
# mean of the CV-GP between supports is x(τ) = Λ(τ)·x_i + Ψ(τ)·x_{i+1},
# and obstacle factors at interpolated states become *binary* factors whose
# Jacobians chain through Λ/Ψ — still block-tridiagonal, so the solver is
# unchanged.


def gp_interp_coeffs(dof: int, dt: float, num_inter: int, dtype=jnp.float32):
    """Interpolation matrices Λ(τ_k), Ψ(τ_k) for τ_k = dt·k/(nip+1).

    Standard CV-prior closed forms: with Q_s = S(s) ⊗ Q_c (S the 2×2
    scalar kernel [[s³/3, s²/2], [s²/2, s]]) and Φ(s) = [[1, s], [0, 1]] ⊗ I,
        Ψ(τ) = Q_τ Φ(Δ-τ)ᵀ Q_Δ⁻¹   (Q_c cancels)
        Λ(τ) = Φ(τ) - Ψ(τ) Φ(Δ).

    Returns (lam, psi) each (num_inter, D, D) with D = 2·dof.
    """
    import numpy as np

    def s_mat(s):
        return np.array([[s**3 / 3.0, s**2 / 2.0], [s**2 / 2.0, s]])

    def phi2(s):
        return np.array([[1.0, s], [0.0, 1.0]])

    lam2 = []
    psi2 = []
    q_d_inv = np.linalg.inv(s_mat(dt))
    for k in range(1, num_inter + 1):
        tau = dt * k / (num_inter + 1)
        psi = s_mat(tau) @ phi2(dt - tau).T @ q_d_inv
        lam = phi2(tau) - psi @ phi2(dt)
        lam2.append(lam)
        psi2.append(psi)
    eye = np.eye(dof)
    lam_full = np.stack([np.kron(m, eye) for m in lam2])
    psi_full = np.stack([np.kron(m, eye) for m in psi2])
    return jnp.asarray(lam_full, dtype), jnp.asarray(psi_full, dtype)


def gp_interpolate(th: jnp.ndarray, lam: jnp.ndarray, psi: jnp.ndarray):
    """Interpolated states x(τ_k) for every GP segment.

    th (..., T+1, D); lam/psi (nip, D, D).  Returns (..., T, nip, D).
    """
    x_i = th[..., :-1, None, None, :]  # (..., T, 1, 1, D)
    x_j = th[..., 1:, None, None, :]
    # lam (nip, D, D) broadcast against (..., T, 1, 1, D) -> sum over cols.
    return jnp.sum(lam * x_i, axis=-1) + jnp.sum(psi * x_j, axis=-1)


# ---------------------------------------------------------------------------
# Nonholonomic (unicycle) factor — custom_factors/nonholonomic_factor.py
# ---------------------------------------------------------------------------


def nonholonomic_residual(th: jnp.ndarray):
    """Unicycle constraint on state ``[x, y, θ, vx, vy, ω]``.

    ``r = vy·cosθ - vx·sinθ`` (zero when the velocity is aligned with the
    heading, ``nonholonomic_factor.py:16-21``).  Returns ``(r, H)`` with
    ``r`` (..., T) and ``H = -∂r/∂x`` (..., T, 6) — the consistent-sign
    Jacobian (see module docstring for the documented deviation).
    """
    theta = th[..., 2]
    vx = th[..., 3]
    vy = th[..., 4]
    s, c = jnp.sin(theta), jnp.cos(theta)
    r = vy * c - vx * s
    zeros = jnp.zeros_like(r)
    h = jnp.stack(
        [zeros, zeros, vy * s + vx * c, s, -c, zeros], axis=-1
    )
    return r, h


# ---------------------------------------------------------------------------
# Velocity-limit factor — custom_factors/velocity_limit_factor.py
# ---------------------------------------------------------------------------


def velocity_limit_residual(th: jnp.ndarray, v_lim: jnp.ndarray, dof: int):
    """Per-axis velocity-magnitude hinge for a 2·dof state.

    ``r_k = max(0, |v_k| - v_lim_k)`` with ``H_k = -sign(v_k)·e_{v_k}``
    inside the hinge (``velocity_limit_factor.py:17-29``).

    Args:
      th:    (..., T, D) trajectory with velocities in the last ``dof`` dims.
      v_lim: (..., T, dof) per-axis limits.

    Returns r (..., T, dof) and H (..., T, dof, D).
    """
    d = th.shape[-1]
    v = th[..., dof:]
    over = jnp.abs(v) >= v_lim
    r = jnp.where(over, jnp.abs(v) - v_lim, jnp.zeros_like(v))
    sign = jnp.where(over, -jnp.sign(v), jnp.zeros_like(v))
    # Row k touches only state component dof+k.
    sel = jnp.eye(dof, dtype=th.dtype)
    h_v = sign[..., :, None] * sel  # (..., T, dof, dof)
    h = jnp.concatenate(
        [jnp.zeros((*h_v.shape[:-1], d - dof), th.dtype), h_v], axis=-1
    )
    return r, h


def self_collision_residual(centers, jac_fk, radii, pairs_i, pairs_j,
                            eps_self):
    """Pairwise sphere-sphere self-collision hinge for articulated robots.

    New factor beyond the reference (which ships only point robots —
    SURVEY.md §2.4 names the FK interface as the extension point; the
    original GPMP2 C++ library has the analogous factor but dGPMP2 never
    did): for each configured body-sphere pair (i, j),

        r_p = max(0, (ε_p + radius_i + radius_j) − ‖c_i − c_j‖)

    with ``H = ∂‖c_i − c_j‖/∂x = û·(J_i − J_j)`` inside the hinge and zero
    outside — the same ``A = −∂r/∂x`` row convention as every other factor
    (the hinge decreases as the spheres separate).

    Args:
      centers: (..., L, W) workspace sphere centers.
      jac_fk:  (..., L, W, D) FK Jacobians.
      radii:   (L,) sphere radii.
      pairs_i, pairs_j: (P,) int arrays of sphere indices per pair.
      eps_self: (..., P) safety margins (may be learned per state).

    Returns r (..., P) and H (..., P, D).
    """
    ci = centers[..., pairs_i, :]
    cj = centers[..., pairs_j, :]
    diff = ci - cj  # (..., P, W)
    # Safe norm: the true distance is never 0 for a sane sphere layout, but
    # the sqrt grad must stay finite under jit for inactive pairs too.
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
    thresh = eps_self + radii[pairs_i] + radii[pairs_j]
    active = dist <= thresh
    r = jnp.where(active, thresh - dist, jnp.zeros_like(dist))
    u = jnp.where(active[..., None], diff / dist[..., None],
                  jnp.zeros_like(diff))
    jdiff = jac_fk[..., pairs_i, :, :] - jac_fk[..., pairs_j, :, :]
    h = jnp.sum(u[..., None] * jdiff, axis=-2)  # (..., P, D)
    return r, h


def joint_limit_residual(th: jnp.ndarray, q_min: jnp.ndarray,
                         q_max: jnp.ndarray, dof: int):
    """Per-joint position-limit hinge (companion of
    :func:`velocity_limit_residual`; the original GPMP2 C++ library has
    the analogous JointLimitFactor, dGPMP2 ships none):

        r_k = max(0, q_k − q_max_k) + max(0, q_min_k − q_k)

    (at most one side active), with ``H_k = ∓e_{q_k}`` inside the hinge —
    the ``A = −∂r/∂x`` row convention.

    Args:
      th:    (..., T, D) trajectory, positions in the first ``dof`` dims.
      q_min, q_max: (..., T, dof) per-joint limits.

    Returns r (..., T, dof) and H (..., T, dof, D).
    """
    d = th.shape[-1]
    q = th[..., :dof]
    over = q >= q_max
    under = q <= q_min
    r = (jnp.where(over, q - q_max, 0.0)
         + jnp.where(under, q_min - q, 0.0))
    sign = jnp.where(over, -1.0, 0.0) + jnp.where(under, 1.0, 0.0)
    sel = jnp.eye(dof, dtype=th.dtype)
    h_q = sign[..., :, None] * sel  # (..., T, dof, dof)
    h = jnp.concatenate(
        [h_q, jnp.zeros((*h_q.shape[:-1], d - dof), th.dtype)], axis=-1
    )
    return r, h


def workspace_goal_residual(centers_end, jac_end, p_goal):
    """End-effector workspace goal: anchor the LAST body sphere (the tip)
    of the terminal state to a workspace point — task-space goals without
    explicit IK (the original GPMP2 C++ workspace factors' capability;
    dGPMP2 only supports joint-space goals, ``prior_factor.py:15``).

        r = p_goal − tip(q_T)    with A-row H = J_tip = −∂r/∂x.

    Args:
      centers_end: (..., L, W) terminal-state sphere centers.
      jac_end:     (..., L, W, D) terminal-state FK Jacobians.
      p_goal:      (..., W) workspace target.

    Returns r (..., W) and H (..., W, D).
    """
    return p_goal - centers_end[..., -1, :], jac_end[..., -1, :, :]
