"""Dense reference assembly — verification oracle, NOT the hot path.

Builds the same ``A (M×N)``, ``b (M)``, ``K (M×M)`` matrices the reference's
``PlanLayer.construct_linear_system_batch`` scatters together
(``plan_layer.py:152-200,391-479``), using the identical row layout:

    rows [0, D)                       start prior
    rows [D, D·(T+1))                 GP factors (factor i at rows (i+1)·D)
    rows [D·(T+1), D·(T+2))           goal prior
    rows [D·(T+2), D·(T+2)+(T+1)·L)   obstacle factors
    then nonholonomic (1 row/state), then velocity limits (dof rows/state),
    then joint limits (dof rows/state), then self-collision pairs
    (P rows/state), then the terminal workspace goal (wksp_dim rows),
    then interpolated obstacles

Used by the test-suite to prove ``blocktridiag(assemble(...)) == AᵀKA`` and
``rhs == AᵀKb`` and by anyone extending the factor library who wants a
ground-truth system to diff against.  O(M·N) memory — keep it off the GN
path.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from dgpmp2_tpu.core import factors, graph as graph_lib


def assemble_dense(spec, robot, params, th, sdf):
    """Dense (A, b, K) for a single problem or batch via leading vmap.

    Args:
      th: (T+1, D) single trajectory; sdf: (H, W).  Use ``jax.vmap`` for a
      batch.  params fields must carry a matching (non-batched) shape —
      index a batched GraphParams with ``jax.tree.map(lambda x: x[i], p)``.
    """
    d = spec.state_dim
    tn = spec.num_traj_states
    l = spec.nlinks
    m, n = spec.M, spec.N
    dtype = th.dtype

    A = jnp.zeros((m, n), dtype)
    b = jnp.zeros((m,), dtype)
    K = jnp.zeros((m, m), dtype)

    phi = factors.gp_phi(spec.dof, spec.dt, dtype)
    eye = jnp.eye(d, dtype=dtype)

    # Start prior.
    r_s = factors.prior_residual(params.start, th[0])
    A = A.at[0:d, 0:d].set(eye)
    b = b.at[0:d].set(r_s)
    K = K.at[0:d, 0:d].set(params.ks_inv)

    # GP factors.
    r_gp = factors.gp_residual(th, phi)
    for i in range(spec.num_gp_factors):
        r0 = (i + 1) * d
        A = A.at[r0 : r0 + d, i * d : (i + 1) * d].set(phi)
        A = A.at[r0 : r0 + d, (i + 1) * d : (i + 2) * d].set(-eye)
        b = b.at[r0 : r0 + d].set(r_gp[i])
        K = K.at[r0 : r0 + d, r0 : r0 + d].set(params.q_inv[i])

    # Goal prior.
    off = d * (spec.num_gp_factors + 1)
    r_g = factors.prior_residual(params.goal, th[-1])
    A = A.at[off : off + d, n - d : n].set(eye)
    b = b.at[off : off + d].set(r_g)
    K = K.at[off : off + d, off : off + d].set(params.kg_inv)

    # Obstacle factors.
    off += d
    centers, jac_fk = robot.fk(th)
    r_obs, h_obs = factors.hinge_obstacle_residual(
        centers,
        jac_fk,
        robot.radii_array(dtype),
        params.eps,
        sdf,
        spec.res(sdf.shape[-1]),
        spec.x_lims,
        spec.y_lims,
    )
    for i in range(tn):
        r0 = off + i * l
        A = A.at[r0 : r0 + l, i * d : (i + 1) * d].set(h_obs[i])
        b = b.at[r0 : r0 + l].set(r_obs[i])
        K = K.at[r0 : r0 + l, r0 : r0 + l].set(params.obs_inv[i])
    off += tn * l

    if spec.non_holonomic:
        r_dyn, h_dyn = factors.nonholonomic_residual(th)
        for i in range(tn):
            r0 = off + i
            A = A.at[r0, i * d : (i + 1) * d].set(h_dyn[i])
            b = b.at[r0].set(r_dyn[i])
            K = K.at[r0, r0].set(params.dyn_inv[i])
        off += tn

    if spec.use_vel_limits:
        r_vel, h_vel = factors.velocity_limit_residual(th, params.v_lim, spec.dof)
        for i in range(tn):
            r0 = off + i * spec.dof
            A = A.at[r0 : r0 + spec.dof, i * d : (i + 1) * d].set(h_vel[i])
            b = b.at[r0 : r0 + spec.dof].set(r_vel[i])
            K = K.at[r0 : r0 + spec.dof, r0 : r0 + spec.dof].set(params.vel_inv[i])
        off += tn * spec.dof

    if spec.use_joint_limits:
        r_jl, h_jl = factors.joint_limit_residual(th, params.q_min,
                                                  params.q_max, spec.dof)
        for i in range(tn):
            r0 = off + i * spec.dof
            A = A.at[r0 : r0 + spec.dof, i * d : (i + 1) * d].set(h_jl[i])
            b = b.at[r0 : r0 + spec.dof].set(r_jl[i])
            K = K.at[r0 : r0 + spec.dof, r0 : r0 + spec.dof].set(
                params.jl_inv[i])
        off += tn * spec.dof

    if spec.use_self_collision:
        pairs = jnp.asarray(spec.self_pairs, jnp.int32)
        p = spec.num_self_pairs
        r_self, h_self = factors.self_collision_residual(
            centers, jac_fk, robot.radii_array(dtype),
            pairs[:, 0], pairs[:, 1], params.self_eps,
        )
        for i in range(tn):
            r0 = off + i * p
            A = A.at[r0 : r0 + p, i * d : (i + 1) * d].set(h_self[i])
            b = b.at[r0 : r0 + p].set(r_self[i])
            K = K.at[r0 : r0 + p, r0 : r0 + p].set(jnp.diag(params.self_inv[i]))
        off += tn * p

    if spec.use_workspace_goal:
        r_wg, h_wg = factors.workspace_goal_residual(centers[-1], jac_fk[-1],
                                                     params.p_goal)
        w = robot.wksp_dim
        A = A.at[off : off + w, n - d : n].set(h_wg)
        b = b.at[off : off + w].set(r_wg)
        K = K.at[off : off + w, off : off + w].set(params.wg_inv)
        off += w

    if spec.use_gp_inter:
        # Binary interpolated obstacle rows: H_t = h·Λ_k, H_{t+1} = h·Ψ_k.
        from dgpmp2_tpu.core import graph as graph_lib

        res = graph_lib.eval_residuals(
            spec, robot, jax.tree.map(lambda x: x[None], params),
            th[None], sdf[None],
        )
        lam_m, psi_m = factors.gp_interp_coeffs(spec.dof, spec.dt,
                                                spec.num_inter, dtype)
        r_i = res.r_obsi[0]  # (T, nip, L)
        h_i = res.h_obsi[0]  # (T, nip, L, D)
        nip = spec.num_inter
        for t_seg in range(spec.num_gp_factors):
            for k in range(nip):
                r0 = off + (t_seg * nip + k) * l
                h_t = h_i[t_seg, k] @ lam_m[k]
                h_t1 = h_i[t_seg, k] @ psi_m[k]
                A = A.at[r0 : r0 + l, t_seg * d : (t_seg + 1) * d].set(h_t)
                A = A.at[r0 : r0 + l, (t_seg + 1) * d : (t_seg + 2) * d].set(h_t1)
                b = b.at[r0 : r0 + l].set(r_i[t_seg, k])
                K = K.at[r0 : r0 + l, r0 : r0 + l].set(params.obs_inv[t_seg])

    return A, b, K


def solve_dense(A, b, K, delta):
    """GN normal-equation solve on the dense system (reference semantics)."""
    n = A.shape[-1]
    atk = A.T @ K
    lam = atk @ A + delta * jnp.eye(n, dtype=A.dtype)
    rhs = atk @ b
    return jnp.linalg.solve(lam, rhs)
