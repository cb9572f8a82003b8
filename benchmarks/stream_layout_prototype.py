#!/usr/bin/env python
"""Round-2 groundwork: GN iteration with assembly in the streaming layout.

Measured on a v5e (B=1024, T=100, loop-in-jit): 1.57 ms/iter vs ~1.69 for
the production step (standard-layout assembly + tiled solve kernel) — the
layout transposes that make the streaming solve kernel regress the plan
loop (0.585 ms per array round-trip) disappear when the static blocks are
pre-transposed once and per-iteration work only transposes the small
residual pieces (~1.6 MB each).

Limitations of this prototype (why it is not the production path yet):
  * hardcodes L=1 isotropic obstacle covariances and fixed covariances,
  * no err/err_ext traces (the production plan loop computes both),
  * f32 ordering differences vs the production step ~3e-3 on dtheta.
The round-2 plan: make `assemble_from_residuals` emit the (T, D·D, 8, 128)
layout natively and fold the obstacle rank-1 update + damping into the
streaming forward kernel.

Run (real TPU): python benchmarks/stream_layout_prototype.py
"""
import sys, os, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import build_problem
from dgpmp2_tpu.core import gn, graph
from dgpmp2_tpu.ops.pallas import btd_stream as bs

spec, robot, params, th0, sdf = build_problem()
B, T1, D, DD, N, CH = 1024, 101, 4, 16, 50, 16


def to_stream_mat(x):
    return jnp.moveaxis(x.reshape(B, -1, DD), 0, -1).reshape(-1, DD, 8, 128)


def to_stream_vec(x):
    return jnp.moveaxis(x, 0, -1).reshape(-1, x.shape[-1], 8, 128)


static = graph.assemble_static(spec, params, jnp.float32)
diag_static_s = to_stream_mat(static.diag_static + 0.1 * jnp.eye(4, dtype=jnp.float32))
off_s = to_stream_mat(static.off)
zm = jnp.zeros((1, DD, 8, 128), jnp.float32)
tpad = (-T1) % CH
offp_s = jnp.concatenate([zm, off_s] + [zm] * tpad, 0)
offf_s = jnp.concatenate([off_s] + [zm] * (tpad + 1), 0)
eye_pad = jnp.broadcast_to(
    jnp.eye(4, dtype=jnp.float32).reshape(1, 16, 1, 1), (tpad, 16, 8, 128)
)
phiT_q_s = to_stream_mat(static.phiT_q)
q_inv_s = to_stream_mat(params.q_inv)
ks_s = to_stream_mat(params.ks_inv[:, None])
kg_s = to_stream_mat(params.kg_inv[:, None])
w_obs = params.obs_inv[:, :, 0, 0]
w_obs_s = to_stream_vec(jnp.broadcast_to(w_obs[..., None], (B, T1, 4)))[:, :1]


def mv_s(mat_s, vec_s):
    out = []
    for i in range(4):
        s = mat_s[:, i * 4] * vec_s[:, 0]
        for j in range(1, 4):
            s = s + mat_s[:, i * 4 + j] * vec_s[:, j]
        out.append(s)
    return jnp.stack(out, 1)


@jax.jit
def step_stream(th, sdf):
    res = graph.eval_residuals(spec, robot, params, th, sdf)
    r_gp_s = to_stream_vec(res.r_gp)
    h_s = to_stream_vec(res.h_obs[:, :, 0, :])
    r_obs_s = to_stream_vec(jnp.broadcast_to(res.r_obs, (B, T1, 4)))[:, :1]
    r_sg_s = to_stream_vec(jnp.stack([res.r_s, res.r_g], 1))
    rhs = jnp.zeros((T1, D, 8, 128), jnp.float32)
    rhs = rhs.at[:-1].add(mv_s(phiT_q_s, r_gp_s))
    rhs = rhs.at[1:].add(-mv_s(q_inv_s, r_gp_s))
    rhs = rhs.at[0].add(mv_s(ks_s, r_sg_s[:1])[0])
    rhs = rhs.at[-1].add(mv_s(kg_s, r_sg_s[1:])[0])
    lam_r = w_obs_s[:, 0] * r_obs_s[:, 0]
    rhs = rhs + h_s * lam_r[:, None]
    outer = [h_s[:, i] * h_s[:, j] * w_obs_s[:, 0]
             for i in range(4) for j in range(4)]
    diag_s = diag_static_s + jnp.stack(outer, 1)
    diag_p = jnp.concatenate([diag_s, eye_pad], 0)
    rhs_p = jnp.concatenate(
        [rhs, jnp.zeros((tpad, D, 8, 128), jnp.float32)], 0
    )
    n_chunks = (T1 + tpad) // CH
    shape_m, shape_v = (CH, DD, 8, 128), (CH, D, 8, 128)
    m_spec = pl.BlockSpec(shape_m, lambda i, t: (t, 0, i, 0),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec(shape_v, lambda i, t: (t, 0, i, 0),
                          memory_space=pltpu.VMEM)
    out_m = jax.ShapeDtypeStruct((T1 + tpad, DD, 8, 128), jnp.float32)
    out_v = jax.ShapeDtypeStruct((T1 + tpad, D, 8, 128), jnp.float32)
    chol_t, gain_t, y_t = pl.pallas_call(
        bs._make_fwd_kernel(D, CH), grid=(1, n_chunks),
        in_specs=[m_spec, m_spec, v_spec],
        out_specs=[m_spec, m_spec, v_spec],
        out_shape=[out_m, out_m, out_v],
        scratch_shapes=[pltpu.VMEM((DD, 8, 128), jnp.float32),
                        pltpu.VMEM((D, 8, 128), jnp.float32)],
    )(diag_p, offp_s, rhs_p)
    rev = lambda i, t: (n_chunks - 1 - t, 0, i, 0)
    m_rev = pl.BlockSpec(shape_m, rev, memory_space=pltpu.VMEM)
    v_rev = pl.BlockSpec(shape_v, rev, memory_space=pltpu.VMEM)
    x_t = pl.pallas_call(
        bs._make_bwd_kernel(D, CH), grid=(1, n_chunks),
        in_specs=[m_rev, m_rev, v_rev], out_specs=v_rev, out_shape=out_v,
        scratch_shapes=[pltpu.VMEM((D, 8, 128), jnp.float32)],
    )(chol_t, offf_s, y_t)
    dth = jnp.moveaxis(x_t[:T1].reshape(T1, D, B), -1, 0)
    return th + dth


if __name__ == "__main__":
    th1 = step_stream(th0, sdf)
    dth_ref = gn.gn_step(spec, robot, params, th0, sdf, 0.1)
    print("dtheta diff vs production:",
          float(jnp.max(jnp.abs((th1 - th0) - dth_ref))))

    @jax.jit
    def loop(th, s):
        return jax.lax.fori_loop(0, N, lambda i, th: step_stream(th, s), th)

    x = loop(th0, sdf)
    float(jnp.sum(x))
    best = 1e9
    for k in range(2):
        t0 = time.perf_counter()
        x = loop(x + 1e-6 * k, sdf)
        float(jnp.sum(x))
        best = min(best, time.perf_counter() - t0)
    print(f"stream-layout GN step: {best / N * 1e3:.3f} ms/iter")
