"""Stream-layout GN engine (core/stream.py): parity vs the default engine.

The stream engine re-assembles the normal equations directly in the
streaming solve layout; these tests pin it to the standard-layout path
(itself verified against the dense reference oracle in test_graph) across
every factor configuration, both optimizers, and gradients.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgpmp2_tpu.core import gn, graph, stream

from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import PlanarArm2Link, PointRobot2D, PointRobotXYH
from dgpmp2_tpu.utils.trajectory import straight_line_traj


@pytest.fixture(autouse=True)
def small_stream_chunk(monkeypatch):
    """Small streaming chunk for this module's test matrix: the kernel
    graph size (and XLA CPU compile time) scales with T; CHUNK=4 over
    short horizons covers MORE cross-chunk recurrence boundaries than
    production CHUNK=16 over T=12 (which fits one chunk) at a fraction of
    the compile cost.  A fixture (not an import-time global mutation) so
    other collected test modules keep the production value;
    test_plan_stream_production_chunk re-pins chunk=16 explicitly."""
    monkeypatch.setattr(stream, "CHUNK", 4)


def _world(b=2):
    img = np.ones((b, 32, 32))
    img[:, 12:20, 12:20] = 0.0
    return sdf_ops.sdf_from_occupancy(jnp.asarray(img, jnp.float64), res=10.0 / 32)


def _prob(spec, robot, b=2, **kw):
    d = spec.state_dim
    start = jnp.zeros((b, d)).at[:, :2].set(jnp.asarray([[-4.0, -4.0]] * b))
    goal = jnp.zeros((b, d)).at[:, :2].set(jnp.asarray([[4.0, 4.0]] * b))
    th0 = straight_line_traj(
        start[:, : spec.dof], goal[:, : spec.dof], 10.0, spec.total_time_step
    )
    cov = dict(qc_inv=np.eye(spec.dof), cost_sigma=0.1, epsilon_dist=0.4,
               k_s=0.01, k_g=0.01)
    cov.update(kw)
    params = graph.default_params(spec, robot, start, goal,
                                  dtype=jnp.float64, **cov)
    return params, th0


CONFIGS = {
    "point_gn": (graph.GraphSpec(total_time_step=7), PointRobot2D(),
                 "gauss_newton", {}),
    "point_lm": (graph.GraphSpec(total_time_step=7), PointRobot2D(),
                 "lm", {}),
    "arm_links": (graph.GraphSpec(total_time_step=7, nlinks=6, dof=2),
                  PlanarArm2Link(), "gauss_newton", {}),
    "nonholonomic": (
        graph.GraphSpec(total_time_step=7, dof=3, state_dim=6,
                        non_holonomic=True),
        PointRobotXYH(), "gauss_newton", {"k_d": 0.1},
    ),
    "vel_limits": (
        graph.GraphSpec(total_time_step=7, use_vel_limits=True),
        PointRobot2D(), "gauss_newton",
        {"k_v": 0.1, "v_x": 2.0, "v_y": 2.0},
    ),
    "gp_inter": (
        graph.GraphSpec(total_time_step=7, use_gp_inter=True, num_inter=3),
        PointRobot2D(), "gauss_newton", {},
    ),
}


@pytest.mark.slow
def test_gn_step_stream_matches_default():
    spec, robot = graph.GraphSpec(total_time_step=7), PointRobot2D()
    params, th0 = _prob(spec, robot)
    sdf = _world()
    dth_ref = gn.gn_step(spec, robot, params, th0, sdf, 0.1)
    dth_str = stream.gn_step_stream(spec, robot, params, th0, sdf, 0.1)
    np.testing.assert_allclose(np.asarray(dth_str), np.asarray(dth_ref),
                               atol=1e-12)


@pytest.mark.parametrize("name", sorted(CONFIGS))
@pytest.mark.slow
def test_plan_stream_engine_parity(name):
    spec, robot, method, kw = CONFIGS[name]
    params, th0 = _prob(spec, robot, **kw)
    sdf = _world()
    cfg = gn.OptimConfig(method=method, reg=0.1, max_iters=3, tol_delta=0.0)
    r_ref = gn.plan(spec, robot, params, th0, sdf, cfg)
    r_str = gn.plan(spec, robot, params, th0, sdf,
                    dataclasses.replace(cfg, engine="stream"))
    np.testing.assert_allclose(np.asarray(r_str.th), np.asarray(r_ref.th),
                               atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(r_str.err_per_iter), np.asarray(r_ref.err_per_iter),
        atol=1e-12,
    )


@pytest.mark.slow
def test_plan_stream_engine_parity_3d():
    """3-D workspaces (trilinear lookup, state_dim 6) through the stream
    engine match the standard path — the bench_throughput --plan3d
    configuration's correctness pin."""
    from dgpmp2_tpu.robots import PointRobot3D

    spec = graph.GraphSpec(total_time_step=7, dof=3, state_dim=6,
                           z_lims=(-5.0, 5.0))
    robot = PointRobot3D()
    b = 2
    vox = np.ones((b, 16, 16, 16))
    vox[:, 6:10, 6:10, 6:10] = 0.0
    sdf = sdf_ops.sdf_from_occupancy_3d(jnp.asarray(vox, jnp.float64),
                                        res=10.0 / 16)
    start = jnp.zeros((b, 6)).at[:, :3].set(-4.0)
    goal = jnp.zeros((b, 6)).at[:, :3].set(4.0)
    th0 = straight_line_traj(start[:, :3], goal[:, :3], 10.0, 7)
    params = graph.default_params(
        spec, robot, start, goal, qc_inv=np.eye(3), cost_sigma=0.1,
        epsilon_dist=0.4, k_s=0.01, k_g=0.01, dtype=jnp.float64)
    cfg = gn.OptimConfig(reg=0.1, max_iters=3, tol_delta=0.0)
    r_ref = gn.plan(spec, robot, params, th0, sdf, cfg)
    r_str = gn.plan(spec, robot, params, th0, sdf,
                    dataclasses.replace(cfg, engine="stream"))
    np.testing.assert_allclose(np.asarray(r_str.th), np.asarray(r_ref.th),
                               atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(r_str.err_per_iter), np.asarray(r_ref.err_per_iter),
        atol=1e-12,
    )


@pytest.mark.slow
def test_plan_stream_gradients_match():
    """Gradients through the stream solve's custom VJP (off-diag cotangent
    routed via the shifted array) equal the default engine's."""
    spec, robot = graph.GraphSpec(total_time_step=10), PointRobot2D()
    params, th0 = _prob(spec, robot)
    sdf = _world()

    def loss(q_inv, engine):
        p = params.replace(q_inv=q_inv)
        cfg = gn.OptimConfig(reg=0.1, max_iters=2, tol_delta=0.0, engine=engine)
        r = gn.plan(spec, robot, p, th0, sdf, cfg)
        return jnp.sum(r.th**2) + jnp.sum(r.err_ext_per_iter)

    g_ref = jax.grad(loss)(params.q_inv, "auto")
    g_str = jax.grad(loss)(params.q_inv, "stream")
    assert float(jnp.linalg.norm(g_ref)) > 1.0  # non-trivial gradient
    np.testing.assert_allclose(np.asarray(g_str), np.asarray(g_ref),
                               rtol=1e-9, atol=1e-10)


@pytest.mark.slow
def test_plan_stream_production_chunk(monkeypatch):
    """The production CHUNK=16 configuration (bench.py) stays correct:
    T+1=13 pads to tp=16 inside one chunk."""
    monkeypatch.setattr(stream, "CHUNK", 16)
    spec, robot = graph.GraphSpec(total_time_step=12), PointRobot2D()
    params, th0 = _prob(spec, robot)
    sdf = _world()
    cfg = gn.OptimConfig(reg=0.1, max_iters=2, tol_delta=0.0)
    r_ref = gn.plan(spec, robot, params, th0, sdf, cfg)
    r_str = gn.plan(spec, robot, params, th0, sdf,
                    dataclasses.replace(cfg, engine="stream"))
    np.testing.assert_allclose(np.asarray(r_str.th), np.asarray(r_ref.th),
                               atol=1e-11)


def test_resolve_engine_mapping(monkeypatch):
    """engine='auto' picks stream exactly on TPU f32 (gn.resolve_engine);
    explicit engines pass through; unknown names are rejected."""
    assert gn.resolve_engine("standard", jnp.float32) == "standard"
    assert gn.resolve_engine("stream", jnp.float64) == "stream"
    # This suite runs on CPU: auto stays on the standard path.
    assert gn.resolve_engine("auto", jnp.float32) == "standard"
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert gn.resolve_engine("auto", jnp.float32) == "stream"
    assert gn.resolve_engine("auto", jnp.float64) == "standard"
    with pytest.raises(ValueError):
        gn.resolve_engine("bogus", jnp.float32)


def test_plan_engine_standard_explicit():
    """engine='standard' is a valid explicit opt-out and matches 'auto'
    (identical on CPU, where auto resolves to standard)."""
    spec, robot = graph.GraphSpec(total_time_step=7), PointRobot2D()
    params, th0 = _prob(spec, robot)
    sdf = _world()
    cfg = gn.OptimConfig(reg=0.1, max_iters=3, tol_delta=0.0)
    r_auto = gn.plan(spec, robot, params, th0, sdf, cfg)
    r_std = gn.plan(spec, robot, params, th0, sdf,
                    dataclasses.replace(cfg, engine="standard"))
    np.testing.assert_array_equal(np.asarray(r_std.th), np.asarray(r_auto.th))
    with pytest.raises(ValueError):
        gn.plan(spec, robot, params, th0, sdf,
                dataclasses.replace(cfg, engine="bogus"))
