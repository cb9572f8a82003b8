"""End-to-end 3-D planning: PointRobot3D + voxel SDF through the same
factor graph / GN engine as 2-D (the graph layer is workspace-dim
generic; ``GraphSpec.z_lims`` switches obstacle lookups to trilinear).

No reference analog — the reference ships planar robots only
(``diff_gpmp2/robot_models/``); this certifies the framework's 3-D
extension end-to-end: convergence, obstacle clearance, endpoint
anchoring, gradient flow, and multistart selection.
"""
import pytest

import numpy as np
import jax
import jax.numpy as jnp

from dgpmp2_tpu.core import gn, graph, multistart
from dgpmp2_tpu.envs import Env3D
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.robots import PointRobot3D, make_robot

X_LIMS = (-5.0, 5.0)
Y_LIMS = (-5.0, 5.0)
Z_LIMS = (-5.0, 5.0)
N = 32  # voxels per side, res = 10/32


def _box_world():
    """Central box obstacle; straight line start->goal passes through it."""
    vox = np.ones((N, N, N), np.float32)
    vox[12:20, 12:20, 12:20] = 0.0
    res = (X_LIMS[1] - X_LIMS[0]) / N
    sdf = sdf_ops.sdf_from_occupancy_3d(jnp.asarray(vox), res=res)
    return vox, sdf


def _problem(b=2, t=16):
    robot = PointRobot3D()
    spec = graph.GraphSpec(dof=3, state_dim=6, total_time_step=t,
                           x_lims=X_LIMS, y_lims=Y_LIMS, z_lims=Z_LIMS)
    rng = np.random.default_rng(0)
    start = np.zeros((b, 6))
    goal = np.zeros((b, 6))
    start[:, :3] = rng.uniform(-4.2, -3.6, (b, 3))
    goal[:, :3] = rng.uniform(3.6, 4.2, (b, 3))
    params = graph.default_params(
        spec, robot, jnp.asarray(start), jnp.asarray(goal),
        qc_inv=np.eye(3), cost_sigma=0.05, epsilon_dist=0.4,
        k_s=0.01, k_g=0.01, dtype=jnp.float64,
    )
    s = jnp.linspace(0.0, 1.0, t + 1)[None, :, None]
    pos = (1 - s) * start[:, None, :3] + s * goal[:, None, :3]
    vel = jnp.broadcast_to(
        (jnp.asarray(goal[:, :3]) - start[:, :3])[:, None, :]
        / spec.total_time_sec, pos.shape,
    )
    th0 = jnp.concatenate([pos, vel], axis=-1)
    return spec, robot, params, th0, start, goal


def _min_clearance(th, sdf, res):
    d, _ = sdf_ops.trilinear_lookup(
        sdf[None], th[..., :3], res, X_LIMS, Y_LIMS, Z_LIMS
    )
    return float(jnp.min(d))


@pytest.mark.slow
def test_plan3d_converges_and_clears_box():
    _, sdf = _box_world()
    spec, robot, params, th0, start, goal = _problem()
    b = th0.shape[0]
    sdfb = jnp.broadcast_to(sdf, (b, N, N, N))
    cfg = gn.OptimConfig(reg=0.1, max_iters=25)
    res = gn.plan(spec, robot, params, th0, sdfb, cfg)

    assert bool(jnp.all(jnp.isfinite(res.th)))
    # Straight seed threads the box: negative clearance initially.
    assert _min_clearance(th0, sdf, spec.res(N)) < 0.0
    # Converged plan clears it with the robot radius.
    d, _ = sdf_ops.trilinear_lookup(
        sdfb, res.th[..., :3], spec.res(N), X_LIMS, Y_LIMS, Z_LIMS
    )
    assert float(jnp.min(d)) > float(robot.sphere_radii[0])
    # Error drops by 95%+ and endpoints stay anchored.
    assert float(jnp.max(res.err_final / res.err_init)) < 0.05
    np.testing.assert_allclose(np.asarray(res.th[:, 0, :3]), start[:, :3],
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(res.th[:, -1, :3]),
                               np.asarray(goal[:, :3]), atol=0.05)


@pytest.mark.slow
def test_plan3d_z_escape_uses_third_dimension():
    """A thick wall spanning the full x extent, open only above z ≈ +2.3,
    forces the plan OVER it — impossible for any 2-D planner, so this pins
    that the third dimension actually participates in the optimization.
    The seed arcs to z = 1.5, still INSIDE the wall (top face is the
    nearest free space there), so GN must push the crossing higher in z
    to clear — pure +z hinge gradients do the work."""
    vox = np.ones((N, N, N), np.float32)
    # Wall: y voxels 12:20 (2.5 m thick), all x, z voxels 0..23 — open
    # only above z ≈ +2.3 (voxel 23 tops out at (23-16)·0.3125 ≈ 2.19).
    vox[0:24, 12:20, :] = 0.0
    res = (X_LIMS[1] - X_LIMS[0]) / N
    sdf = sdf_ops.sdf_from_occupancy_3d(jnp.asarray(vox), res=res)

    robot = PointRobot3D(sphere_radii=(0.2,))
    t = 24
    spec = graph.GraphSpec(dof=3, state_dim=6, total_time_step=t,
                           x_lims=X_LIMS, y_lims=Y_LIMS, z_lims=Z_LIMS)
    start = jnp.asarray([[0.0, -4.0, 0.0, 0.0, 0.0, 0.0]], jnp.float64)
    goal = jnp.asarray([[0.0, 4.0, 0.0, 0.0, 0.0, 0.0]], jnp.float64)
    params = graph.default_params(
        spec, robot, start, goal, qc_inv=np.eye(3), cost_sigma=0.02,
        epsilon_dist=0.3, k_s=0.001, k_g=0.001, dtype=jnp.float64,
    )
    s = jnp.linspace(0.0, 1.0, t + 1)[None, :, None]
    pos = (1 - s) * start[:, None, :3] + s * goal[:, None, :3]
    pos = pos.at[..., 2].add(1.5 * jnp.sin(jnp.pi * s[..., 0]))
    vel = jnp.gradient(pos, axis=1) / (spec.total_time_sec / t)
    th0 = jnp.concatenate([pos, vel], axis=-1)
    cfg = gn.OptimConfig(reg=0.1, max_iters=40)
    out = gn.plan(spec, robot, params, th0, sdf[None], cfg)

    d0, _ = sdf_ops.trilinear_lookup(
        sdf[None], th0[..., :3], spec.res(N), X_LIMS, Y_LIMS, Z_LIMS
    )
    assert float(jnp.min(d0)) < 0.0, "seed must start inside the wall"
    d, _ = sdf_ops.trilinear_lookup(
        sdf[None], out.th[..., :3], spec.res(N), X_LIMS, Y_LIMS, Z_LIMS
    )
    assert float(jnp.min(d)) > 0.0, "plan must clear the wall"
    # The crossing states (|y| small) must have climbed above the seed's
    # 1.5 m arc to the open space over the wall.
    y = out.th[0, :, 1]
    z = out.th[0, :, 2]
    crossing = jnp.abs(y) < 1.25
    assert float(jnp.max(jnp.where(crossing, z, -jnp.inf))) > 2.0


@pytest.mark.slow
def test_plan3d_differentiable():
    """Gradients flow from a trajectory loss back to factor parameters
    (the differentiable-planning contract, in 3-D)."""
    _, sdf = _box_world()
    spec, robot, params, th0, _, goal = _problem(b=1)
    sdfb = sdf[None]
    cfg = gn.OptimConfig(reg=0.1, max_iters=5)

    def loss(eps):
        p = params.replace(eps=eps)
        out = gn.plan(spec, robot, p, th0, sdfb, cfg)
        return jnp.sum(out.th[..., :3] ** 2)

    g = jax.grad(loss)(params.eps)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0


@pytest.mark.slow
def test_plan3d_multistart_and_env3d():
    """Multistart runs in 3-D (ndim-generic SDF tiling, 3-D contact
    scoring) and Env3D's queries agree with the raw lookup."""
    vox, sdf = _box_world()
    spec, robot, params, th0, _, _ = _problem(b=2)
    sdfb = jnp.broadcast_to(sdf, (2, N, N, N))
    cfg = gn.OptimConfig(reg=0.1, max_iters=12)
    out = multistart.plan_multistart(
        spec, robot, params, th0, sdfb, cfg, jax.random.PRNGKey(0),
        restarts=3, amp=1.0,
    )
    assert bool(jnp.all(jnp.isfinite(out.th)))
    assert out.iters is not None and out.th.shape == th0.shape
    assert bool(jnp.all(out.contact_free))

    env = Env3D({"x_lims": X_LIMS, "y_lims": Y_LIMS, "z_lims": Z_LIMS})
    env.initialize_from_voxels(vox)
    np.testing.assert_allclose(np.asarray(env.sedt), np.asarray(sdf))
    pts = np.asarray([[0.0, 0.0, 0.0], [-4.0, -4.0, -4.0]])
    d_env, g_env = env.get_signed_obstacle_distance(pts)
    d_raw, g_raw = sdf_ops.trilinear_lookup(
        env.sedt, jnp.asarray(pts), env.res, X_LIMS, Y_LIMS, Z_LIMS
    )
    np.testing.assert_allclose(np.asarray(d_env), np.asarray(d_raw))
    np.testing.assert_allclose(np.asarray(g_env), np.asarray(g_raw))
    assert not env.is_feasible([0.0, 0.0, 0.0])   # inside the box
    assert env.is_feasible([-4.0, -4.0, -4.0])
    # world <-> voxel round trip
    w = np.asarray([[1.2, -0.7, 2.1]])
    np.testing.assert_allclose(env.to_world(env.to_voxel_xyz(w)), w, atol=1e-12)


@pytest.mark.slow
def test_plan3d_serving_dispatch():
    """PlanningService is SDF-shape generic: 3-D voxel worlds flow through
    the batch packer, world bank, and dispatch unchanged."""
    import os

    from dgpmp2_tpu.planner import DiffGPMP2Planner
    from dgpmp2_tpu.serve import PlanningService, PlanRequest
    from dgpmp2_tpu.utils.config import load_params

    cdir = os.path.join(os.path.dirname(__file__), "..", "dgpmp2_tpu",
                        "configs")
    env_data, pp, gp, obs, opt, robot_data = load_params(
        os.path.join(cdir, "gpmp2_3d_params.yaml"),
        os.path.join(cdir, "robot_3d.yaml"),
        os.path.join(cdir, "env_3d_params.yaml"),
    )
    pp = dict(pp, total_time_step=12)
    opt = dict(opt, max_iters=10)
    planner = DiffGPMP2Planner(gp, obs, pp, opt, env_data,
                               make_robot(robot_data), dtype=jnp.float64)
    _, sdf = _box_world()
    svc = PlanningService(planner, batch_size=4)
    svc.register_world("box", np.asarray(sdf))
    rng = np.random.default_rng(0)
    reqs = []
    for _ in range(3):
        s = np.zeros(6)
        g = np.zeros(6)
        s[:3] = np.array([-4.0, -4.0, -4.0]) + rng.uniform(-0.2, 0.2, 3)
        g[:3] = np.array([4.0, 4.0, 4.0]) + rng.uniform(-0.2, 0.2, 3)
        reqs.append(PlanRequest(start=s, goal=g, world="box"))
    out = svc.plan_batch_sync(reqs)
    assert len(out) == 3
    for r in out:
        assert np.all(np.isfinite(np.asarray(r.th)))
        assert float(r.err_final) < 0.2 * float(r.err_init)


def test_plan3d_yaml_planner_api():
    """The drop-in YAML surface reaches 3-D: shipped 3-D schemas build a
    DiffGPMP2Planner whose spec picks up z_lims (extension key in the env
    YAML) and whose reference-style plan() clears the voxel box."""
    import os

    from dgpmp2_tpu.planner import DiffGPMP2Planner
    from dgpmp2_tpu.utils.config import load_params

    cdir = os.path.join(os.path.dirname(__file__), "..", "dgpmp2_tpu",
                        "configs")
    env_data, pp, gp, obs, opt, robot_data = load_params(
        os.path.join(cdir, "gpmp2_3d_params.yaml"),
        os.path.join(cdir, "robot_3d.yaml"),
        os.path.join(cdir, "env_3d_params.yaml"),
    )
    pp = dict(pp, total_time_step=16)
    opt = dict(opt, max_iters=25)
    robot = make_robot(robot_data)
    assert robot.wksp_dim == 3
    planner = DiffGPMP2Planner(gp, obs, pp, opt, env_data, robot,
                               dtype=jnp.float64)
    assert planner.spec.z_lims == (-5.0, 5.0)

    _, sdf = _box_world()
    start = jnp.asarray([[-4.0, -4.0, -4.0, 0, 0, 0]], jnp.float64)
    goal = jnp.asarray([[4.0, 4.0, 4.0, 0, 0, 0]], jnp.float64)
    s = jnp.linspace(0.0, 1.0, 17)[None, :, None]
    pos = (1 - s) * start[:, None, :3] + s * goal[:, None, :3]
    th0 = jnp.concatenate([pos, jnp.zeros_like(pos)], axis=-1)
    res = planner.plan(th0, start, goal, sdf[None])
    assert float(res.err_final[0] / res.err_init[0]) < 0.05
    assert _min_clearance(res.th, sdf, planner.spec.res(N)) > 0.0
