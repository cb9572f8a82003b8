"""Async micro-batching planning service — the deployment/serving layer.

The reference has no serving story (its entry points are offline scripts,
``examples/`` and ``learning/test_planner.py``); this module is the
TPU-native production counterpart: one **fixed-shape** compiled plan
program whose batch axis is the serving unit, an asyncio request queue,
and a dispatcher that coalesces concurrent requests into full device
batches within a bounded latency window.

TPU-first design decisions:

* **One program, one shape.**  The plan function is jitted once at
  ``(batch_size, T+1, D)`` / ``(batch_size, H, W)``; every dispatch —
  full or padded — runs the same executable, so serving never
  recompiles.  Padding rows replicate the first request (planning is
  per-row independent, so pad rows cost FLOPs but cannot perturb real
  rows).
* **Micro-batching, not per-request dispatch.**  On the tunneled TPU a
  dispatch carries ~30 ms fixed overhead (PERFORMANCE.md); amortizing it
  across a coalesced batch is the difference between ~30 req/s and
  thousands.  The dispatcher waits at most ``window_ms`` after the first
  queued request before launching a partial batch.
* **The event loop never blocks on the device.**  Device execution runs
  in a thread-pool executor, so ``submit`` keeps *enqueueing* requests
  while a batch is in flight.  Dispatch itself is serialized: the loop
  awaits each executor call before coalescing the next batch (and
  ``plan_batch_sync`` holds a lock regardless) — one program, one device,
  in-order execution; overlap would only hide host-side batch packing,
  not device time.
"""
from __future__ import annotations

import asyncio
import dataclasses
import threading
import time
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .core import graph
from .utils.trajectory import straight_line_traj


def _straight_np(start, goal, spec):
    """Numpy twin of ``utils.trajectory.straight_line_traj`` for one
    (D,) start/goal pair — seeds are built host-side in warm-start
    batches so no device round-trip happens outside the plan program."""
    s, g = start[: spec.dof], goal[: spec.dof]
    alpha = np.linspace(0.0, 1.0, spec.total_time_step + 1)[:, None]
    pos = s[None] * (1.0 - alpha) + g[None] * alpha
    vel = np.broadcast_to((g - s) / float(spec.total_time_sec), pos.shape)
    return np.concatenate([pos, vel], axis=-1)


@dataclasses.dataclass
class PlanRequest:
    """One planning problem: (D,) start/goal states and an environment.

    The environment is either an inline ``sdf`` array (H, W) — uploaded
    with the request — or a ``world`` name previously registered with
    ``PlanningService.register_world``, which resolves to a
    device-resident SDF and keeps the request payload tiny (worlds
    change rarely; requests arrive constantly — re-uploading the SDF per
    request would dominate serving latency on any remote link).

    ``th_init`` optionally seeds the optimizer (warm-start replanning);
    ``None`` seeds the constant-velocity straight line the reference's
    examples use.
    """

    start: np.ndarray
    goal: np.ndarray
    sdf: Optional[np.ndarray] = None
    th_init: Optional[np.ndarray] = None
    world: Optional[str] = None


@dataclasses.dataclass
class PlanResponse:
    th: np.ndarray            # (T+1, D) optimized trajectory
    err_init: float
    err_final: float
    iters: int
    batch_fill: float         # fraction of the dispatched batch that was real
    latency_s: float          # submit -> result, including queue wait


class _AdapterResult(NamedTuple):
    # a pytree (jit-returnable) mirror of gn.PlanResult's serving fields
    th: jnp.ndarray
    err_init: jnp.ndarray
    err_final: jnp.ndarray
    iters: jnp.ndarray


class LearnedPlanningAdapter:
    """Serve a trained ``LearnedDiffGPMP2Planner`` through
    ``PlanningService``.

    Exposes the service's planner interface (``plan(th0, start, goal,
    sdf)`` over a leading batch axis, plus ``spec``/``dtype``): fixed
    external GraphParams are built from each batch's (start, goal) and
    the YAML covariance scalars, and the occupancy image the conv
    encoder expects is derived from the SDF sign (occupied ⇔ sdf < 0),
    so requests stay (start, goal, sdf) — identical to the static
    service.
    """

    def __init__(self, lplanner, variables, cov_scalars: dict,
                 track_best: bool = True, dtype=jnp.float32):
        self.lplanner = lplanner
        self.variables = variables
        self.cov = dict(cov_scalars)
        self.track_best = track_best
        self.spec = lplanner.spec
        self.dtype = dtype

    def plan(self, th0, start, goal, sdf):
        params = graph.default_params(
            self.lplanner.spec, self.lplanner.robot, start, goal,
            **self.cov, dtype=self.dtype,
        )
        im = (sdf > 0).astype(self.dtype)
        th, errs, _, _ = self.lplanner.plan(
            self.variables, params, th0, sdf, im,
            track_best=self.track_best,
        )
        n_iters = jnp.full(th.shape[:1], errs.shape[0], jnp.int32)
        return _AdapterResult(th=th, err_init=errs[0], err_final=errs[-1],
                              iters=n_iters)


class MultistartPlanningAdapter:
    """Serve K-seed multi-start planning (``core.multistart``) through
    ``PlanningService``: each request is planned from ``restarts``
    perturbed seeds and the best candidate is returned.

    The perturbation RNG is a fixed key (deterministic across dispatches
    — the same request always returns the same plan, a serving-side
    reproducibility property), and err_init/err_final are the weighted
    factor-graph error of the seed and of the selected candidate under
    the same fixed covariances.

    ``rrt_seeds > 0`` appends that many host-side RRT* seed trajectories
    per problem to the pool (``core.seeds.rrt_seed_batch`` — the
    reference's RRT*→GPMP2 production recipe, ``examples/
    rrt_star_example.py``): the native planner runs on the host while the
    TPU batch is unchanged in shape, and a failed RRT* degrades to the
    straight-line base seed.  ``rrt_clearance`` defaults to the robot's
    largest sphere radius; ``rrt_plan_time`` is the per-problem budget in
    seconds (host wall-clock, sequential over the batch).
    """

    def __init__(self, spec, robot, cov_scalars: dict,
                 optim_cfg=None, restarts: int = 16, amp: float = 1.5,
                 prune_iters: int = 0, keep: int = 0, seed: int = 0,
                 select_margin: float = 0.0, rrt_seeds: int = 0,
                 rrt_plan_time: float = 1.0, rrt_max_iters: int = 20000,
                 rrt_clearance: float = None, dtype=jnp.float32):
        from .core import gn, multistart

        self._gn = gn
        self._ms = multistart
        self.spec = spec
        self.robot = robot
        self.cov = dict(cov_scalars)
        self.cfg = optim_cfg or gn.OptimConfig(reg=0.1, max_iters=50)
        self.restarts = restarts
        self.amp = amp
        self.prune_iters = prune_iters
        self.keep = keep
        # Selection margin (metres): align candidate selection with
        # margin-based quality metrics (core.multistart.score_candidates).
        self.select_margin = select_margin
        if rrt_seeds > 0 and spec.z_lims is not None:
            raise ValueError("rrt_seeds: the native RRT* expert is 2-D; "
                             "3-D workspaces are not supported yet")
        self.rrt_seeds = rrt_seeds
        self.rrt_plan_time = rrt_plan_time
        # The RRT* loop stops at min(plan_time, max_iters).  The RNG is
        # seed-deterministic, so results are reproducible exactly when the
        # iteration cap binds first; a wall-clock cut lands on a
        # load-dependent iteration.  Set rrt_max_iters low enough (with a
        # generous rrt_plan_time) when served plans must be replayable.
        self.rrt_max_iters = rrt_max_iters
        if rrt_clearance is None:
            import numpy as _np
            rrt_clearance = float(_np.max(_np.asarray(
                robot.radii_array(jnp.float32))))
        self.rrt_clearance = rrt_clearance
        self.seed = seed
        self.rng = jax.random.PRNGKey(seed)
        self.dtype = dtype

    def _error(self, params, th, sdf):
        res = graph.eval_residuals(self.spec, self.robot, params, th, sdf)
        return graph.error_from_residuals(self.spec, params, res)

    def host_extra_seeds(self, start, goal, sdf):
        """Host-side RRT* seed pool for one dispatch batch — numpy in,
        numpy out, batch-leading ``(B, rrt_seeds, T+1, 2·dof)``.

        The native RRT* expert is host code, so it can never run inside
        the compiled serving program: ``PlanningService`` calls this
        BEFORE dispatch and ships the result into the jitted plan as a
        plain array argument (the TPU-first split of the reference's
        RRT*→GPMP2 recipe: host proposes, device optimizes).  Cost is
        sequential host wall-clock, ~``rrt_seeds · B · rrt_plan_time``
        per dispatch — see benchmarks/bench_serve.py ``--rrt_seeds``.
        """
        import numpy as np

        from .core import seeds as seeds_lib

        start = np.asarray(start)
        goal = np.asarray(goal)
        sdf = np.asarray(sdf)
        pool = []
        for k in range(self.rrt_seeds):
            s, _found = seeds_lib.rrt_seed_batch(
                sdf, start, goal,
                self.spec.x_lims, self.spec.y_lims,
                self.spec.total_time_sec, self.spec.num_traj_states,
                clearance=self.rrt_clearance,
                plan_time=self.rrt_plan_time,
                max_iters=self.rrt_max_iters,
                seed=self.seed + 7919 * k,
            )
            pool.append(s)
        return np.stack(pool, axis=1)

    def plan(self, th0, start, goal, sdf, extra_seeds=None):
        """``extra_seeds`` — optional batch-leading ``(B, E, T+1, 2·dof)``
        informed-seed pool (``host_extra_seeds`` output).  When
        ``rrt_seeds > 0`` and it is omitted, the pool is computed here on
        the host — valid only with concrete (non-traced) arrays; under
        jit the caller must precompute it (``PlanningService`` does)."""
        params = graph.default_params(
            self.spec, self.robot, start, goal, **self.cov,
            dtype=self.dtype,
        )
        extra = None
        if extra_seeds is not None:
            # (B, E, T+1, D) -> plan_multistart's (E, B, T+1, D)
            extra = jnp.transpose(
                jnp.asarray(extra_seeds, self.dtype), (1, 0, 2, 3))
        elif self.rrt_seeds > 0:
            import numpy as np

            ex = self.host_extra_seeds(start, goal, sdf)
            extra = jnp.asarray(np.swapaxes(ex, 0, 1), self.dtype)
        res = self._ms.plan_multistart(
            self.spec, self.robot, params, th0, sdf, self.cfg, self.rng,
            restarts=self.restarts, amp=self.amp,
            prune_iters=self.prune_iters, keep=self.keep,
            select_margin=self.select_margin, extra_seeds=extra,
        )
        return _AdapterResult(
            th=res.th,
            err_init=self._error(params, th0, sdf),
            err_final=self._error(params, res.th, sdf),
            iters=res.iters,  # winning candidate's actual GN iterations
        )


class TaskSpacePlanningAdapter:
    """Serve workspace end-effector goals (``GraphSpec.use_workspace_goal``)
    through ``PlanningService`` with the UNCHANGED request schema: the
    request's ``goal`` state carries the workspace target in its first
    ``wksp_dim`` components (remaining components ignored), the joint-space
    goal prior is effectively disabled, and the planner solves the implied
    IK inside the same GN iteration — so an arm client submits
    (start_config, target_point, world) and gets a full joint trajectory.

    ``cov_scalars`` must include ``k_wg`` (workspace-goal weight); optional
    ``k_jl``/``q_min``/``q_max`` and ``k_self``/``eps_self`` engage the
    joint-limit and self-collision factors when the spec enables them.
    """

    def __init__(self, spec, robot, cov_scalars: dict, optim_cfg=None,
                 k_goal_off: float = 100.0, dtype=jnp.float32):
        from .core import gn

        if not spec.use_workspace_goal:
            raise ValueError("spec must enable use_workspace_goal")
        self._gn = gn
        self.spec = spec
        self.robot = robot
        self.cov = dict(cov_scalars)
        self.cfg = optim_cfg or gn.OptimConfig(reg=0.1, max_iters=50)
        self.k_goal_off = k_goal_off
        self.dtype = dtype

    def plan(self, th0, start, goal, sdf):
        w = self.robot.wksp_dim
        cov = dict(self.cov)
        k_wg = cov.pop("k_wg")
        cov.pop("k_g", None)  # joint goal prior replaced by k_goal_off
        params = graph.default_params(
            self.spec, self.robot, start, start, **cov,
            k_g=self.k_goal_off,  # joint goal prior ~off: target rules
            k_wg=k_wg, workspace_goal=goal[..., :w], dtype=self.dtype,
        )
        # No track_best: its best-iterate criterion (contact-free + lowest
        # gp-error) presumes goal-anchored iterates — under a task-space
        # goal the unmoved seed would win.  Return the converged iterate.
        res = self._gn.plan(self.spec, self.robot, params, th0, sdf,
                            self.cfg)
        return _AdapterResult(th=res.th, err_init=res.err_init,
                              err_final=res.err_final, iters=res.iters)


class PlanningService:
    """Micro-batching front end over a batched planner.

    Args:
      planner: a ``DiffGPMP2Planner`` (or any object exposing
        ``plan(th_init, start, goal, sdf) -> PlanResult`` over a leading
        batch axis plus ``spec``/``dtype`` attributes).
      batch_size: the compiled batch width; also the coalescing target.
      window_ms: max time the dispatcher waits after the first request
        of a batch before launching a partial one.
    """

    def __init__(self, planner, batch_size: int = 64, window_ms: float = 2.0,
                 mesh=None):
        self.planner = planner
        self.batch_size = int(batch_size)
        self.window_s = float(window_ms) / 1e3
        self.mesh = mesh

        spec = planner.spec

        # Planners whose seed pool needs host-side work (the RRT* expert
        # of MultistartPlanningAdapter) expose `host_extra_seeds`; the
        # service runs it before each dispatch and the compiled program
        # takes the pool as one extra batch-leading argument.  Tracing
        # the host code inside the jit is impossible (it is native C++
        # over concrete arrays), so this split is structural, not an
        # optimization.
        self._host_seeds = (
            getattr(planner, "host_extra_seeds", None)
            if getattr(planner, "rrt_seeds", 0) else None)
        self._world_np: dict = {}      # name -> host copy for host seeds

        if self._host_seeds is not None:
            def core(th0, s, g, sdf, extra):
                res = planner.plan(th0, s, g, sdf, extra_seeds=extra)
                return res.th, res.err_init, res.err_final, res.iters
        else:
            def core(th0, s, g, sdf):
                res = planner.plan(th0, s, g, sdf)
                return res.th, res.err_init, res.err_final, res.iters

        def seed(s, g):
            return straight_line_traj(
                s[:, : spec.dof], g[:, : spec.dof],
                spec.total_time_sec, spec.total_time_step,
            ).astype(planner.dtype)

        # Four serving programs — cold (straight-line seed built on
        # device) vs warm (explicit th0), × inline SDF vs world-bank
        # row indices.  Everything per dispatch happens inside ONE jit
        # (seed construction, bank gather, the plan itself) and the
        # outputs come back in ONE device_get: on a remote/tunneled
        # device each extra dispatch or fetch is a full round-trip.
        #
        # With a ``mesh`` the coalesced batch axis is sharded across its
        # ``data`` axis (GSPMD) — multi-chip serving is the same four
        # programs with sharding annotations; padding keeps the batch
        # width (and therefore the per-device shard shapes) fixed.
        if mesh is not None:
            from .parallel.sharding import batch_sharding, replicated

            bsh, rep = batch_sharding(mesh), replicated(mesh)
            if self.batch_size % mesh.devices.size:
                raise ValueError(
                    f"batch_size {self.batch_size} not divisible by mesh "
                    f"size {mesh.devices.size}")
            out4 = (bsh, bsh, bsh, bsh)
            jit = lambda fn, n_in, bank=False: jax.jit(  # noqa: E731
                fn,
                in_shardings=(bsh,) * n_in + ((rep,) if bank else ()),
                out_shardings=out4,
            )
        else:
            jit = lambda fn, n_in, bank=False: jax.jit(fn)  # noqa: E731
        if self._host_seeds is not None:
            self._plan_cold = jit(
                lambda s, g, sdf, ex: core(seed(s, g), s, g, sdf, ex), 4)
            self._plan_warm = jit(core, 5)
            self._plan_cold_bank = jit(
                lambda s, g, idx, ex, bank:
                    core(seed(s, g), s, g, bank[idx], ex),
                4, bank=True)
            self._plan_warm_bank = jit(
                lambda th0, s, g, idx, ex, bank:
                    core(th0, s, g, bank[idx], ex),
                5, bank=True)
        else:
            self._plan_cold = jit(
                lambda s, g, sdf: core(seed(s, g), s, g, sdf), 3)
            self._plan_warm = jit(core, 4)
            self._plan_cold_bank = jit(
                lambda s, g, idx, bank: core(seed(s, g), s, g, bank[idx]),
                3, bank=True)
            self._plan_warm_bank = jit(
                lambda th0, s, g, idx, bank: core(th0, s, g, bank[idx]),
                4, bank=True)
        self._queue: Optional[asyncio.Queue] = None
        self._task: Optional[asyncio.Task] = None
        self._lock = threading.Lock()  # device dispatch is serialized
        self._world_index: dict = {}   # name -> row in the device bank
        self._world_bank = None        # (n_worlds, H, W) device array
        self.stats = {
            "requests": 0,
            "batches": 0,
            "padded_rows": 0,
            "device_time_s": 0.0,
            "host_seed_time_s": 0.0,
        }

    # -- world cache ---------------------------------------------------------

    def register_world(self, name: str, sdf) -> None:
        """Upload one environment SDF to the device once; subsequent
        requests reference it as ``PlanRequest(world=name)`` and carry no
        SDF payload.  Re-registering a name replaces its SDF."""
        dt = self.planner.dtype
        row = jnp.asarray(np.asarray(sdf), dt)
        if self._host_seeds is not None:
            # Host copy for the pre-dispatch seed expert — avoids a
            # device->host fetch of the bank row on every dispatch.
            self._world_np[name] = np.asarray(sdf, dt)
        with self._lock:
            if name in self._world_index:
                i = self._world_index[name]
                self._world_bank = self._world_bank.at[i].set(row)
            else:
                self._world_index[name] = (
                    0 if self._world_bank is None else self._world_bank.shape[0]
                )
                self._world_bank = (
                    row[None] if self._world_bank is None
                    else jnp.concatenate([self._world_bank, row[None]])
                )

    def _resolve_sdfs(self, requests, pad):
        """(batch, H, W) device SDF array: a bank gather when every
        request names a registered world (no host upload), else a host
        stack of the inline arrays."""
        if all(r.world is not None for r in requests):
            try:
                idx = [self._world_index[r.world] for r in requests]
            except KeyError as exc:
                raise KeyError(f"unregistered world {exc}") from exc
            idx += [idx[0]] * pad
            return jnp.take(self._world_bank, jnp.asarray(idx), axis=0)
        dt = self.planner.dtype
        rows = []
        for r in requests:
            if r.sdf is not None:
                rows.append(np.asarray(r.sdf))
            elif r.world in self._world_index:
                rows.append(
                    np.asarray(self._world_bank[self._world_index[r.world]])
                )
            else:
                raise ValueError(
                    "request carries neither sdf nor a registered world")
        rows += [rows[0]] * pad
        return jnp.asarray(np.stack(rows), dt)

    # -- synchronous path --------------------------------------------------

    def warmup(self, sdf_shape: tuple = None) -> None:
        """Compile the serving program ahead of traffic (first dispatch
        otherwise pays 20-40 s of XLA compile on the TPU).  Compiles the
        bank-indexed program when worlds are registered (pass no
        ``sdf_shape``), the inline-SDF program otherwise."""
        dt = self.planner.dtype
        spec = self.planner.spec
        d = spec.state_dim
        start = jnp.zeros((self.batch_size, d), dt)
        goal = jnp.ones((self.batch_size, d), dt)
        extra_tail = ()
        if self._host_seeds is not None:
            # Compile-shape-only pool: zeros have the right (B, E, T+1, D)
            # signature; the warmup plan's numerics are discarded.
            extra_tail = (jnp.zeros(
                (self.batch_size, int(self.planner.rrt_seeds),
                 spec.num_traj_states, d), dt),)
        if sdf_shape is None and self._world_bank is not None:
            idx = jnp.zeros((self.batch_size,), jnp.int32)
            out = self._plan_cold_bank(start, goal, idx, *extra_tail,
                                       self._world_bank)
        else:
            if sdf_shape is None:
                raise ValueError("no registered worlds: pass sdf_shape")
            sdf = jnp.ones((self.batch_size,) + tuple(sdf_shape), dt)
            out = self._plan_cold(start, goal, sdf, *extra_tail)
        jax.block_until_ready(out)

    def plan_batch_sync(self, requests: Sequence[PlanRequest]):
        """Plan up to ``batch_size`` requests in one device program and
        return per-request ``PlanResponse``s (sans latency accounting)."""
        n = len(requests)
        if n == 0:
            return []
        if n > self.batch_size:
            raise ValueError(f"{n} requests > compiled batch {self.batch_size}")
        spec = self.planner.spec
        dt = self.planner.dtype
        pad = self.batch_size - n

        def stack(field):
            rows = [np.asarray(getattr(r, field)) for r in requests]
            rows += [rows[0]] * pad
            return jnp.asarray(np.stack(rows), dt)

        start, goal = stack("start"), stack("goal")
        bank_mode = self._world_bank is not None and all(
            r.world in self._world_index for r in requests
        )
        warm = any(r.th_init is not None for r in requests)
        if warm:
            # host-side straight-line fallback for unseeded rows — no
            # device round-trip just to build seeds
            rows = [
                np.asarray(r.th_init) if r.th_init is not None
                else _straight_np(np.asarray(r.start), np.asarray(r.goal),
                                  spec)
                for r in requests
            ]
            rows += [rows[0]] * pad
            th0 = jnp.asarray(np.stack(rows), dt)

        # Host-side seed expert (RRT*) BEFORE the device dispatch: runs
        # on the unpadded rows only (pad rows duplicate row 0's pool).
        extra_tail = ()
        if self._host_seeds is not None:
            t_h = time.perf_counter()
            sdf_rows = []
            for r in requests:
                if r.sdf is not None:
                    sdf_rows.append(np.asarray(r.sdf))
                elif r.world in self._world_np:
                    sdf_rows.append(self._world_np[r.world])
                else:
                    raise ValueError(
                        "request carries neither sdf nor a registered world")
            ex = self._host_seeds(
                np.stack([np.asarray(r.start) for r in requests]),
                np.stack([np.asarray(r.goal) for r in requests]),
                np.stack(sdf_rows),
            )
            if pad:
                ex = np.concatenate([ex, np.repeat(ex[:1], pad, axis=0)])
            extra_tail = (jnp.asarray(ex, dt),)
            self.stats["host_seed_time_s"] += time.perf_counter() - t_h

        t0 = time.perf_counter()
        with self._lock:
            if bank_mode:
                idx = jnp.asarray(
                    [self._world_index[r.world] for r in requests]
                    + [self._world_index[requests[0].world]] * pad
                )
                args = (start, goal, idx) + extra_tail + (self._world_bank,)
                out = (self._plan_warm_bank(th0, *args) if warm
                       else self._plan_cold_bank(*args))
            else:
                sdf = self._resolve_sdfs(requests, pad)
                args = (start, goal, sdf) + extra_tail
                out = (self._plan_warm(th0, *args) if warm
                       else self._plan_cold(*args))
            # ONE transfer for every output (each separate fetch is a
            # full round-trip on a remote device)
            th, err0, errf, n_iters = jax.device_get(out)
        dt_dev = time.perf_counter() - t0

        self.stats["requests"] += n
        self.stats["batches"] += 1
        self.stats["padded_rows"] += pad
        self.stats["device_time_s"] += dt_dev

        fill = n / self.batch_size
        return [
            PlanResponse(
                th=th[i],
                err_init=float(err0[i]),
                err_final=float(errf[i]),
                iters=int(n_iters[i]),
                batch_fill=fill,
                latency_s=dt_dev,
            )
            for i in range(n)
        ]

    # -- async micro-batching path -----------------------------------------

    async def start(self) -> None:
        """Start the dispatcher on the running event loop."""
        if self._task is not None:
            raise RuntimeError("service already started")
        self._queue = asyncio.Queue()
        self._task = asyncio.ensure_future(self._dispatch_loop())

    async def stop(self) -> None:
        """Cancel the dispatcher immediately; requests still queued (not
        yet dispatched) never resolve — call only after in-flight
        ``submit()``s have returned (or wrap them in ``wait_for``)."""
        if self._task is None:
            return
        self._task.cancel()
        try:
            await self._task
        except asyncio.CancelledError:
            pass
        self._task = None
        self._queue = None

    async def submit(self, request: PlanRequest) -> PlanResponse:
        """Enqueue one request; resolves when its batch returns."""
        if self._queue is None:
            raise RuntimeError("service not started")
        loop = asyncio.get_running_loop()
        fut = loop.create_future()
        t_submit = time.perf_counter()
        await self._queue.put((request, fut, t_submit))
        return await fut

    async def _dispatch_loop(self) -> None:
        loop = asyncio.get_running_loop()
        while True:
            first = await self._queue.get()
            batch = [first]
            deadline = loop.time() + self.window_s
            while len(batch) < self.batch_size:
                timeout = deadline - loop.time()
                if timeout <= 0:
                    break
                try:
                    batch.append(
                        await asyncio.wait_for(self._queue.get(), timeout)
                    )
                except asyncio.TimeoutError:
                    break
            requests = [b[0] for b in batch]
            try:
                responses = await loop.run_in_executor(
                    None, self.plan_batch_sync, requests
                )
            except Exception as exc:  # propagate to every waiter
                for _, fut, _ in batch:
                    if not fut.done():
                        fut.set_exception(exc)
                continue
            now = time.perf_counter()
            for (_, fut, t_submit), resp in zip(batch, responses):
                resp.latency_s = now - t_submit
                if not fut.done():
                    fut.set_result(resp)
