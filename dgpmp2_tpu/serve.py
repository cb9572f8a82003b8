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
  in a thread-pool executor; the loop keeps accepting requests for the
  next batch while the current one is in flight.
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


@dataclasses.dataclass
class PlanRequest:
    """One planning problem: (D,) start/goal states and an (H, W) SDF.

    ``th_init`` optionally seeds the optimizer (warm-start replanning);
    ``None`` seeds the constant-velocity straight line the reference's
    examples use.
    """

    start: np.ndarray
    goal: np.ndarray
    sdf: np.ndarray
    th_init: Optional[np.ndarray] = None


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
    """

    def __init__(self, spec, robot, cov_scalars: dict,
                 optim_cfg=None, restarts: int = 16, amp: float = 1.5,
                 prune_iters: int = 0, keep: int = 0, seed: int = 0,
                 dtype=jnp.float32):
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
        self.rng = jax.random.PRNGKey(seed)
        self.dtype = dtype

    def _error(self, params, th, sdf):
        res = graph.eval_residuals(self.spec, self.robot, params, th, sdf)
        return graph.error_from_residuals(self.spec, params, res)

    def plan(self, th0, start, goal, sdf):
        params = graph.default_params(
            self.spec, self.robot, start, goal, **self.cov,
            dtype=self.dtype,
        )
        res = self._ms.plan_multistart(
            self.spec, self.robot, params, th0, sdf, self.cfg, self.rng,
            restarts=self.restarts, amp=self.amp,
            prune_iters=self.prune_iters, keep=self.keep,
        )
        iters = jnp.full(res.th.shape[:1], self.cfg.max_iters, jnp.int32)
        return _AdapterResult(
            th=res.th,
            err_init=self._error(params, th0, sdf),
            err_final=self._error(params, res.th, sdf),
            iters=iters,
        )


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

    def __init__(self, planner, batch_size: int = 64, window_ms: float = 2.0):
        self.planner = planner
        self.batch_size = int(batch_size)
        self.window_s = float(window_ms) / 1e3
        self._plan = jax.jit(
            lambda th0, s, g, sdf: planner.plan(th0, s, g, sdf)
        )
        self._queue: Optional[asyncio.Queue] = None
        self._task: Optional[asyncio.Task] = None
        self._lock = threading.Lock()  # device dispatch is serialized
        self.stats = {
            "requests": 0,
            "batches": 0,
            "padded_rows": 0,
            "device_time_s": 0.0,
        }

    # -- synchronous path --------------------------------------------------

    def warmup(self, sdf_shape: tuple) -> None:
        """Compile the serving program ahead of traffic (first dispatch
        otherwise pays 20-40 s of XLA compile on the TPU)."""
        spec = self.planner.spec
        dt = self.planner.dtype
        d = spec.state_dim
        start = jnp.zeros((self.batch_size, d), dt)
        goal = jnp.ones((self.batch_size, d), dt)
        th0 = straight_line_traj(
            start[:, : spec.dof], goal[:, : spec.dof],
            spec.total_time_sec, spec.total_time_step,
        ).astype(dt)
        sdf = jnp.ones((self.batch_size,) + tuple(sdf_shape), dt)
        jax.block_until_ready(self._plan(th0, start, goal, sdf).th)

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
        sdf = stack("sdf")
        dof = spec.dof
        th_default = straight_line_traj(
            start[:, :dof], goal[:, :dof],
            spec.total_time_sec, spec.total_time_step,
        ).astype(dt)
        if any(r.th_init is not None for r in requests):
            rows = [
                np.asarray(r.th_init) if r.th_init is not None
                else np.asarray(th_default[i])
                for i, r in enumerate(requests)
            ]
            rows += [rows[0]] * pad
            th0 = jnp.asarray(np.stack(rows), dt)
        else:
            th0 = th_default

        t0 = time.perf_counter()
        with self._lock:
            res = self._plan(th0, start, goal, sdf)
            th = np.asarray(res.th)
        dt_dev = time.perf_counter() - t0

        self.stats["requests"] += n
        self.stats["batches"] += 1
        self.stats["padded_rows"] += pad
        self.stats["device_time_s"] += dt_dev

        fill = n / self.batch_size
        err0 = np.asarray(res.err_init)
        errf = np.asarray(res.err_final)
        iters = np.asarray(res.iters)
        return [
            PlanResponse(
                th=th[i],
                err_init=float(err0[i]),
                err_final=float(errf[i]),
                iters=int(iters[i]),
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
