"""Multi-chip sharding: device meshes, batch sharding, TP param rules.

The reference has **no** distributed backend (SURVEY.md §2.9) — its only
scaling mechanism is single-device batching.  Here scaling is first-class
and TPU-native: a ``Mesh`` with a ``data`` axis shards the *problem batch*
across ICI (per-problem state is ~400 floats; problems are the parallel
dimension), and an optional ``model`` axis tensor-shards the learned head's
wide Dense layers (Megatron column/row split) — all through GSPMD: annotate
shardings on the inputs, jit, and XLA inserts the all-reduces over ICI.

No NCCL/MPI translation exists because nothing in the algorithm needs
point-to-point communication; gradient all-reduce over ``data`` falls out
of jit-of-grad on sharded batches.

Usage:
    mesh = make_mesh(jax.devices(), model_parallel=2)
    batch = shard_batch(batch, mesh)
    variables = shard_params(variables, mesh)
    jitted_train_step(state, batch, rng)   # GSPMD handles the rest
"""
from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence] = None, model_parallel: int = 1,
              strict: bool = False) -> Mesh:
    """2-D ``(data, model)`` mesh over the given devices.

    With ``model_parallel=1`` this is pure data parallelism.  Axis order
    puts ``model`` innermost so TP collectives ride the fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel:
        if strict:
            raise ValueError(
                f"{n} devices not divisible by model_parallel={model_parallel}"
            )
        import warnings

        warnings.warn(
            f"{n} devices not divisible by model_parallel={model_parallel}; "
            "falling back to model_parallel=1 (pure data parallelism). "
            "Pass strict=True to make this an error."
        )
        model_parallel = 1
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=(DATA_AXIS, MODEL_AXIS))


def make_multihost_mesh(model_parallel: int = 1) -> Mesh:
    """3-axis ``(dcn, data, model)`` mesh for multi-host deployments.

    The outer ``dcn`` axis spans hosts (slow network — keep only
    data-parallel traffic on it: gradient all-reduce once per step), while
    ``data``/``model`` stay within each host's ICI domain.  Shard batches
    over ``("dcn", "data")`` jointly and parameters over ``model`` —
    GSPMD then routes TP collectives over ICI and only the gradient
    reduction over DCN.

    On a single host this degenerates to ``(1, data, model)`` and is
    equivalent to :func:`make_mesh`.  The multi-process path is exercised
    by ``tests/test_multihost.py``: two ``jax.distributed`` CPU processes
    form the global mesh and reproduce unsharded plan trajectories
    through Gloo cross-process collectives.
    """
    n_proc = jax.process_count()
    local = [d for d in jax.devices()]
    n = len(local)
    per_host = n // n_proc
    if per_host % model_parallel:
        raise ValueError(
            f"{per_host} devices/host not divisible by model_parallel={model_parallel}"
        )
    arr = np.array(local).reshape(n_proc, per_host // model_parallel,
                                  model_parallel)
    return Mesh(arr, axis_names=("dcn", DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the data axes (``("dcn", "data")`` when a
    multi-host mesh is used, else ``"data"``)."""
    if "dcn" in mesh.axis_names:
        return NamedSharding(mesh, P(("dcn", DATA_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place every array in a batch pytree with its batch axis on ``data``."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


# Megatron-style TP for the covariance head's wide Dense stack: column-split
# the first projection, row-split the second, replicate the small output.
_TP_RULES = (
    (re.compile(r"head.*Dense_0.*kernel"), P(None, MODEL_AXIS)),
    (re.compile(r"head.*Dense_1.*kernel"), P(MODEL_AXIS, None)),
    (re.compile(r"head.*Dense_0.*bias"), P(MODEL_AXIS)),
)


def param_spec(path: str, shape) -> P:
    for pat, spec in _TP_RULES:
        if pat.search(path) and len(spec) <= len(shape):
            return spec
    return P()


def shard_params(variables: Any, mesh: Mesh) -> Any:
    """device_put each parameter with its TP spec (replicated otherwise).

    GSPMD propagates these shardings through the jitted train step, so the
    wide matmuls split over ``model`` and gradients all-reduce over
    ``data`` automatically.
    """
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    treedef = jax.tree_util.tree_structure(variables)
    out = []
    for path, leaf in flat:
        name = "/".join(str(p) for p in path)
        out.append(
            jax.device_put(leaf, NamedSharding(mesh, param_spec(name, leaf.shape)))
        )
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_state(state, mesh: Mesh):
    """Shard a TrainState: params/opt-state by TP rules, counters replicated."""
    variables = shard_params(state.variables, mesh)
    opt_state = shard_params(state.opt_state, mesh)
    step = jax.device_put(state.step, replicated(mesh))
    return state.replace(step=step, variables=variables, opt_state=opt_state)
