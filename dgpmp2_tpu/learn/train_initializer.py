"""Supervised training of the trajectory-initializer network.

Rebuild of ``diff_gpmp2/learning/train_initializer.py``: InitNet predicts
the delta from a straight-line seed to the expert trajectory (MSE loss,
``train_initializer.py:47-56,119-149``); validation reports the solve rate
of ``seed + delta`` by collision-checking against the SDF (``check_solved``,
``train_initializer.py:81-88``).

    python -m dgpmp2_tpu.learn.train_initializer --dataset_folders d \
        --out_folder runs/init --epochs 20
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml

from dgpmp2_tpu.data import dataset as ds
from dgpmp2_tpu.models.init_net import InitNet
from dgpmp2_tpu.ops import sdf as sdf_ops
from dgpmp2_tpu.utils.trajectory import straight_line_traj


def make_train_fns(net: InitNet, tx, total_time_sec, total_time_step, dof):
    def seed_traj(start, goal):
        return straight_line_traj(
            start[:, :dof], goal[:, :dof], total_time_sec, total_time_step
        ).astype(jnp.float32)

    def loss_fn(params, batch, rng):
        th0 = seed_traj(batch["start"], batch["goal"])
        x = jnp.stack([batch["im"], batch["sdf"]], axis=-1)
        delta = net.apply(params, x, th0, train=True, rngs={"dropout": rng})
        target = batch["th_opt"] - th0
        return jnp.mean(jnp.sum((delta - target) ** 2, axis=-1))

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, batch):
        th0 = seed_traj(batch["start"], batch["goal"])
        x = jnp.stack([batch["im"], batch["sdf"]], axis=-1)
        return th0 + net.apply(params, x, th0, train=False)

    return train_step, predict, seed_traj


def solve_rate(th, sdf, res, x_lims, y_lims, robot_radius):
    """Fraction of trajectories whose every state clears the robot radius
    (``train_initializer.py:81-88``)."""
    d, _ = sdf_ops.bilinear_lookup(sdf, th[..., :2], res, x_lims, y_lims)
    return float(jnp.mean(jnp.all(d > robot_radius, axis=-1)))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset_folders", nargs="+", required=True)
    p.add_argument("--out_folder", required=True)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--valid_size", type=float, default=0.2)
    p.add_argument("--total_time_sec", type=float, default=10.0)
    p.add_argument("--total_time_step", type=int, default=100)
    p.add_argument("--robot_radius", type=float, default=0.4)
    p.add_argument("--x_lims", nargs=2, type=float, default=(-5.0, 5.0))
    p.add_argument("--y_lims", nargs=2, type=float, default=(-5.0, 5.0))
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    dataset = ds.PlanningDatasetMulti(args.dataset_folders, mode="train")
    rng_np = np.random.default_rng(args.seed)
    tr, va = ds.train_valid_split(len(dataset), args.valid_size, rng_np)

    sample = dataset[0]
    im_size = sample["im"].shape[-1]
    state_dim = sample["th_opt"].shape[-1]
    res = (args.x_lims[1] - args.x_lims[0]) / im_size

    net = InitNet(num_states=args.total_time_step + 1, state_dim=state_dim)
    tx = optax.adam(args.lr)
    train_step, predict, seed_traj = make_train_fns(
        net, tx, args.total_time_sec, args.total_time_step, state_dim // 2
    )

    rng = jax.random.PRNGKey(args.seed)
    b0 = next(ds.as_batches(dataset, tr, args.batch_size))
    b0 = {k: jnp.asarray(v) for k, v in b0.items()}
    x0 = jnp.stack([b0["im"], b0["sdf"]], axis=-1)
    params = net.init(rng, x0, seed_traj(b0["start"], b0["goal"]), train=False)
    opt_state = tx.init(params)

    os.makedirs(args.out_folder, exist_ok=True)
    history = []
    for epoch in range(args.epochs):
        losses = []
        for batch in ds.as_batches(dataset, tr, args.batch_size, rng=rng_np):
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, loss = train_step(
                params, opt_state, batch, jax.random.fold_in(rng, epoch)
            )
            losses.append(float(loss))
        row = {"epoch": epoch, "loss": float(np.mean(losses))}
        if len(va) >= args.batch_size:
            vb = next(ds.as_batches(dataset, va, args.batch_size))
            vb = {k: jnp.asarray(v) for k, v in vb.items()}
            th = predict(params, vb)
            row["valid_solve_rate"] = solve_rate(
                th, vb["sdf"], res, tuple(args.x_lims), tuple(args.y_lims),
                args.robot_radius,
            )
        history.append(row)
        print(row)
        with open(os.path.join(args.out_folder, "init_losses.yaml"), "w") as fp:
            yaml.safe_dump(history, fp)
    return params, history


if __name__ == "__main__":
    main()
