"""Shared setup for the example scripts (headless-friendly)."""
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

if os.environ.get("DGPMP2_CPU", "1") == "1":
    # Examples default to CPU so they run anywhere; set DGPMP2_CPU=0 for TPU.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from dgpmp2_tpu.ops import sdf as sdf_ops  # noqa: E402
from dgpmp2_tpu.utils.config import load_params  # noqa: E402

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "dgpmp2_tpu", "configs")
OUT_DIR = os.path.join(os.path.dirname(__file__), "out")
os.makedirs(OUT_DIR, exist_ok=True)


def load_configs(plan_yaml="gpmp2_2d_params.yaml"):
    return load_params(
        os.path.join(CONFIG_DIR, plan_yaml),
        os.path.join(CONFIG_DIR, "robot_2d.yaml"),
        os.path.join(CONFIG_DIR, "env_2d_params.yaml"),
    )


def box_world(imsize=128, x_lims=(-5.0, 5.0)):
    """A simple box-obstacle world blocking the main diagonal."""
    img = np.ones((imsize, imsize))
    lo, hi = int(0.4 * imsize), int(0.6 * imsize)
    img[lo:hi, lo:hi] = 0.0
    res = (x_lims[1] - x_lims[0]) / imsize
    sdf = sdf_ops.sdf_from_occupancy(jnp.asarray(img, jnp.float32), res=res)
    return img, sdf, res


def plot_plan(img, th_init, th_final, path, x_lims=(-5.0, 5.0), y_lims=(-5.0, 5.0)):
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(img, cmap="gray", extent=(*x_lims, *y_lims), origin="upper")
    ti, tf = np.asarray(th_init), np.asarray(th_final)
    ax.plot(ti[:, 0], ti[:, 1], "r--", label="initial")
    ax.plot(tf[:, 0], tf[:, 1], "b-", label="optimized")
    ax.legend()
    fig.savefig(path, bbox_inches="tight", dpi=110)
    plt.close(fig)
    print(f"wrote {path}")
