"""3-D dataset generation: worlds, expert labels, loader round-trip.

Mirrors the 2-D data-layer tests over the 3-D generator (no reference
analog — the reference is planar-only; see
``dgpmp2_tpu/data/generate3d.py``).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from dgpmp2_tpu.data import generate3d, obstacles3d
from dgpmp2_tpu.ops import sdf as sdf_ops

LIMS = (-5.0, 5.0)


@pytest.mark.parametrize("family", ["boxes3d", "scatter3d", "window",
                                    "columns", "mixed3d"])
def test_make_map3d_families(family):
    rng = np.random.default_rng(0)
    vox = obstacles3d.make_map3d(family, rng, 32)
    assert vox.shape == (32, 32, 32)
    assert set(np.unique(vox)) <= {0.0, 1.0}
    assert (vox == 0).any(), "must contain obstacles"
    assert (vox == 1).mean() > 0.5, "must stay mostly free"
    if family == "columns":
        # Full-height pillars: occupancy is z-invariant.
        assert np.all(vox == vox[0][None])
    if family == "window":
        occ = vox == 0
        # Some y-slab must block (almost) the whole cross-section except
        # the window: find the wall, check exactly one connected opening.
        wall_rows = occ.all(axis=(0, 2))  # rows fully blocked in (z, x)?
        assert not wall_rows.all()
        blocked_frac = occ.mean(axis=(0, 2))
        assert blocked_frac.max() > 0.9, "wall must span the cross-section"


def test_clearance_patches_respected():
    """Start/goal clearance patches stay obstacle-free."""
    rng = np.random.default_rng(1)
    size, patch = 32, 5
    pts = np.asarray([[6.0, 6.0, 6.0], [26.0, 26.0, 26.0]])
    for fam in obstacles3d.FAMILIES3D:
        vox = obstacles3d.make_map3d(fam, rng, size, pts, patch, 0)
        for p in pts:
            p2 = patch // 2
            sl = tuple(slice(int(c) - p2, int(c) + p2) for c in p)
            assert np.all(vox[sl] == 1.0), (fam, p)


@pytest.mark.slow
def test_generate_and_reload_labels_contact_free(tmp_path):
    out = str(tmp_path / "d3")
    generate3d.generate_split3d(out, 2, 3, "boxes3d", 32,
                                np.random.default_rng(0), t=20, max_iters=25)
    n = 0
    res = (LIMS[1] - LIMS[0]) / 32
    for vox, sdf, start, goal, th_opt, th_init in generate3d.load_split3d(out):
        n += 1
        assert vox.shape == (32, 32, 32) and sdf.shape == (32, 32, 32)
        assert th_opt.shape == (21, 6) and th_init.shape == (21, 6)
        # Endpoint anchoring to the stored start/goal.
        np.testing.assert_allclose(th_opt[0, :3], start[:3], atol=0.05)
        np.testing.assert_allclose(th_opt[-1, :3], goal[:3], atol=0.05)
        # Expert label re-validates collision-free with the robot radius.
        d, _ = sdf_ops.trilinear_lookup(
            jnp.asarray(sdf)[None], jnp.asarray(th_opt[None, :, :3]),
            res, LIMS, LIMS, LIMS,
        )
        assert float(jnp.min(d)) > 0.4
    assert n == 6
