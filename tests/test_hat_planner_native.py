"""Bit-for-bit parity: C++ hat planner vs the numpy planner.

The native planner (native/hat_planner.cpp) takes over steady-state
planning (static rows/seg caps and n_groups); every output array must
match the numpy reference exactly — perm and all four per-level
(seg_a, seg_cum) segment lists, including the inert padding groups'
point-0 segments.
"""
import numpy as np
import pytest

from neuralbody_tpu.ops import hat_interp
from neuralbody_tpu.ops.hat_planner_native import (available,
                                                   plan_hat_segments_native)
from neuralbody_tpu.utils.synthetic import make_batch

pytestmark = pytest.mark.skipif(not available(),
                                reason="native planner unavailable")


def _numpy_plan(dhw, geom, out_sh, site_caps, **kw):
    """Run the pure-numpy planner (bypassing the native dispatch)."""
    import unittest.mock as mock
    with mock.patch.object(hat_interp, "_native_ok", lambda: False):
        return hat_interp.plan_hat_groups(dhw, geom, out_sh, site_caps, **kw)


def _scene(seed, n_rays=96, n_samples=8, vox=0.02):
    batch, static = make_batch(n_rays=n_rays, n_verts=512, voxel_size=vox,
                               seed=seed)
    b = 0
    rng = np.random.RandomState(seed)
    z = hat_interp.stratified_z_np(batch["near"][b], batch["far"][b],
                                   n_samples, rng)
    pts = (batch["ray_o"][b][:, None, :]
           + batch["ray_d"][b][:, None, :] * z[..., None]).reshape(-1, 3)
    Rm = batch["R"][b]
    Th = batch["Th"][b].reshape(1, 3)
    ppts = (pts - Th) @ Rm
    rev = [2, 1, 0]
    dhw = ((ppts[:, rev] - batch["bounds"][b][0][rev]) / vox).astype(
        np.float32)
    geom = {k: v[b] for k, v in batch["geom"].items()}
    return dhw, geom, static


@pytest.mark.parametrize("tile", [(4, 8), (4, 8, 8), (2, 4, 4)])
@pytest.mark.parametrize("seed", [0, 7])
def test_native_matches_numpy(tile, seed):
    dhw, geom, static = _scene(seed)
    kw = dict(group_size=32, tile=tile)
    ref = _numpy_plan(dhw, geom, static["out_sh"], static["site_caps"],
                      rows_caps=None, n_groups=None, seg_caps=None, **kw)
    # pad the static sizes a little, as the loader does across batches
    caps = tuple(c + 32 for c in ref["rows_caps"])
    segc = tuple(c + 8 for c in ref["seg_caps"])
    ngrp = ref["n_groups"] + 3
    ref = _numpy_plan(dhw, geom, static["out_sh"], static["site_caps"],
                      rows_caps=caps, seg_caps=segc, n_groups=ngrp, **kw)
    nat = plan_hat_segments_native(dhw, geom, static["out_sh"],
                                   static["site_caps"], kw["group_size"],
                                   tile, caps, segc, ngrp)
    assert nat is not None
    assert set(nat) == set(ref)
    for k in ref:
        if k in ("rows_caps", "seg_caps", "n_groups"):
            assert nat[k] == ref[k], k
        else:
            np.testing.assert_array_equal(nat[k], ref[k], err_msg=k)


def test_native_reports_rows_overflow():
    dhw, geom, static = _scene(3)
    ref = _numpy_plan(dhw, geom, static["out_sh"], static["site_caps"],
                      group_size=32, tile=(4, 8), rows_caps=None,
                      seg_caps=None, n_groups=None)
    tight = tuple(max(1, c // 8) for c in ref["rows_caps"])
    nat = plan_hat_segments_native(dhw, geom, static["out_sh"],
                                   static["site_caps"], 32, (4, 8),
                                   tight, ref["seg_caps"], ref["n_groups"])
    assert nat is None  # dispatcher falls back to numpy, which raises
    with pytest.raises(ValueError, match="hat rows overflow"):
        hat_interp.plan_hat_groups(
            dhw, geom, static["out_sh"], static["site_caps"],
            group_size=32, tile=(4, 8), rows_caps=tight,
            seg_caps=ref["seg_caps"], n_groups=ref["n_groups"])


def test_native_reports_segs_overflow():
    dhw, geom, static = _scene(5)
    ref = _numpy_plan(dhw, geom, static["out_sh"], static["site_caps"],
                      group_size=32, tile=(4, 8, 8), rows_caps=None,
                      seg_caps=None, n_groups=None)
    tight = tuple(max(1, c // 8) for c in ref["seg_caps"])
    nat = plan_hat_segments_native(dhw, geom, static["out_sh"],
                                   static["site_caps"], 32, (4, 8, 8),
                                   ref["rows_caps"], tight, ref["n_groups"])
    assert nat is None
    with pytest.raises(ValueError, match="hat segs overflow"):
        hat_interp.plan_hat_groups(
            dhw, geom, static["out_sh"], static["site_caps"],
            group_size=32, tile=(4, 8, 8), rows_caps=ref["rows_caps"],
            seg_caps=tight, n_groups=ref["n_groups"])


def test_native_reports_group_overflow():
    dhw, geom, static = _scene(4)
    ref = _numpy_plan(dhw, geom, static["out_sh"], static["site_caps"],
                      group_size=32, tile=(4, 8), rows_caps=None,
                      seg_caps=None, n_groups=None)
    nat = plan_hat_segments_native(dhw, geom, static["out_sh"],
                                   static["site_caps"], 32, (4, 8),
                                   ref["rows_caps"], ref["seg_caps"],
                                   max(1, ref["n_groups"] // 4))
    assert nat is None
    with pytest.raises(ValueError, match="hat group overflow"):
        hat_interp.plan_hat_groups(
            dhw, geom, static["out_sh"], static["site_caps"],
            group_size=32, tile=(4, 8), rows_caps=ref["rows_caps"],
            seg_caps=ref["seg_caps"], n_groups=max(1, ref["n_groups"] // 4))
