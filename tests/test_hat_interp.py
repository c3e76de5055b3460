"""Equivalence contract for the grouped hat-matmul interpolation path.

The hat path (ops/hat_interp.py) must be numerically identical to the
site-index interpolation path (itself contracted to dense grid_sample by
tests/test_site_interp.py), and the full hat render must match the site
render given identical z samples (perturb off).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralbody_tpu.models import latent_xyzc, sparse_conv_net
from neuralbody_tpu.models.latent_xyzc import ModelStatic
from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
from neuralbody_tpu.ops import hat_interp
from neuralbody_tpu.renderer.renderer import RenderSettings, render_rays
from neuralbody_tpu.train.step import loss_fn
from neuralbody_tpu.utils.synthetic import make_batch

VOX = 0.02
N_RAYS = 64
N_SAMPLES = 8
GROUP = 32


@pytest.fixture(scope="module")
def scene():
    batch_np, static = make_batch(
        n_rays=N_RAYS, n_verts=512, voxel_size=VOX, seed=3,
        hat=True, n_samples=N_SAMPLES, hat_perturb=False)
    # rebuild the same batch without hat fields for the site path
    base_np, _ = make_batch(n_rays=N_RAYS, n_verts=512, voxel_size=VOX,
                            seed=3)
    ms = ModelStatic(encoder=EncoderStatic(
        out_sh=static["out_sh"], site_caps=static["site_caps"]))
    params, _ = latent_xyzc.init(jax.random.PRNGKey(0), num_train_frame=4,
                                 nv=512)
    return batch_np, base_np, static, ms, params


def _expand_rows(batch_np, static, use_device=False):
    """Expanded per-level row lists from the compact segment payload —
    via the device expansion (jit) or its numpy mirror."""
    caps = static["hat"]["rows_caps"]
    rows = {}
    for li, l in enumerate((1, 2, 3, 4)):
        sa = batch_np[f"hat_seg_a{l}"][0].astype(np.int32)
        sc = batch_np[f"hat_seg_cum{l}"][0].astype(np.int32)
        sent = static["site_caps"][l]
        if use_device:
            rows[l] = jax.jit(hat_interp.expand_segments,
                              static_argnums=(2, 3))(
                jnp.asarray(sa), jnp.asarray(sc), caps[li], sent)
        else:
            rows[l] = jnp.asarray(
                hat_interp.expand_segments_np(sa, sc, caps[li], sent))
    return rows


def test_expand_segments_device_matches_numpy(scene):
    batch_np, _, static, ms, params = scene
    dev = _expand_rows(batch_np, static, use_device=True)
    ref = _expand_rows(batch_np, static, use_device=False)
    for l in (1, 2, 3, 4):
        np.testing.assert_array_equal(np.asarray(dev[l]), np.asarray(ref[l]))


def test_inverse_perm_first_occurrence(scene):
    batch_np, _, static, ms, params = scene
    srt = np.asarray(batch_np["hat_sort"][0]).astype(np.int64)
    n = N_RAYS * N_SAMPLES
    # numpy reference: reversed assignment -> first occurrence wins
    ref = np.empty(n, np.int64)
    ref[srt[::-1]] = np.arange(len(srt) - 1, -1, -1)
    dev = hat_interp.inverse_perm(jnp.asarray(srt.astype(np.int32)), n)
    np.testing.assert_array_equal(np.asarray(dev), ref)


def test_hat_level_matches_site_interp(scene):
    batch_np, _, static, ms, params = scene
    batch = jax.tree.map(jnp.asarray, batch_np)
    geom = batch["geom"]

    site_feats, _ = latent_xyzc.encode_sparse_voxels(
        params, geom, ms, densify=False)
    ivols = sparse_conv_net.index_volumes(geom, ms.encoder)

    geom0 = {k: v[0] for k, v in geom.items()}
    rows = _expand_rows(batch_np, static)
    wpts = jnp.asarray(
        hat_interp.sorted_pts_np(batch_np, 0, N_SAMPLES)[0])
    frame = {"R": batch["R"][0], "Th": batch["Th"][0],
             "bounds": batch["bounds"][0]}
    ppts = latent_xyzc.pts_to_can_pts(wpts, frame["R"], frame["Th"])
    dhw = latent_xyzc.get_dhw_vox(ppts, frame["bounds"], (VOX,) * 3)

    feat_hat = hat_interp.hat_interpolate(
        [x[0] for x in site_feats], geom0, rows, dhw, ms)

    feat_site = latent_xyzc.interpolate_site_features(
        [x[0] for x in site_feats], [v[0] for v in ivols],
        dhw.reshape(-1, 3), ms)

    np.testing.assert_allclose(
        np.asarray(feat_hat.reshape(-1, feat_hat.shape[-1])),
        np.asarray(feat_site), rtol=1e-5, atol=1e-5)


def test_hat_3d_tiles_match_site_interp(scene):
    """3D (d, h, w) tiles shrink the per-group row lists; the interpolation
    contract must hold unchanged."""
    _, base_np, static, ms, params = scene
    batch_np, static3d = make_batch(
        n_rays=N_RAYS, n_verts=512, voxel_size=VOX, seed=3,
        hat=True, n_samples=N_SAMPLES, hat_perturb=False,
        hat_static=dict(group_size=GROUP, tile=(4, 8, 8)))
    hs3d = static3d["hat"]
    batch = jax.tree.map(jnp.asarray, batch_np)
    geom = batch["geom"]
    site_feats, _ = latent_xyzc.encode_sparse_voxels(
        params, geom, ms, densify=False)
    ivols = sparse_conv_net.index_volumes(geom, ms.encoder)
    geom0 = {k: v[0] for k, v in geom.items()}
    rows = _expand_rows(batch_np, {"hat": hs3d, "site_caps":
                                   static["site_caps"]})
    wpts = jnp.asarray(
        hat_interp.sorted_pts_np(batch_np, 0, N_SAMPLES)[0])
    frame = {"R": batch["R"][0], "Th": batch["Th"][0],
             "bounds": batch["bounds"][0]}
    ppts = latent_xyzc.pts_to_can_pts(wpts, frame["R"], frame["Th"])
    dhw = latent_xyzc.get_dhw_vox(ppts, frame["bounds"], (VOX,) * 3)
    feat_hat = hat_interp.hat_interpolate(
        [x[0] for x in site_feats], geom0, rows, dhw, ms)
    feat_site = latent_xyzc.interpolate_site_features(
        [x[0] for x in site_feats], [v[0] for v in ivols],
        dhw.reshape(-1, 3), ms)
    np.testing.assert_allclose(
        np.asarray(feat_hat.reshape(-1, feat_hat.shape[-1])),
        np.asarray(feat_site), rtol=1e-5, atol=1e-5)


def test_hat_render_matches_site_render(scene):
    batch_np, base_np, static, ms, params = scene
    s_hat = RenderSettings(model=ms, voxel_size=(VOX,) * 3,
                           n_samples=N_SAMPLES, chunk_rays=N_RAYS,
                           site_interp=True,
                           hat_rows_caps=static["hat"]["rows_caps"])
    hat_batch = jax.tree.map(jnp.asarray, batch_np)
    base_batch = jax.tree.map(jnp.asarray, base_np)

    ret_hat, _ = render_rays(params, hat_batch, s_hat, key=None, train=False)
    ret_site, _ = render_rays(params, base_batch, s_hat, key=None,
                              train=False)
    np.testing.assert_allclose(np.asarray(ret_hat["rgb_map"]),
                               np.asarray(ret_site["rgb_map"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret_hat["acc_map"]),
                               np.asarray(ret_site["acc_map"]),
                               rtol=1e-4, atol=1e-5)


def test_hat_grad_matches_site_grad(scene):
    batch_np, base_np, static, ms, params = scene
    s = RenderSettings(model=ms, voxel_size=(VOX,) * 3,
                       n_samples=N_SAMPLES, chunk_rays=N_RAYS,
                       site_interp=True, perturb=False,
                       hat_rows_caps=static["hat"]["rows_caps"])
    hat_batch = jax.tree.map(jnp.asarray, batch_np)
    base_batch = jax.tree.map(jnp.asarray, base_np)
    key = jax.random.PRNGKey(0)

    g_hat = jax.grad(lambda p: loss_fn(p, hat_batch, s, key)[0])(params)
    g_site = jax.grad(lambda p: loss_fn(p, base_batch, s, key)[0])(params)

    flat_h, _ = jax.flatten_util.ravel_pytree(g_hat)
    flat_s, _ = jax.flatten_util.ravel_pytree(g_site)
    np.testing.assert_allclose(np.asarray(flat_h), np.asarray(flat_s),
                               rtol=2e-4, atol=2e-6)


def test_hat_rows_cover_all_corners(scene):
    """Every sample's 8 corner cells (per level) must be inside its group's
    row list when occupied — the correctness precondition of the grouping."""
    batch_np, _, static, ms, params = scene
    out_sh = static["out_sh"]
    geom0 = {k: v[0] for k, v in batch_np["geom"].items()}
    wpts_g, _ = hat_interp.sorted_pts_np(batch_np, 0, N_SAMPLES)
    P = wpts_g.shape[1]
    wpts = wpts_g.reshape(-1, 3)
    Rm, Th = batch_np["R"][0], batch_np["Th"][0].reshape(1, 3)
    ppts = (wpts - Th) @ Rm
    rev = [2, 1, 0]
    dhw = (ppts[:, rev] - batch_np["bounds"][0][0][rev]) / VOX

    all_rows = _expand_rows(batch_np, static)
    for lvl in (1, 2, 3, 4):
        sh_l = np.array([s // (2 ** lvl) for s in out_sh])
        scale = (sh_l - 1.0) / np.asarray(out_sh)
        pos = (dhw * scale).reshape(-1, P, 3)
        ns = int(geom0[f"nsite{lvl}"])
        sites = geom0[f"sites{lvl}"][:ns]
        key_of = {(int(d), int(h), int(w)): i
                  for i, (d, h, w) in enumerate(sites)}
        rows = np.asarray(all_rows[lvl])
        for g in range(pos.shape[0]):
            rowset = set(rows[g].tolist())
            for p in range(P):
                base = np.floor(pos[g, p]).astype(int)
                for dd in (0, 1):
                    for hh in (0, 1):
                        for ww in (0, 1):
                            c = (base[0] + dd, base[1] + hh, base[2] + ww)
                            if any(x < 0 for x in c) or \
                               any(c[i] >= sh_l[i] for i in range(3)):
                                continue
                            r = key_of.get(c)
                            if r is not None:
                                assert r in rowset, (lvl, g, p, c)


def test_pre_expanded_rows_bit_equal(scene):
    """render_rays_hat with hat_rows{l}/hat_wpts/hat_vdir precomputed
    (HBM-resident reuse, bench broadcast path; VERDICT r4 #3) matches the
    compact segment payload path to 1-ulp (the separate precompute jit
    may fuse the pts FMA differently)."""
    batch_np, _, static, ms, params = scene
    s = RenderSettings(model=ms, voxel_size=(VOX,) * 3,
                       n_samples=N_SAMPLES, chunk_rays=N_RAYS,
                       hat_rows_caps=static["hat"]["rows_caps"])
    seg_batch = jax.tree.map(jnp.asarray, batch_np)

    from neuralbody_tpu.renderer.renderer import precompute_hat_device
    pre_batch = precompute_hat_device(
        seg_batch, static["hat"]["rows_caps"], static["site_caps"],
        N_SAMPLES)
    for l in (1, 2, 3, 4):
        assert f"hat_rows{l}" in pre_batch
    assert pre_batch["hat_wpts"].shape[-1] == 3

    ret_seg, _ = render_rays(params, seg_batch, s, key=None, train=False)
    # drop hat_rows_caps: the pre-expanded path must not need them
    ret_pre, _ = render_rays(params, pre_batch, s._replace(hat_rows_caps=()),
                             key=None, train=False)
    for k in ret_seg:
        np.testing.assert_allclose(np.asarray(ret_seg[k]),
                                   np.asarray(ret_pre[k]),
                                   rtol=1e-5, atol=1e-7)


def test_quantized_z_render_close(scene):
    """quantize_z=True (u16 slab fractions, the production payload) stays
    within quantization tolerance of the exact-z hat render, and the
    device z decode is bit-compatible with the host planner's decode."""
    _, base_np, static, ms, params = scene
    from neuralbody_tpu.ops.hat_interp import decode_z_np, prepare_hat_batch

    qb, _ = prepare_hat_batch(
        dict(base_np), static["out_sh"], static["site_caps"], (VOX,) * 3,
        N_SAMPLES, group_size=GROUP, rng=None, quantize_z=True)
    eb, _ = prepare_hat_batch(
        dict(base_np), static["out_sh"], static["site_caps"], (VOX,) * 3,
        N_SAMPLES, group_size=GROUP, rng=None, quantize_z=False)
    assert "z_vals" not in qb and qb["z_frac"].dtype == np.uint16

    # host decode == device decode (same formula; <=1 ulp FMA slack)
    z_host = decode_z_np(qb["z_frac"][0], qb["near"][0], qb["far"][0])
    z_dev = np.asarray(
        jnp.asarray(qb["near"][0])[:, None]
        + (jnp.asarray(qb["far"][0]) - jnp.asarray(qb["near"][0]))[:, None]
        * (jnp.asarray(qb["z_frac"][0]).astype(jnp.float32)
           * jnp.float32(1.0 / 65535.0)))
    np.testing.assert_allclose(z_dev, z_host, rtol=2e-7, atol=0)
    # quantization granularity: slab / 65535
    slab = (base_np["far"][0] - base_np["near"][0]).max()
    assert np.abs(z_host - eb["z_vals"][0]).max() <= slab / 65535 + 1e-7

    s = RenderSettings(model=ms, voxel_size=(VOX,) * 3,
                       n_samples=N_SAMPLES, chunk_rays=N_RAYS,
                       hat_rows_caps=static["hat"]["rows_caps"])
    ret_q, _ = render_rays(params, jax.tree.map(jnp.asarray, qb), s,
                           key=None, train=False)
    ret_e, _ = render_rays(params, jax.tree.map(jnp.asarray, eb), s,
                           key=None, train=False)
    np.testing.assert_allclose(np.asarray(ret_q["rgb_map"]),
                               np.asarray(ret_e["rgb_map"]),
                               rtol=2e-3, atol=2e-3)
