"""Volume renderer: one jitted, shardable function per workload.

TPU-native redesign of the reference renderer object hierarchy (ref:
lib/networks/renderer/if_clight_renderer.py:7-122). Instead of Python
chunk loops around CUDA calls, rendering is a pure function over static
shapes: the feature volume is encoded once per frame inside the same jit,
rays are decoded in `lax.map` chunks to bound memory, and invalid (padded)
rays are masked rather than ragged.

Visual-hull culling (ref: if_clight_renderer_mmsk.py:12-61) is reproduced
as a mask on the raw field: decode everywhere, zero outside the hull —
identical output (the reference zero-fills the same entries), but regular
dense compute, which is what the TPU wants.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import register
from ..models import latent_xyzc
from ..ops.compositing import raw2outputs
from ..ops.ray_ops import sample_along_rays


class RenderSettings(NamedTuple):
    """Hashable render-time static settings (jit static argument)."""
    model: latent_xyzc.ModelStatic
    voxel_size: tuple = (0.005, 0.005, 0.005)
    n_samples: int = 64
    perturb: bool = True
    white_bkgd: bool = False
    raw_noise_std: float = 0.0
    chunk_rays: int = 2048
    hull_views: int = 0      # >0: cull against this many source-view masks
    hull_mode: str = "multi"  # "multi" (mmsk) or "snapshot" (msk)
    img_hw: tuple = (512, 512)
    site_interp: bool = True  # site-feature interpolation (memory-light)
    # static per-level expansion widths for the hat path's compact row
    # segments (= the planner's rows_caps; see ops/hat_interp.py). Only
    # consulted when the batch carries hat fields; the trainer threads the
    # loader-derived caps in at step-build time (train/trainer.py).
    hat_rows_caps: tuple = ()
    # ON-DEVICE batch planning (ops/device_plan.DevicePlanSpec): training
    # batches carry only rays, the plan is built inside the jitted step
    # from banked geometry. Takes effect when set AND the batch has no
    # host-planned hat fields (render_rays dispatch).
    hat_plan: tuple = None


def _frame_info(batch, b):
    return {
        "R": batch["R"][b] if batch["R"].ndim == 3 else batch["R"],
        "Th": batch["Th"][b],
        "bounds": batch["bounds"][b],
        "latent_index": batch["latent_index"][b],
    }


_ELEM_KEYS = ("ray_o", "ray_d", "near", "far", "Th", "bounds",
              "latent_index", "z_vals", "z_frac", "hat_sort",
              "hat_seg_a1", "hat_seg_a2", "hat_seg_a3", "hat_seg_a4",
              "hat_seg_cum1", "hat_seg_cum2", "hat_seg_cum3", "hat_seg_cum4",
              "hat_rows1", "hat_rows2", "hat_rows3", "hat_rows4",
              "hat_wpts", "hat_vdir",
              "Ks", "RT", "msks", "R0_snap", "Th0_snap", "K")


def _batch_elems(batch):
    """Per-element view of the batched render inputs (leading axis B).

    The render paths vmap a single-element function over this tree — under
    mode="batch" (frames sharded over devices) that keeps every op batched
    on the sharded axis, so GSPMD partitions the whole render instead of
    resharding per-element slices (a Python b-loop would serialize all
    frames onto every device)."""
    elems = {k: batch[k] for k in _ELEM_KEYS if k in batch}
    elems["geom"] = batch["geom"]
    B = batch["ray_o"].shape[0]
    elems["R"] = (batch["R"] if batch["R"].ndim == 3
                  else jnp.broadcast_to(batch["R"], (B, 3, 3)))
    return elems


def hull_inside_mask(wpts, Ks, RT, msks, img_hw):
    """Project points into source views; inside = in every mask.

    wpts [N, 3]; Ks [V, 3, 3]; RT [V, 4, 4]; msks [V, H, W].
    (ref: if_clight_renderer_mmsk.py:12-45)
    """
    H, W = img_hw

    def one_view(K, rt, msk):
        Rm, T = rt[:3, :3], rt[:3, 3]
        cam = wpts @ Rm.T + T
        uvw = cam @ K.T
        uv = uvw[:, :2] / uvw[:, 2:]
        ui = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, W - 1)
        vi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, H - 1)
        return msk[vi, ui] > 0

    inside = jax.vmap(one_view)(Ks, RT, msks)       # [V, N]
    return jnp.all(inside, axis=0)


def snapshot_hull_mask(wpts, frame, R0, Th0, K, RT, msk, img_hw):
    """Monocular hull: world -> SMPL -> snapshot world -> mask lookup
    (ref: if_clight_renderer_msk.py:12-49)."""
    H, W = img_hw
    can_pts = jnp.matmul(wpts - jnp.reshape(frame["Th"], (1, 3)), frame["R"])
    pts = can_pts @ R0.T + Th0
    cam = pts @ RT[:3, :3].T + RT[:3, 3]
    uvw = cam @ K.T
    uv = uvw[:, :2] / uvw[:, 2:]
    ui = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0, H - 1)
    return msk[vi, ui] > 0


def precompute_hat_device(batch, rows_caps, site_caps, n_samples):
    """Materialize the hat plan's device-reconstructed tensors ONCE for an
    HBM-resident (repeated) batch: expanded row lists (hat_rows{l}) and
    sorted group points/dirs (hat_wpts/hat_vdir). The compact segment/
    reconstruction encoding exists to shrink the fresh host->TPU payload;
    on a reused batch it is pure per-step overhead (SWEEP_r05: the point
    reconstruction is ~4 ms/step of the broadcast ceiling). Returns a new
    batch dict; bit-equal rendering (tests/test_hat_interp.py)."""
    from ..ops.hat_interp import expand_segments

    batch = dict(batch)
    for li, l in enumerate((1, 2, 3, 4)):
        expand = jax.jit(jax.vmap(
            lambda a, c, li=li, l=l: expand_segments(
                a.astype(jnp.int32), c.astype(jnp.int32),
                rows_caps[li], site_caps[l])))
        batch[f"hat_rows{l}"] = expand(
            batch[f"hat_seg_a{l}"], batch[f"hat_seg_cum{l}"])
        del batch[f"hat_seg_a{l}"], batch[f"hat_seg_cum{l}"]

    @jax.jit
    def pts_dirs(elem):
        if "z_frac" in elem:
            z = (elem["near"][:, None]
                 + (elem["far"] - elem["near"])[:, None]
                 * (elem["z_frac"].astype(jnp.float32)
                    * jnp.float32(1.0 / 65535.0)))
        else:
            z = elem["z_vals"]
        srt = elem["hat_sort"].astype(jnp.int32)
        ngrp = elem["hat_rows1"].shape[0]
        P = srt.shape[0] // ngrp
        pts = (elem["ray_o"][:, None, :]
               + elem["ray_d"][:, None, :] * z[..., None])
        wpts = pts.reshape(-1, 3)[srt].reshape(ngrp, P, 3)
        vd = elem["ray_d"]
        vd = vd / jnp.maximum(
            jnp.linalg.norm(vd, axis=-1, keepdims=True), 1e-8)
        return wpts, vd[srt // n_samples].reshape(ngrp, P, 3)

    keys = ("near", "far", "z_frac", "z_vals", "ray_o", "ray_d",
            "hat_sort", "hat_rows1")
    elems = {k: batch[k] for k in keys if k in batch}
    batch["hat_wpts"], batch["hat_vdir"] = jax.vmap(pts_dirs)(elems)
    return batch


def render_rays_hat(params, batch, settings: RenderSettings, key=None,
                    train: bool = False):
    """Training hot path: grouped hat-matmul interpolation.

    Requires the host-planned batch fields from
    ops.hat_interp.prepare_hat_batch (z_vals, hat_sort, hat_seg_a{1..4},
    hat_seg_cum{1..4}) plus settings.hat_rows_caps (the static expansion
    widths). Everything bulky is reconstructed ON DEVICE: sorted world
    points / view dirs from (ray_o, ray_d, z_vals, hat_sort), expanded row
    lists from the compact segments, and the de-sort permutation from
    hat_sort — together ~5 MB/batch less host->TPU traffic, the production
    pipeline's bottleneck (tools/probes/fresh_breakdown.py). Numerically
    equivalent to the site/dense paths at the same z samples
    (tests/test_hat_interp.py); z sampling lives on the host here, so `key`
    only feeds the raw-noise term.
    """
    s = settings
    from ..models import latent_xyzc as lx
    from ..ops.hat_interp import expand_segments, hat_interpolate, inverse_perm

    pre_expanded = "hat_rows1" in batch
    if not pre_expanded and len(s.hat_rows_caps) != 4:
        raise ValueError(
            "hat batch needs RenderSettings.hat_rows_caps (the planner's "
            "rows_caps, e.g. hat_static['rows_caps'] or the loader's "
            "hat_state['rows_caps'])")

    site_feats, new_stats = lx.encode_sparse_voxels(
        params, batch["geom"], s.model, densify=False)
    from ..models.nn_utils import mxu_dtype
    dt = mxu_dtype(s.model.encoder.compute_dtype)
    if dt == jnp.bfloat16:
        # bf16 site features halve the hat gather bytes and switch the
        # interpolation contraction to single-pass MXU matmuls
        site_feats = [x.astype(dt) for x in site_feats]

    B, R = batch["ray_o"].shape[:2]
    # the host planner is authoritative for the sample count
    n_samples = (batch["z_frac"] if "z_frac" in batch
                 else batch["z_vals"]).shape[-1]

    def render_elem(elem, feats):
        frame = {"R": elem["R"], "Th": elem["Th"], "bounds": elem["bounds"],
                 "latent_index": elem["latent_index"]}
        if pre_expanded:
            # rows pre-expanded once (HBM-resident reuse, e.g. the bench's
            # broadcast ceiling or repeated-batch eval): skip the per-step
            # expansion the compact fresh-path payload requires
            # (VERDICT r4 #3 — expansion is pure overhead on this path)
            rows = {l: elem[f"hat_rows{l}"].astype(jnp.int32)
                    for l in (1, 2, 3, 4)}
        else:
            rows = {l: expand_segments(
                        elem[f"hat_seg_a{l}"].astype(jnp.int32),
                        elem[f"hat_seg_cum{l}"].astype(jnp.int32),
                        s.hat_rows_caps[l - 1], s.model.encoder.site_caps[l])
                    for l in (1, 2, 3, 4)}
        # sorted group points/dirs from the compact plan (see docstring)
        if "z_frac" in elem:
            # u16 slab fractions -> f32 depths; matches the host planner's
            # decode_z_np bit-for-bit (ops/hat_interp.py)
            z = (elem["near"][:, None]
                 + (elem["far"] - elem["near"])[:, None]
                 * (elem["z_frac"].astype(jnp.float32)
                    * jnp.float32(1.0 / 65535.0)))                # [R, S]
        else:
            z = elem["z_vals"]                                    # [R, S]
        srt = elem["hat_sort"].astype(jnp.int32)                  # [ngrp*P]
        ngrp = rows[1].shape[0]
        P = srt.shape[0] // ngrp
        if "hat_wpts" in elem:
            # HBM-resident reuse path (pairs with hat_rows{l}): sorted
            # points/dirs precomputed once — the per-step reconstruction
            # (pts outer product + two [ngrp*P] gathers) is the measured
            # ~4 ms/step cost on repeated batches (SWEEP_r05)
            wpts = elem["hat_wpts"]
            vdir = elem["hat_vdir"]
        else:
            pts = (elem["ray_o"][:, None, :]
                   + elem["ray_d"][:, None, :] * z[..., None])
            wpts = pts.reshape(-1, 3)[srt].reshape(ngrp, P, 3)
            vd = elem["ray_d"]
            vd = vd / jnp.maximum(
                jnp.linalg.norm(vd, axis=-1, keepdims=True), 1e-8)
            vdir = vd[srt // n_samples].reshape(ngrp, P, 3)

        return _hat_finish(params, elem, feats, s, frame, rows, srt, z,
                           wpts, vdir, R, n_samples, key, train)

    elems = _batch_elems(batch)
    if B == 1:
        # reference recipe (batch_size 1): skip the vmap — the leading
        # unit dim shifts which axes land on the TPU's (8, 128) tiling
        # in every intermediate (suspected r03->r04 ceiling regression;
        # CLAUDE.md "ceiling archeology")
        ret = render_elem(
            jax.tree.map(lambda x: x[0], elems,
                         is_leaf=lambda x: not isinstance(x, dict)),
            [x[0] for x in site_feats])
        ret = jax.tree.map(lambda x: x[None], ret)
    else:
        ret = jax.vmap(render_elem, in_axes=(0, 0))(elems, site_feats)
    return ret, new_stats


def _hat_finish(params, elem, feats, s, frame, rows, srt, z, wpts, vdir,
                R, n_samples, key, train):
    """Shared hat tail: interpolate -> decode -> hull -> de-sort ->
    quadrature (single batch element; host- and device-planned paths)."""
    from ..models import latent_xyzc as lx
    from ..ops.hat_interp import hat_interpolate, inverse_perm

    ppts = lx.pts_to_can_pts(wpts, frame["R"], frame["Th"])
    dhw = lx.get_dhw_vox(ppts, frame["bounds"], s.voxel_size)
    feat = hat_interpolate(feats, elem["geom"], rows, dhw, s.model)
    raw = lx.decode_raw(params, feat, wpts, vdir, frame, s.model)
    raw = raw.reshape(-1, 4)

    if s.hull_views > 0:
        flat_pts = wpts.reshape(-1, 3)
        if s.hull_mode == "snapshot":
            inside = snapshot_hull_mask(
                flat_pts, frame, elem["R0_snap"], elem["Th0_snap"],
                elem["K"], elem["RT"][0], elem["msks"][0], s.img_hw)
        else:
            inside = hull_inside_mask(
                flat_pts, elem["Ks"], elem["RT"], elem["msks"], s.img_hw)
        raw = raw * inside[:, None]

    # de-sort: ray-layout sample i reads its first sorted occurrence
    # (one int scatter-min; ops/hat_interp.py inverse_perm)
    raw = raw[inverse_perm(srt, R * n_samples)].reshape(R, n_samples, 4)
    out = raw2outputs(
        raw, z, elem["ray_d"],
        s.raw_noise_std if train else 0.0, s.white_bkgd, noise_key=key)
    del out["weights"]
    return out


def render_rays_hat_device(params, batch, settings: RenderSettings,
                           key=None, train: bool = False):
    """Hat training path with ON-DEVICE batch planning (ops/device_plan.py).

    The batch carries only rays + supervision (ray_o/d, near/far, rgb,
    ray_mask, frame info) — ~60 KB vs the host plan's ~0.6 MB. z sampling,
    tile grouping, segment construction, and expansion all happen inside
    the jitted step from the HBM-resident geometry; the host->TPU link is
    the production fresh-path bottleneck (tools/probes/fresh_gap.py).
    Requires settings.hat_plan (a DevicePlanSpec). Renders identically to
    the site-interp path at the same z samples (tests/test_device_plan.py).

    Single-chip-oriented: the plan's global sort would all-gather under
    ray sharding; multi-chip training keeps host plans with group-sharded
    tables (parallel/mesh.py).
    """
    s = settings
    from ..models import latent_xyzc as lx
    from ..ops.device_plan import plan_hat_device
    from ..ops.ray_ops import stratified_z_vals

    spec = s.hat_plan
    site_feats, new_stats = lx.encode_sparse_voxels(
        params, batch["geom"], s.model, densify=False)
    from ..models.nn_utils import mxu_dtype
    dt = mxu_dtype(s.model.encoder.compute_dtype)
    if dt == jnp.bfloat16:
        site_feats = [x.astype(dt) for x in site_feats]

    B, R = batch["ray_o"].shape[:2]
    n_samples = s.n_samples
    perturb = train and s.perturb
    base_key = key if key is not None else jax.random.PRNGKey(0)

    def render_elem(b, elem, feats):
        frame = {"R": elem["R"], "Th": elem["Th"], "bounds": elem["bounds"],
                 "latent_index": elem["latent_index"]}
        kz, kn = jax.random.split(jax.random.fold_in(base_key, b))
        z = stratified_z_vals(elem["near"], elem["far"], n_samples,
                              key=kz, perturb=perturb)          # [R, S]
        pts = (elem["ray_o"][:, None, :]
               + elem["ray_d"][:, None, :] * z[..., None])
        pts_flat = pts.reshape(-1, 3)
        ppts = lx.pts_to_can_pts(pts_flat, frame["R"], frame["Th"])
        dhw = lx.get_dhw_vox(ppts, frame["bounds"], s.voxel_size)

        srt, rows, overflow = plan_hat_device(dhw, elem["geom"], spec)
        P = spec.group_size
        wpts = pts_flat[srt].reshape(spec.n_groups, P, 3)
        vd = elem["ray_d"]
        vd = vd / jnp.maximum(
            jnp.linalg.norm(vd, axis=-1, keepdims=True), 1e-8)
        vdir = vd[srt // n_samples].reshape(spec.n_groups, P, 3)

        out = _hat_finish(params, elem, feats, s, frame, rows, srt, z,
                          wpts, vdir, R, n_samples, kn, train)
        out["plan_overflow"] = overflow
        return out

    ret = jax.vmap(render_elem, in_axes=(0, 0, 0))(
        jnp.arange(B), _batch_elems(batch), site_feats)
    return ret, new_stats


def render_rays(params, batch, settings: RenderSettings, key=None,
                train: bool = False):
    """Render all rays in a batch.

    Args:
      params: model params pytree.
      batch: dict with geom arrays plus ray_o/ray_d/near/far [B, R, .],
        R/Th/bounds/latent_index, optional Ks/RT/msks for hull culling.
        R (ray count) must be a multiple of settings.chunk_rays, padded with
        ray_mask=0 entries.
      settings: static RenderSettings.
      key: PRNG key for stratified perturb (train).
      train: stratified perturbation on/off (ref trains with perturb=1,
        evaluates with perturb=0; run.py:50).

    Returns:
      (ret, new_bn_stats): ret has rgb_map [B,R,3], disp/acc/depth [B,R],
      weights [B,R,S].
    """
    s = settings
    if "hat_sort" in batch:
        return render_rays_hat(params, batch, settings, key=key, train=train)
    if train and s.hat_plan is not None:
        # rays-only batch + DevicePlanSpec: plan on device
        return render_rays_hat_device(params, batch, settings, key=key,
                                      train=train)
    ray_o, ray_d = batch["ray_o"], batch["ray_d"]
    B, R = ray_o.shape[:2]

    volumes, new_stats = latent_xyzc.encode_sparse_voxels(
        params, batch["geom"], s.model, densify=not s.site_interp
    )
    from ..models import sparse_conv_net
    ivols = (sparse_conv_net.index_volumes(batch["geom"], s.model.encoder)
             if s.site_interp else None)

    chunk = min(s.chunk_rays, R)
    if R % chunk != 0:
        raise ValueError(
            f"ray count {R} must be a multiple of chunk_rays {chunk}")
    nc = R // chunk
    ck = (jax.random.split(key, nc) if key is not None
          else jnp.zeros((nc, 2), jnp.uint32))

    def render_elem(elem, vols, iv):
        frame = {"R": elem["R"], "Th": elem["Th"], "bounds": elem["bounds"],
                 "latent_index": elem["latent_index"]}

        def render_chunk(chunk_in):
            ro, rd, near, far, k = chunk_in
            pts, z_vals = sample_along_rays(
                ro, rd, near, far, s.n_samples, key=k,
                perturb=(s.perturb and train),
            )
            # padded rays have rd=0; clamp to avoid NaN propagation
            viewdir = rd / jnp.maximum(
                jnp.linalg.norm(rd, axis=-1, keepdims=True), 1e-8)
            n_ray = ro.shape[0]
            wpts = pts.reshape(n_ray * s.n_samples, 3)
            vdir = jnp.repeat(viewdir, s.n_samples, axis=0)

            raw = latent_xyzc.calculate_density_color(
                params, wpts, vdir, vols, frame, s.model, s.voxel_size,
                index_vols=iv,
            )

            if s.hull_views > 0:
                if s.hull_mode == "snapshot":
                    inside = snapshot_hull_mask(
                        wpts, frame, elem["R0_snap"], elem["Th0_snap"],
                        elem["K"], elem["RT"][0], elem["msks"][0], s.img_hw)
                else:
                    inside = hull_inside_mask(
                        wpts, elem["Ks"], elem["RT"], elem["msks"], s.img_hw)
                raw = raw * inside[:, None]

            raw = raw.reshape(n_ray, s.n_samples, 4)
            out = raw2outputs(
                raw, z_vals, rd, s.raw_noise_std if train else 0.0,
                s.white_bkgd,
                noise_key=k,
            )
            del out["weights"]  # [R,S] map is bulky; recompute if needed
            return out

        chunks = (
            elem["ray_o"].reshape(nc, chunk, 3),
            elem["ray_d"].reshape(nc, chunk, 3),
            elem["near"].reshape(nc, chunk),
            elem["far"].reshape(nc, chunk),
            ck,
        )
        if nc == 1:
            return render_chunk(jax.tree.map(lambda x: x[0], chunks))
        out = jax.lax.map(render_chunk, chunks)
        return jax.tree.map(lambda x: x.reshape(R, *x.shape[2:]), out)

    ret = jax.vmap(render_elem, in_axes=(0, 0, 0))(
        _batch_elems(batch), volumes, ivols)
    return ret, new_stats


def render_density_grid(params, batch, settings: RenderSettings,
                        pt_chunk: int = 2048 * 64):
    """Evaluate density at a padded dense point grid (mesh extraction path).

    batch['pts'] is [B, P, 3] (P a multiple of pt_chunk, padded). Returns
    alpha [B, P] (ref: if_mesh_renderer.py:26-39).
    """
    s = settings
    volumes, _ = latent_xyzc.encode_sparse_voxels(
        params, batch["geom"], s.model
    )
    B, P = batch["pts"].shape[:2]

    outs = []
    for b in range(B):
        vols_b = [v[b] for v in volumes]
        frame = _frame_info(batch, b)

        def density_chunk(pts):
            return latent_xyzc.calculate_density(
                params, pts, vols_b, frame, s.model, s.voxel_size
            )[:, 0]

        nc = P // pt_chunk
        pts = batch["pts"][b].reshape(nc, pt_chunk, 3)
        alpha = (density_chunk(pts[0]) if nc == 1
                 else jax.lax.map(density_chunk, pts).reshape(P))
        outs.append(alpha.reshape(P))
    return jnp.stack(outs)


# ---------------------------------------------------------------------------
# registered renderer factories (config-driven harness entry points)
# ---------------------------------------------------------------------------

def _base_settings(cfg, model_static, **over):
    kw = dict(
        model=model_static,
        voxel_size=tuple(cfg.voxel_size),
        n_samples=cfg.N_samples,
        perturb=bool(cfg.perturb),
        white_bkgd=bool(cfg.white_bkgd),
        raw_noise_std=float(cfg.raw_noise_std),
        chunk_rays=int(cfg.tpu.chunk_rays),
        img_hw=(int(cfg.H * cfg.ratio), int(cfg.W * cfg.ratio)),
    )
    kw.update(over)
    return RenderSettings(**kw)


@register("renderer", "if_clight_renderer")
def make_clight(cfg, model_static):
    return _base_settings(cfg, model_static)


@register("renderer", "if_clight_renderer_mmsk")
def make_clight_mmsk(cfg, model_static):
    return _base_settings(cfg, model_static,
                          hull_views=len(cfg.training_view))


@register("renderer", "if_clight_renderer_msk")
def make_clight_msk(cfg, model_static):
    return _base_settings(cfg, model_static, hull_views=1,
                          hull_mode="snapshot")


@register("renderer", "if_mesh_renderer")
def make_mesh(cfg, model_static):
    return _base_settings(cfg, model_static)
