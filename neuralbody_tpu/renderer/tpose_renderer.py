"""Renderer for the T-pose variant.

TPU-native version of the reference tpose renderer (ref: lib/networks/
renderer/tpose_renderer.py:7-174): sample rays, transform to the posed SMPL
frame, build the two grid-coordinate sets (posed-grid -> T-pose volume;
ray-points -> warped posed volume), decode, composite. The warped posed
volumes are built ONCE per frame (they depend only on ptot_pts), then every
ray chunk samples them — same factoring the reference gets from computing
tgrid_coords outside the chunk loop.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import register
from ..models import tpose_xyzc
from ..ops.compositing import raw2outputs
from ..ops.ray_ops import sample_along_rays


class TposeRenderSettings(NamedTuple):
    model: tpose_xyzc.TposeStatic
    voxel_size: tuple = (0.005, 0.005, 0.005)
    ptot_vsize: tuple = (0.02, 0.02, 0.02)
    n_samples: int = 64
    perturb: bool = True
    white_bkgd: bool = False
    raw_noise_std: float = 0.0
    chunk_rays: int = 2048


def tpose_grid_coords(pts_xyz, bounds, voxel_size, out_sh):
    """xyz points -> normalized coords into the T-pose volume (zyx order),
    dividing by out_sh per the reference quirk (tpose_renderer.py:73-83)."""
    gc = (pts_xyz - bounds[0]) / jnp.asarray(voxel_size, pts_xyz.dtype)
    gc = gc / jnp.asarray(out_sh, pts_xyz.dtype) * 2.0 - 1.0
    return gc[..., ::-1]


def render_tpose_rays(params, batch, settings: TposeRenderSettings, key=None,
                      train: bool = False):
    """batch: geom (T-pose tables), ray_o/ray_d/near/far, R/Th,
    tbounds/pbounds [B,2,3], ptot_pts [B, X*Y*Z, 3] (posed grid's T-pose
    coords), latent_index."""
    s = settings
    ray_o, ray_d = batch["ray_o"], batch["ray_d"]
    B, R = ray_o.shape[:2]

    volumes, new_stats = tpose_xyzc.encode_tpose_voxels(
        params, batch["geom"], s.model)

    rets = []
    for b in range(B):
        vols_b = [v[b] for v in volumes]

        # warped posed-space feature volumes, once per frame
        tgc = tpose_grid_coords(
            batch["ptot_pts"][b], batch["tbounds"][b], s.voxel_size,
            s.model.encoder.out_sh)
        warped = tpose_xyzc.warp_volumes(vols_b, tgc, s.model.ptot_shape)

        ptot_sh = jnp.asarray(s.model.ptot_shape, ray_o.dtype)

        def render_chunk(chunk):
            ro, rd, near, far, ck = chunk
            pts, z_vals = sample_along_rays(
                ro, rd, near, far, s.n_samples, key=ck,
                perturb=(s.perturb and train))
            viewdir = rd / jnp.maximum(
                jnp.linalg.norm(rd, axis=-1, keepdims=True), 1e-8)
            n_ray = ro.shape[0]
            wpts = pts.reshape(n_ray * s.n_samples, 3)
            vdir = jnp.repeat(viewdir, s.n_samples, axis=0)

            # world -> posed SMPL frame
            ppts = jnp.matmul(
                wpts - jnp.reshape(batch["Th"][b], (1, 3)), batch["R"][b])
            # posed coords -> warped-volume grid coords (zyx)
            pgc = (ppts - batch["pbounds"][b][0]) / jnp.asarray(
                s.ptot_vsize, ppts.dtype)
            pgc = pgc / ptot_sh * 2.0 - 1.0
            pgc = pgc[..., ::-1]

            feat = tpose_xyzc.sample_warped(warped, pgc)
            raw = tpose_xyzc.decode(
                params, feat, wpts, vdir, batch["latent_index"][b], s.model)

            raw = raw.reshape(n_ray, s.n_samples, 4)
            out = raw2outputs(
                raw, z_vals, rd, s.raw_noise_std if train else 0.0,
                s.white_bkgd, noise_key=ck)
            del out["weights"]
            return out

        chunk = min(s.chunk_rays, R)
        if R % chunk != 0:
            raise ValueError(f"ray count {R} not a multiple of {chunk}")
        nc = R // chunk
        ck = (jax.random.split(jax.random.fold_in(key, b), nc)
              if key is not None else jnp.zeros((nc, 2), jnp.uint32))
        chunks = (
            ray_o[b].reshape(nc, chunk, 3),
            ray_d[b].reshape(nc, chunk, 3),
            batch["near"][b].reshape(nc, chunk),
            batch["far"][b].reshape(nc, chunk),
            ck,
        )
        out = (render_chunk(jax.tree.map(lambda x: x[0], chunks))
               if nc == 1 else jax.lax.map(render_chunk, chunks))
        if nc == 1:
            out = jax.tree.map(lambda x: x[None], out)
        rets.append(jax.tree.map(lambda x: x.reshape(R, *x.shape[2:]), out))

    return jax.tree.map(lambda *xs: jnp.stack(xs), *rets), new_stats


@register("renderer", "tpose_renderer")
def make_tpose_renderer(cfg, model_static):
    return TposeRenderSettings(
        model=model_static,
        voxel_size=tuple(cfg.voxel_size),
        ptot_vsize=tuple(cfg.get("ptot_vsize", [0.02, 0.02, 0.02])),
        n_samples=cfg.N_samples,
        perturb=bool(cfg.perturb),
        white_bkgd=bool(cfg.white_bkgd),
        raw_noise_std=float(cfg.raw_noise_std),
        chunk_rays=int(cfg.tpu.chunk_rays))
