"""NeRF-baseline volume renderer with hierarchical importance sampling.

TPU-native version of the reference volume renderer (ref: lib/networks/
renderer/volume_renderer.py:10-156): coarse stratified pass, inverse-CDF
importance resampling (sample_pdf replaces the torchsearchsorted CUDA
extension), fine pass, coarse outputs kept as rgb0/disp0/acc0 for the
auxiliary loss (ref: lib/train/trainers/nerf.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import register
from ..models import nerf
from ..ops.compositing import raw2outputs
from ..ops.ray_ops import stratified_z_vals
from ..ops.sample_pdf import sample_pdf


class NerfRenderSettings(NamedTuple):
    model: nerf.NerfStatic
    model_fine: nerf.NerfStatic | None = None
    n_samples: int = 64
    n_importance: int = 128
    perturb: bool = True
    lindisp: bool = False
    white_bkgd: bool = False
    raw_noise_std: float = 0.0
    chunk_rays: int = 1024 * 32


def render_nerf_rays(params, batch, settings: NerfRenderSettings, key=None,
                     train: bool = False):
    """batch: ray_o/ray_d/near/far [B, R(,1)]; returns coarse+fine maps."""
    s = settings
    ray_o, ray_d = batch["ray_o"], batch["ray_d"]
    B, R = ray_o.shape[:2]

    def render_chunk(chunk):
        ro, rd, near, far, ck = chunk
        k_strat, k_pdf, k_noise = (
            jax.random.split(ck, 3) if key is not None else (None,) * 3)
        viewdirs = rd / jnp.maximum(
            jnp.linalg.norm(rd, axis=-1, keepdims=True), 1e-8)

        z_vals = stratified_z_vals(
            near, far, s.n_samples, key=k_strat,
            perturb=(s.perturb and train), lindisp=s.lindisp)
        pts = ro[:, None] + rd[:, None] * z_vals[..., None]
        n_ray = ro.shape[0]

        def decode(pts, z_vals, model_params, model_static):
            S = pts.shape[1]
            raw = nerf.apply_mlp(
                model_params,
                pts.reshape(n_ray * S, 3),
                jnp.repeat(viewdirs, S, axis=0),
                model_static,
            ).reshape(n_ray, S, 4)
            return raw2outputs(
                raw, z_vals, rd, s.raw_noise_std if train else 0.0,
                s.white_bkgd, noise_key=k_noise)

        out = decode(pts, z_vals, params["coarse"], s.model)

        if s.n_importance > 0:
            coarse = {"rgb0": out["rgb_map"], "disp0": out["disp_map"],
                      "acc0": out["acc_map"]}
            z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
            z_samples = sample_pdf(
                z_mid, out["weights"][..., 1:-1], s.n_importance,
                key=k_pdf, det=(not (s.perturb and train)))
            z_samples = jax.lax.stop_gradient(z_samples)
            z_all = jnp.sort(
                jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
            pts = ro[:, None] + rd[:, None] * z_all[..., None]
            out = decode(pts, z_all,
                         params.get("fine", params["coarse"]),
                         s.model_fine or s.model)
            out.update(coarse)
            out["z_std"] = jnp.std(z_samples, axis=-1)

        del out["weights"]
        return out

    chunk = min(s.chunk_rays, R)
    if R % chunk != 0:
        raise ValueError(f"ray count {R} not a multiple of {chunk}")
    nc = R // chunk

    rets = []
    for b in range(B):
        ck = (jax.random.split(jax.random.fold_in(key, b), nc)
              if key is not None else jnp.zeros((nc, 2), jnp.uint32))
        chunks = (
            ray_o[b].reshape(nc, chunk, 3),
            ray_d[b].reshape(nc, chunk, 3),
            batch["near"][b].reshape(nc, chunk),
            batch["far"][b].reshape(nc, chunk),
            ck,
        )
        if nc == 1:
            out = render_chunk(jax.tree.map(lambda x: x[0], chunks))
            out = jax.tree.map(lambda x: x[None], out)
        else:
            out = jax.lax.map(render_chunk, chunks)
        rets.append(jax.tree.map(lambda x: x.reshape(R, *x.shape[2:]), out))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *rets), {}


def render_nerf_density_grid(params, batch, settings: NerfRenderSettings,
                             pt_chunk: int = 2048 * 64):
    """Evaluate NeRF density at a padded dense point grid (nerf mesh path;
    ref: lib/networks/renderer/volume_mesh_renderer.py:84-107 evaluates
    alpha at inside-hull points in cfg.chunk batches). batch['pts'] is
    [B, P, 3]; returns alpha [B, P] from the coarse trunk."""
    s = settings
    B, P = batch["pts"].shape[:2]

    outs = []
    for b in range(B):
        def density_chunk(pts):
            return nerf.apply_density(params["coarse"], pts, s.model)

        chunk = min(pt_chunk, P)
        nc = P // chunk
        pts = batch["pts"][b].reshape(nc, chunk, 3)
        alpha = (density_chunk(pts[0]) if nc == 1
                 else jax.lax.map(density_chunk, pts).reshape(P))
        outs.append(alpha.reshape(P))
    return jnp.stack(outs)


@register("renderer", "volume_mesh_renderer")
def make_volume_mesh_renderer(cfg, model_static):
    st = nerf.NerfStatic(depth=cfg.netdepth, width=cfg.netwidth,
                         xyz_res=cfg.xyz_res, view_res=cfg.view_res)
    return NerfRenderSettings(
        model=st, n_samples=cfg.N_samples, n_importance=cfg.N_importance,
        perturb=False, white_bkgd=bool(cfg.white_bkgd),
        chunk_rays=int(cfg.tpu.chunk_rays))


@register("renderer", "volume_renderer")
def make_volume_renderer(cfg, model_static):
    st = nerf.NerfStatic(depth=cfg.netdepth, width=cfg.netwidth,
                         xyz_res=cfg.xyz_res, view_res=cfg.view_res)
    st_fine = nerf.NerfStatic(depth=cfg.netdepth_fine,
                              width=cfg.netwidth_fine,
                              xyz_res=cfg.xyz_res, view_res=cfg.view_res)
    return NerfRenderSettings(
        model=st, model_fine=st_fine,
        n_samples=cfg.N_samples, n_importance=cfg.N_importance,
        perturb=bool(cfg.perturb), lindisp=bool(cfg.lindisp),
        white_bkgd=bool(cfg.white_bkgd),
        raw_noise_std=float(cfg.raw_noise_std),
        chunk_rays=int(cfg.tpu.chunk_rays))
