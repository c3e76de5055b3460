"""T-pose variant tests: blend utils, double-grid-sample path, training."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import torch
import torch.nn.functional as F

from neuralbody_tpu.models import tpose_xyzc
from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
from neuralbody_tpu.models.tpose_xyzc import TposeStatic
from neuralbody_tpu.ops.blend import (
    bounds_grid_sample_blend_weights, ppts_to_pts, pts_to_ppts,
)
from neuralbody_tpu.ops.sparse_conv import build_frame_geometry, compute_site_caps
from neuralbody_tpu.renderer.tpose_renderer import (
    TposeRenderSettings, render_tpose_rays,
)
from neuralbody_tpu.utils import smpl


class TestBlendUtils:
    def test_border_grid_sample_matches_torch(self, rng):
        X, Y, Z, J = 5, 6, 7, 4
        bw = rng.rand(X, Y, Z, J).astype(np.float32)
        bounds = np.array([[-1.0, -1, -1], [1, 1, 1]], np.float32)
        pts = rng.uniform(-1.5, 1.5, (40, 3)).astype(np.float32)

        ours = np.asarray(bounds_grid_sample_blend_weights(
            jnp.array(pts), jnp.array(bw), jnp.array(bounds)))

        # torch oracle, reference formula (blend_utils.py:29-51)
        tb = torch.from_numpy(bw).permute(3, 0, 1, 2)[None]
        gc = (torch.from_numpy(pts) - torch.from_numpy(bounds[0])) / \
            torch.from_numpy(bounds[1] - bounds[0]) * 2 - 1
        gc = gc[..., [2, 1, 0]][None, None, None]
        ref = F.grid_sample(tb, gc, padding_mode="border",
                            align_corners=True)[0, :, 0, 0].T.numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_ppts_roundtrip(self, rng):
        """pose->tpose then tpose->pose with one-hot weights is identity."""
        model = smpl.make_synthetic_model(n_verts=50, n_joints=5, seed=3)
        poses = (rng.randn(5, 3) * 0.4).astype(np.float32)
        rot = smpl.rodrigues(jnp.asarray(poses))
        joints = model["J_regressor"] @ model["v_template"]
        _, A = smpl.rigid_transform(rot, jnp.asarray(joints),
                                    model["parents"])
        pts = rng.randn(30, 3).astype(np.float32)
        # one-hot blend weights -> exact rigid inverse
        bw = np.zeros((30, 5), np.float32)
        bw[np.arange(30), rng.randint(0, 5, 30)] = 1.0

        back = pts_to_ppts(
            ppts_to_pts(jnp.array(pts), jnp.array(bw), A),
            jnp.array(bw), A)
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)

    def test_tpose_verts_recovered(self, rng):
        """Skinned vertices warped back with their own weights recover the
        template (the core T-pose invariant)."""
        model = smpl.make_synthetic_model(n_verts=80, n_joints=5, seed=4)
        # near-one-hot weights: LBS inverse is only exact for rigid points
        w = model["weights"] ** 8
        model = {**model, "weights": w / w.sum(1, keepdims=True)}
        poses = (rng.randn(5, 3) * 0.2).astype(np.float32)
        pverts, _ = smpl.lbs(model, jnp.asarray(poses.ravel()), jnp.zeros(10))
        rot = smpl.rodrigues(jnp.asarray(poses))
        joints = model["J_regressor"] @ model["v_template"]
        _, A = smpl.rigid_transform(rot, jnp.asarray(joints),
                                    model["parents"])
        back = ppts_to_pts(pverts, jnp.asarray(model["weights"]), A)
        err = np.abs(np.asarray(back) - model["v_template"]).max()
        assert err < 0.05, err


def _tpose_scene(rng):
    """Synthetic T-pose scene: codes in T-pose grid, identity warp."""
    from neuralbody_tpu.utils.synthetic import ellipsoid_vertices

    tverts = ellipsoid_vertices(300, radii=(0.3, 0.8, 0.15), seed=9)
    vs = 0.04
    tb = np.stack([tverts.min(0) - 0.05, tverts.max(0) + 0.05])
    coord = np.round(
        (tverts - tb[0]) / vs).astype(np.int32)  # xyz order
    out_sh = ((np.ceil((tb[1] - tb[0]) / vs).astype(np.int64)) | 31) + 1
    out_sh = tuple(int(s) for s in out_sh)
    caps = compute_site_caps([coord], out_sh)
    geom = build_frame_geometry(coord, out_sh, caps)

    # posed == T-pose (identity warp): the posed grid stores its own coords
    ptot_shape = (8, 12, 8)
    pb = tb.copy()
    axes = [np.linspace(pb[0, a], pb[1, a], ptot_shape[a]) for a in range(3)]
    ptot = np.stack(np.meshgrid(*axes, indexing="ij"), -1).astype(np.float32)

    n_rays = 64
    center = tverts.mean(0)
    phis = rng.uniform(0, 2 * np.pi, n_rays)
    cam = center + np.stack(
        [2.5 * np.cos(phis), rng.uniform(-0.3, 0.3, n_rays),
         2.5 * np.sin(phis)], 1).astype(np.float32)
    tgt = center + rng.uniform(-0.2, 0.2, (n_rays, 3)).astype(np.float32)
    rd = tgt - cam
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    dist = np.linalg.norm(center - cam, axis=1)

    batch = {
        "geom": {k: v[None] for k, v in geom.items()},
        "ray_o": cam[None], "ray_d": rd[None].astype(np.float32),
        "near": (dist - 1.0)[None].astype(np.float32),
        "far": (dist + 1.0)[None].astype(np.float32),
        "rgb": rng.rand(1, n_rays, 3).astype(np.float32),
        "ray_mask": np.ones((1, n_rays), np.float32),
        "R": np.eye(3, dtype=np.float32)[None],
        "Th": np.zeros((1, 1, 3), np.float32),
        "tbounds": tb[None].astype(np.float32),
        "pbounds": pb[None].astype(np.float32),
        "ptot_pts": ptot.reshape(1, -1, 3),
        "latent_index": np.zeros(1, np.int32),
    }
    static = TposeStatic(
        encoder=EncoderStatic(out_sh=out_sh, site_caps=tuple(caps)),
        ptot_shape=ptot_shape)
    # ptot voxel sizes span the grid exactly
    ptot_vsize = tuple(
        float((pb[1, a] - pb[0, a]) / ptot_shape[a]) for a in range(3))
    settings = TposeRenderSettings(
        model=static, voxel_size=(vs,) * 3, ptot_vsize=ptot_vsize,
        n_samples=8, chunk_rays=64)
    return jax.tree.map(jnp.asarray, batch), settings


class TestTposeRenderer:
    def test_render_and_train(self, rng):
        batch, settings = _tpose_scene(rng)
        params, bn = tpose_xyzc.init(
            jax.random.PRNGKey(0), num_train_frame=2, nv=300)
        # ensure live density at this tiny sample count (the relu-alpha gate
        # kills gradients when every sampled sigma is negative at init; real
        # runs use 65k samples/step where some are always positive)
        params["alpha_fc"]["b"] = params["alpha_fc"]["b"] + 0.3

        ret, _ = render_tpose_rays(params, batch, settings,
                                   key=jax.random.PRNGKey(1), train=True)
        assert ret["rgb_map"].shape == (1, 64, 3)
        assert np.isfinite(np.asarray(ret["rgb_map"])).all()

        # a few training steps reduce the loss
        tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, key):
            def loss_fn(p):
                r, _ = render_tpose_rays(p, batch, settings, key=key,
                                         train=True)
                return jnp.mean((r["rgb_map"] - batch["rgb"]) ** 2)
            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt, loss

        key = jax.random.PRNGKey(5)
        losses = []
        for _ in range(20):
            key, sub = jax.random.split(key)
            params, opt, loss = step(params, opt, sub)
            losses.append(float(loss))
        assert losses[-1] < losses[0] and np.isfinite(losses).all(), losses
