"""On-device hat planning (ops/device_plan.py) equivalence contract.

The device plan is a partition of ray samples into groups; after the
de-sort any valid plan renders identically, so the contract is stated
against the site-interp path at the same (deterministic) z samples —
the same contract the host planner satisfies (tests/test_hat_interp.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralbody_tpu.models import latent_xyzc
from neuralbody_tpu.models.latent_xyzc import ModelStatic
from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
from neuralbody_tpu.ops.device_plan import DevicePlanSpec, plan_hat_device
from neuralbody_tpu.renderer.renderer import RenderSettings, render_rays
from neuralbody_tpu.utils.synthetic import make_batch

VOX = 0.02
N_RAYS = 64
N_SAMPLES = 8
GROUP = 32


@pytest.fixture(scope="module")
def scene():
    # host-planned batch only to DERIVE the static caps (what the loader
    # does on batch 0); the device-planned batch carries no hat fields
    hat_np, static = make_batch(
        n_rays=N_RAYS, n_verts=512, voxel_size=VOX, seed=3,
        hat=True, n_samples=N_SAMPLES, hat_perturb=False,
        hat_static=dict(group_size=GROUP))
    base_np, _ = make_batch(n_rays=N_RAYS, n_verts=512, voxel_size=VOX,
                            seed=3)
    hs = static["hat"]
    spec = DevicePlanSpec(
        out_sh=static["out_sh"], site_caps=tuple(static["site_caps"]),
        group_size=GROUP, tile=(4, 8), n_groups=hs["n_groups"],
        rows_caps=tuple(hs["rows_caps"]), seg_caps=tuple(hs["seg_caps"]))
    ms = ModelStatic(encoder=EncoderStatic(
        out_sh=static["out_sh"], site_caps=static["site_caps"]))
    params, _ = latent_xyzc.init(jax.random.PRNGKey(0), num_train_frame=4,
                                 nv=512)
    return base_np, hat_np, static, spec, ms, params


def test_device_plan_matches_host_plan(scene):
    """Same dhw -> same perm/rows as the numpy planner (stable sort +
    identical segment arithmetic)."""
    base_np, hat_np, static, spec, ms, params = scene
    from neuralbody_tpu.ops import hat_interp

    # reproduce the host planner's dhw for element 0 (z from the batch)
    wpts, _ = hat_interp.sorted_pts_np(hat_np, 0, N_SAMPLES)
    # instead: rebuild dhw directly from the batch rays + z
    z = hat_np["z_vals"][0]
    pts = (hat_np["ray_o"][0][:, None, :]
           + hat_np["ray_d"][0][:, None, :] * z[..., None]).reshape(-1, 3)
    Rm, Th = hat_np["R"][0], hat_np["Th"][0].reshape(1, 3)
    ppts = (pts - Th) @ Rm
    dhw = (ppts[:, [2, 1, 0]]
           - hat_np["bounds"][0][0][[2, 1, 0]]) / np.float32(VOX)

    geom0 = {k: jnp.asarray(v[0]) for k, v in hat_np["geom"].items()}
    perm, rows, overflow = jax.jit(
        plan_hat_device, static_argnames=("spec",))(
        jnp.asarray(dhw.astype(np.float32)), geom0, spec)
    assert float(overflow) == 0.0

    host = hat_interp.plan_hat_groups(
        dhw.astype(np.float32), {k: np.asarray(v[0])
                                 for k, v in hat_np["geom"].items()},
        static["out_sh"], static["site_caps"], group_size=GROUP,
        rows_caps=spec.rows_caps, n_groups=spec.n_groups,
        seg_caps=spec.seg_caps)
    np.testing.assert_array_equal(np.asarray(perm), host["perm"])
    for li, l in enumerate((1, 2, 3, 4)):
        want = hat_interp.expand_segments_np(
            host[f"seg_a{l}"], host[f"seg_cum{l}"], spec.rows_caps[li],
            static["site_caps"][l])
        np.testing.assert_array_equal(np.asarray(rows[l]), want)


def test_device_planned_render_matches_site(scene):
    base_np, hat_np, static, spec, ms, params = scene
    s_site = RenderSettings(model=ms, voxel_size=(VOX,) * 3,
                            n_samples=N_SAMPLES, chunk_rays=N_RAYS,
                            site_interp=True, perturb=False)
    s_dev = s_site._replace(hat_plan=spec,
                            hat_rows_caps=spec.rows_caps)
    batch = jax.tree.map(jnp.asarray, base_np)

    ret_site, _ = render_rays(params, batch, s_site, key=None, train=True)
    ret_dev, _ = render_rays(params, batch, s_dev,
                             key=jax.random.PRNGKey(7), train=True)
    assert float(ret_dev["plan_overflow"].max()) == 0.0
    np.testing.assert_allclose(np.asarray(ret_dev["rgb_map"]),
                               np.asarray(ret_site["rgb_map"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret_dev["acc_map"]),
                               np.asarray(ret_site["acc_map"]),
                               rtol=1e-4, atol=1e-5)


def test_overflow_flag_fires_on_tight_caps(scene):
    base_np, hat_np, static, spec, ms, params = scene
    from neuralbody_tpu.ops import hat_interp

    z = hat_np["z_vals"][0]
    pts = (hat_np["ray_o"][0][:, None, :]
           + hat_np["ray_d"][0][:, None, :] * z[..., None]).reshape(-1, 3)
    Rm, Th = hat_np["R"][0], hat_np["Th"][0].reshape(1, 3)
    ppts = (pts - Th) @ Rm
    dhw = jnp.asarray(((ppts[:, [2, 1, 0]]
                        - hat_np["bounds"][0][0][[2, 1, 0]])
                       / np.float32(VOX)).astype(np.float32))
    geom0 = {k: jnp.asarray(v[0]) for k, v in hat_np["geom"].items()}

    tight = spec._replace(rows_caps=(8, 8, 8, 8))
    _, _, overflow = jax.jit(plan_hat_device,
                             static_argnames=("spec",))(dhw, geom0, tight)
    assert float(overflow) == 1.0


def test_searchsorted_fallback_matches_rowcum(scene):
    """Pre-rowcum cached geometry (no rowcum{l} keys) takes the binary-
    search fallback and must produce the identical plan."""
    base_np, hat_np, static, spec, ms, params = scene

    z = hat_np["z_vals"][0]
    pts = (hat_np["ray_o"][0][:, None, :]
           + hat_np["ray_d"][0][:, None, :] * z[..., None]).reshape(-1, 3)
    Rm, Th = hat_np["R"][0], hat_np["Th"][0].reshape(1, 3)
    ppts = (pts - Th) @ Rm
    dhw = jnp.asarray(((ppts[:, [2, 1, 0]]
                        - hat_np["bounds"][0][0][[2, 1, 0]])
                       / np.float32(VOX)).astype(np.float32))
    geom0 = {k: jnp.asarray(v[0]) for k, v in hat_np["geom"].items()}
    legacy = {k: v for k, v in geom0.items()
              if not k.startswith("rowcum")}

    jit_plan = jax.jit(plan_hat_device, static_argnames=("spec",))
    p1, r1, o1 = jit_plan(dhw, geom0, spec)
    p2, r2, o2 = jit_plan(dhw, legacy, spec)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    for l in (1, 2, 3, 4):
        np.testing.assert_array_equal(np.asarray(r1[l]), np.asarray(r2[l]))
