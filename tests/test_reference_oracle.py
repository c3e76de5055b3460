"""Parity against the REFERENCE'S OWN CODE (VERDICT r4 #4).

Every other parity test in this suite checks our math against torch oracles
re-implemented inside the tests — an independent oracle can share a bug
with the implementation. Here we import the reference's actual modules
(`/root/reference/lib/networks/latent_xyzc.py`, `renderer/nerf_net_utils.py`)
on CPU torch — with `spconv` / `torchsearchsorted` stubbed out, since the
decode / quadrature / importance-sampling paths never touch their kernels —
transplant the reference Network's randomly-initialized weights into our
params, and assert bit-level-close agreement on shared random inputs.

Covers: calculate_density_color + calculate_density (ref latent_xyzc.py:
74-126, incl. the /out_sh grid normalization quirk), raw2outputs (ref
nerf_net_utils.py:6-51), sample_pdf det path (ref nerf_net_utils.py:55-90).
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest
import torch

REF_NET = "/root/reference/lib/networks"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{REF_NET}/latent_xyzc.py"),
    reason="reference checkout not available")

VOXEL = [0.02, 0.02, 0.02]
OUT_SH = (32, 32, 32)
NUM_FRAMES = 4


def _load_reference():
    """Import the reference network modules with their heavy deps stubbed."""
    import torch.nn as nn

    # lib.config.cfg: module-level attrs the reference modules read
    cfg = types.SimpleNamespace(
        xyz_res=10, view_res=4, i_embed=0, num_train_frame=NUM_FRAMES,
        voxel_size=VOXEL)
    lib = types.ModuleType("lib")
    lib_config = types.ModuleType("lib.config")
    lib_config.cfg = cfg
    lib.config = lib_config

    # spconv: only the module CLASSES are constructed (Network.__init__);
    # the decode path never runs them.
    class _NoopModule(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    spconv = types.ModuleType("spconv")
    spconv.SubMConv3d = _NoopModule
    spconv.SparseConv3d = _NoopModule
    spconv.SparseConvTensor = _NoopModule
    spconv.SparseSequential = nn.Sequential

    # torchsearchsorted: the CUDA ext the reference imports inside
    # sample_pdf; torch.searchsorted has identical semantics on CPU.
    tss = types.ModuleType("torchsearchsorted")
    tss.searchsorted = lambda a, v, side="right": torch.searchsorted(
        a, v, right=(side == "right"))

    # torchsearchsorted stays installed: the reference imports it lazily
    # INSIDE sample_pdf, at call time (nerf_net_utils.py:56). No real
    # package of that name exists in this env, so nothing is shadowed.
    sys.modules["torchsearchsorted"] = tss
    saved = {k: sys.modules.get(k) for k in ("lib", "lib.config", "spconv")}
    sys.modules.update({"lib": lib, "lib.config": lib_config,
                        "spconv": spconv})
    try:
        pkg = types.ModuleType("refnet")
        pkg.__path__ = [REF_NET]
        sys.modules["refnet"] = pkg
        for name, fname in [("embedder", "embedder.py"),
                            ("latent_xyzc", "latent_xyzc.py")]:
            spec = importlib.util.spec_from_file_location(
                f"refnet.{name}", os.path.join(REF_NET, fname))
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"refnet.{name}"] = mod
            spec.loader.exec_module(mod)
        spec = importlib.util.spec_from_file_location(
            "refnet.nerf_net_utils",
            os.path.join(REF_NET, "renderer", "nerf_net_utils.py"))
        nnu = importlib.util.module_from_spec(spec)
        sys.modules["refnet.nerf_net_utils"] = nnu
        spec.loader.exec_module(nnu)
        return sys.modules["refnet.latent_xyzc"], nnu
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


@pytest.fixture(scope="module")
def ref():
    ref_lx, ref_nnu = _load_reference()
    torch.manual_seed(7)
    net = ref_lx.Network().eval()
    return types.SimpleNamespace(lx=ref_lx, nnu=ref_nnu, net=net)


@pytest.fixture(scope="module")
def ours(ref):
    """Our params with the reference Network's decode weights transplanted."""
    import jax

    from neuralbody_tpu.models import latent_xyzc, sparse_conv_net

    params, _ = latent_xyzc.init(jax.random.PRNGKey(0),
                                 num_train_frame=NUM_FRAMES)
    state = {k: v.detach().numpy() for k, v in ref.net.state_dict().items()}
    params["vertex_code"] = np.asarray(state["c.weight"])
    params["frame_latent"] = np.asarray(state["latent.weight"])
    for head in ("fc_0", "fc_1", "fc_2", "alpha_fc", "feature_fc",
                 "latent_fc", "view_fc", "rgb_fc"):
        params[head] = {"w": state[f"{head}.weight"][:, :, 0].T,
                        "b": state[f"{head}.bias"]}
    static = latent_xyzc.ModelStatic(
        encoder=sparse_conv_net.EncoderStatic(
            out_sh=OUT_SH, site_caps=(64, 64, 64, 64, 64)))
    return params, static


def _random_scene(rng, n_pts=257):
    import cv2

    volumes_t = [torch.from_numpy(
        rng.randn(1, c, *[s // 2 ** (lvl + 1) for s in OUT_SH])
        .astype(np.float32))
        for lvl, c in enumerate([32, 64, 128, 128])]
    Rh = rng.randn(3) * 0.3
    R = cv2.Rodrigues(Rh)[0].astype(np.float32)
    Th = rng.randn(1, 3).astype(np.float32) * 0.1
    lo = np.array([-0.35, -0.35, -0.35], np.float32)
    bounds = np.stack([lo, lo + np.asarray(VOXEL) * OUT_SH[0]]).astype(
        np.float32)
    # points spanning inside + slightly outside the volume
    wpts = (rng.rand(n_pts, 3).astype(np.float32) * 0.9 - 0.45) @ R.T + Th
    viewdir = rng.randn(n_pts, 3).astype(np.float32)
    viewdir /= np.linalg.norm(viewdir, axis=-1, keepdims=True)
    sp_input = {
        "R": torch.from_numpy(R)[None],
        "Th": torch.from_numpy(Th)[None],
        "bounds": torch.from_numpy(bounds)[None],
        "out_sh": list(OUT_SH),
        "latent_index": torch.tensor([2]),
        "batch_size": 1,
    }
    return volumes_t, sp_input, R, Th, bounds, wpts, viewdir


class TestDecodeParity:
    def test_calculate_density_color(self, ref, ours, rng):
        from neuralbody_tpu.models import latent_xyzc

        params, static = ours
        volumes_t, sp_input, R, Th, bounds, wpts, viewdir = _random_scene(rng)

        with torch.no_grad():
            raw_ref = ref.net.calculate_density_color(
                torch.from_numpy(wpts)[None], torch.from_numpy(viewdir)[None],
                volumes_t, sp_input)
        raw_ref = raw_ref[0].numpy()

        volumes = [np.transpose(v.numpy()[0], (1, 2, 3, 0))
                   for v in volumes_t]
        frame = {"R": R, "Th": Th, "bounds": bounds, "latent_index": 2}
        raw_ours = np.asarray(latent_xyzc.calculate_density_color(
            params, wpts, viewdir, volumes, frame, static, VOXEL))

        np.testing.assert_allclose(raw_ours, raw_ref, atol=2e-4, rtol=2e-4)
        assert np.abs(raw_ref).max() > 0.01  # non-degenerate scene

    def test_calculate_density(self, ref, ours, rng):
        from neuralbody_tpu.models import latent_xyzc

        params, static = ours
        volumes_t, sp_input, R, Th, bounds, wpts, _ = _random_scene(rng)

        with torch.no_grad():
            a_ref = ref.net.calculate_density(
                torch.from_numpy(wpts)[None], volumes_t, sp_input)
        a_ref = a_ref[0].numpy()  # [N, 1] after transpose in the reference

        volumes = [np.transpose(v.numpy()[0], (1, 2, 3, 0))
                   for v in volumes_t]
        frame = {"R": R, "Th": Th, "bounds": bounds, "latent_index": 0}
        a_ours = np.asarray(latent_xyzc.calculate_density(
            params, wpts, volumes, frame, static, VOXEL))
        np.testing.assert_allclose(a_ours, a_ref, atol=2e-4, rtol=2e-4)


class TestQuadratureParity:
    def test_raw2outputs(self, ref, rng):
        from neuralbody_tpu.ops.compositing import raw2outputs

        R_, S = 33, 16
        raw = rng.randn(R_, S, 4).astype(np.float32)
        raw[..., 3] += 1.0  # mostly positive densities: non-trivial weights
        z = np.sort(rng.rand(R_, S).astype(np.float32) * 2 + 1, axis=-1)
        rays_d = rng.randn(R_, 3).astype(np.float32)

        for white in (False, True):
            rgb_t, disp_t, acc_t, w_t, depth_t = ref.nnu.raw2outputs(
                torch.from_numpy(raw), torch.from_numpy(z),
                torch.from_numpy(rays_d), raw_noise_std=0, white_bkgd=white)
            out = raw2outputs(raw, z, rays_d, white_bkgd=white)
            np.testing.assert_allclose(np.asarray(out["rgb_map"]),
                                       rgb_t.numpy(), atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(out["weights"]),
                                       w_t.numpy(), atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(out["acc_map"]),
                                       acc_t.numpy(), atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(out["depth_map"]),
                                       depth_t.numpy(), atol=1e-5, rtol=1e-5)
            np.testing.assert_allclose(np.asarray(out["disp_map"]),
                                       disp_t.numpy(), atol=1e-4, rtol=1e-4)

    def test_sample_pdf_det(self, ref, rng):
        from neuralbody_tpu.ops.sample_pdf import sample_pdf

        R_, B = 19, 31
        bins = np.sort(rng.rand(R_, B).astype(np.float32) * 4, axis=-1)
        weights = rng.rand(R_, B - 1).astype(np.float32)
        weights[3] = 0.0  # degenerate ray exercises the denom<1e-5 guard

        s_ref = ref.nnu.sample_pdf(torch.from_numpy(bins),
                                   torch.from_numpy(weights), 24,
                                   det=True).numpy()
        s_ours = np.asarray(sample_pdf(bins, weights, 24, det=True))
        np.testing.assert_allclose(s_ours, s_ref, atol=1e-5, rtol=1e-5)
