"""Sparse conv engine parity vs torch dense-conv oracles.

spconv semantics being emulated (SURVEY.md §7.3 #1):
  * SubMConv3d(k=3, bias=False): dense conv output AT input active sites,
    zero elsewhere.
  * SparseConv3d(k=3, s=2, p=1, bias=False): equals a dense strided conv on
    the zero-filled grid everywhere (inactive outputs are zero anyway).
  * BatchNorm1d over the active-site list only.
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from neuralbody_tpu.ops.sparse_conv import (
    _SiteLookup, build_frame_geometry, dedup_sites, down_table,
    downsample_sites, gather_taps, masked_batch_norm, scatter_dense,
    scatter_vertex_codes, site_mask, sparse_conv_matmul, subm_table,
)
from neuralbody_tpu.models import sparse_conv_net
from neuralbody_tpu.models.sparse_conv_net import EncoderStatic


def random_sites(rng, n, sh):
    coords = np.stack([rng.randint(0, s, n) for s in sh], axis=1).astype(np.int32)
    sites, _ = dedup_sites(coords, sh)
    return sites


def densify(sites, feats, sh):
    """[S,3],[S,C] -> torch [1, C, D, H, W]."""
    C = feats.shape[-1]
    vol = np.zeros((*sh, C), np.float32)
    vol[sites[:, 0], sites[:, 1], sites[:, 2]] = feats
    return torch.from_numpy(vol).permute(3, 0, 1, 2)[None]


def my_w_to_torch(w):
    """[27, Cin, Cout] -> torch conv3d weight [Cout, Cin, 3, 3, 3]."""
    return torch.from_numpy(
        np.asarray(w).reshape(3, 3, 3, w.shape[1], w.shape[2])
    ).permute(4, 3, 0, 1, 2).contiguous()


class TestSubmConv:
    def test_matches_masked_dense_conv(self, rng):
        sh = (8, 10, 12)
        cin, cout = 4, 6
        sites = random_sites(rng, 40, sh)
        S = len(sites)
        feats = rng.randn(S, cin).astype(np.float32)
        w = rng.randn(27, cin, cout).astype(np.float32) * 0.1

        lookup = _SiteLookup(sites, sh)
        tbl = subm_table(sites, lookup)
        tbl = np.where(tbl < 0, S, tbl)

        g = gather_taps(jnp.array(feats), jnp.array(tbl.T))
        ours = np.asarray(sparse_conv_matmul(g, jnp.array(w)))

        ref = F.conv3d(densify(sites, feats, sh), my_w_to_torch(w), padding=1)
        ref = ref[0].permute(1, 2, 3, 0).numpy()
        ref_at_sites = ref[sites[:, 0], sites[:, 1], sites[:, 2]]
        np.testing.assert_allclose(ours, ref_at_sites, rtol=1e-4, atol=1e-4)


class TestStrideConv:
    def test_matches_dense_strided_conv(self, rng):
        sh = (8, 12, 16)
        cin, cout = 5, 7
        sites = random_sites(rng, 60, sh)
        S = len(sites)
        feats = rng.randn(S, cin).astype(np.float32)
        w = rng.randn(27, cin, cout).astype(np.float32) * 0.1

        lookup = _SiteLookup(sites, sh)
        out_sites = downsample_sites(sites, sh)
        tbl = down_table(out_sites, lookup)
        tbl = np.where(tbl < 0, S, tbl)

        g = gather_taps(jnp.array(feats), jnp.array(tbl.T))
        ours = np.asarray(sparse_conv_matmul(g, jnp.array(w)))

        ref = F.conv3d(densify(sites, feats, sh), my_w_to_torch(w),
                       stride=2, padding=1)
        ref = ref[0].permute(1, 2, 3, 0).numpy()
        assert ref.shape[:3] == tuple(s // 2 for s in sh)

        ref_at = ref[out_sites[:, 0], out_sites[:, 1], out_sites[:, 2]]
        np.testing.assert_allclose(ours, ref_at, rtol=1e-4, atol=1e-4)

        # every nonzero dense output position must be an active out site
        nz = np.argwhere(np.abs(ref).max(-1) > 1e-6)
        active = {tuple(s) for s in out_sites}
        for p in nz:
            assert tuple(p) in active


class TestMaskedBatchNorm:
    def test_matches_torch_bn_on_active_sites(self, rng):
        S, C, n_valid = 32, 8, 21
        x = rng.randn(S, C).astype(np.float32)
        mask = np.zeros(S, np.float32)
        mask[:n_valid] = 1
        x = x * mask[:, None]
        scale = rng.rand(C).astype(np.float32) + 0.5
        bias = rng.randn(C).astype(np.float32)

        y, (mean, var) = masked_batch_norm(
            jnp.array(x), jnp.array(mask), jnp.array(scale), jnp.array(bias))

        bn = torch.nn.BatchNorm1d(C, eps=1e-3, momentum=0.01)
        bn.weight.data = torch.from_numpy(scale)
        bn.bias.data = torch.from_numpy(bias)
        bn.train()
        ref = bn(torch.from_numpy(x[:n_valid])).detach().numpy()

        np.testing.assert_allclose(np.asarray(y)[:n_valid], ref,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(y)[n_valid:], 0.0, atol=1e-7)


class TestGeometryBuilder:
    def test_caps_and_padding(self, rng):
        sh = (32, 32, 32)
        verts = np.stack([rng.randint(0, 30, 500) for _ in range(3)], 1)
        caps = [512, 2048, 512, 64, 16]
        geom = build_frame_geometry(verts, sh, caps)

        assert geom["vert_idx"].shape == (500,)
        for l in range(5):
            cap = caps[l]
            assert geom[f"nbr{l}"].shape == (27, cap)
            assert geom[f"sites{l}"].shape == (cap, 3)
            n = int(geom[f"nsite{l}"])
            assert 0 < n <= cap
            # padded gather entries point at the zero row
            assert (geom[f"nbr{l}"][:, n:] == cap).all()
            # real entries are in [0, cap]
            assert geom[f"nbr{l}"].min() >= 0
            assert geom[f"nbr{l}"].max() <= cap

    def test_scatter_vertex_codes_sums_duplicates(self):
        codes = jnp.array([[1.0, 2.0], [3.0, 4.0], [10.0, 20.0]])
        vidx = jnp.array([0, 0, 1])
        out = np.asarray(scatter_vertex_codes(codes, vidx, 4))
        np.testing.assert_allclose(out[0], [4.0, 6.0])
        np.testing.assert_allclose(out[1], [10.0, 20.0])
        np.testing.assert_allclose(out[2:], 0.0)

    def test_scatter_dense_drops_padding(self):
        feats = jnp.array([[1.0], [2.0], [3.0]])
        sites = jnp.array([[0, 0, 0], [1, 1, 1], [2 ** 30, 2 ** 30, 2 ** 30]],
                          dtype=jnp.int32)
        vol = np.asarray(scatter_dense(feats, sites, (2, 2, 2)))
        assert vol[0, 0, 0, 0] == 1.0
        assert vol[1, 1, 1, 0] == 2.0
        assert vol.sum() == 3.0


class TorchSpconvOracle:
    """Reference-topology encoder with torch dense convs + site masks."""

    def __init__(self, params):
        self.params = jax.tree.map(np.asarray, params)

    def _subm_block(self, x, site_mask_vol, layers):
        # x: [1, C, D, H, W]; site_mask_vol: [1, 1, D, H, W]
        for layer in layers:
            x = F.conv3d(x, my_w_to_torch(layer["w"]), padding=1)
            x = x * site_mask_vol
            x = self._bn(x, site_mask_vol, layer)
            x = torch.relu(x) * site_mask_vol
        return x

    def _bn(self, x, mask_vol, layer):
        # BatchNorm over active sites only
        m = mask_vol.bool()[0, 0]
        flat = x[0, :, m].T                      # [S, C]
        bn = torch.nn.BatchNorm1d(x.shape[1], eps=1e-3, momentum=0.01)
        bn.weight.data = torch.from_numpy(layer["bn_scale"]).float()
        bn.bias.data = torch.from_numpy(layer["bn_bias"]).float()
        bn.train()
        out = bn(flat).detach()
        y = torch.zeros_like(x)
        y[0, :, m] = out.T
        return y

    def _down(self, x, out_mask_vol, layers):
        layer = layers[0]
        x = F.conv3d(x, my_w_to_torch(layer["w"]), stride=2, padding=1)
        x = x * out_mask_vol
        x = self._bn(x, out_mask_vol, layer)
        return torch.relu(x) * out_mask_vol

    def run(self, code_vol, site_masks):
        """code_vol [1,16,D,H,W]; site_masks: per-level [1,1,...] volumes."""
        p = self.params
        x = self._subm_block(code_vol, site_masks[0], p["conv0"])
        x = self._down(x, site_masks[1], p["down0"])
        x = self._subm_block(x, site_masks[1], p["conv1"])
        net1 = x
        x = self._down(x, site_masks[2], p["down1"])
        x = self._subm_block(x, site_masks[2], p["conv2"])
        net2 = x
        x = self._down(x, site_masks[3], p["down2"])
        x = self._subm_block(x, site_masks[3], p["conv3"])
        net3 = x
        x = self._down(x, site_masks[4], p["down3"])
        x = self._subm_block(x, site_masks[4], p["conv4"])
        net4 = x
        return [net1, net2, net3, net4]


class TestFullEncoderParity:
    def test_encoder_matches_torch_oracle(self, rng):
        sh = (32, 32, 32)
        caps = (512, 2048, 512, 64, 16)
        nv = 300
        verts = np.stack([rng.randint(2, 29, nv) for _ in range(3)], 1).astype(
            np.int32)

        geom_np = build_frame_geometry(verts, sh, caps)
        static = EncoderStatic(out_sh=sh, site_caps=caps)

        params, _ = sparse_conv_net.init(jax.random.PRNGKey(0))

        # site features: random codes scattered (sum) into level-0 sites
        codes = rng.randn(nv, 16).astype(np.float32)
        site_feats = np.asarray(scatter_vertex_codes(
            jnp.array(codes), jnp.array(geom_np["vert_idx"]), caps[0]))

        geom = {k: jnp.array(v)[None] for k, v in geom_np.items()}
        volumes, _ = sparse_conv_net.apply(
            params, jnp.array(site_feats)[None], geom, static)

        # torch oracle on dense grids
        n0 = int(geom_np["nsite0"])
        sites0 = geom_np["sites0"][:n0]
        code_vol = densify(sites0, site_feats[:n0], sh)

        # per-level active site masks as dense volumes
        site_masks = []
        lsites = sites0
        lsh = np.array(sh)
        for l in range(5):
            m = np.zeros(tuple(lsh), np.float32)
            m[lsites[:, 0], lsites[:, 1], lsites[:, 2]] = 1
            site_masks.append(torch.from_numpy(m)[None, None])
            if l < 4:
                lsites = downsample_sites(lsites, lsh)
                lsh = lsh // 2

        oracle = TorchSpconvOracle(params)
        refs = oracle.run(code_vol, site_masks)

        for lvl, (mine, ref) in enumerate(zip(volumes, refs)):
            mine = np.asarray(mine[0])                      # [D,H,W,C]
            ref = ref[0].permute(1, 2, 3, 0).numpy()
            np.testing.assert_allclose(
                mine, ref, rtol=5e-3, atol=5e-4,
                err_msg=f"level {lvl + 1} volume mismatch")

    def test_encoder_gradients_flow(self, rng):
        sh = (32, 32, 32)
        caps = (256, 1024, 512, 64, 16)
        verts = np.stack([rng.randint(4, 28, 100) for _ in range(3)], 1)
        geom_np = build_frame_geometry(verts.astype(np.int32), sh, caps)
        static = EncoderStatic(out_sh=sh, site_caps=caps)
        params, _ = sparse_conv_net.init(jax.random.PRNGKey(1))
        geom = {k: jnp.array(v)[None] for k, v in geom_np.items()}
        codes = jnp.array(rng.randn(100, 16).astype(np.float32))

        def loss(params, codes):
            feats = scatter_vertex_codes(codes, geom["vert_idx"][0], caps[0])
            vols, _ = sparse_conv_net.apply(params, feats[None], geom, static)
            return sum(jnp.sum(v ** 2) for v in vols)

        g_params, g_codes = jax.grad(loss, argnums=(0, 1))(params, codes)
        leaves = jax.tree.leaves(g_params)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
        assert np.abs(np.asarray(g_codes)).max() > 0
