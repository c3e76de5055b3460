"""w-triple packed submanifold conv: equivalence with the 27-tap conv.

The packed conv (ops.sparse_conv.subm_conv_xtri) must match subm_conv in
value AND gradients — same math, different gather layout (one 3C row per
(dd, dh) column + aug rows for center-missing fixups).
"""
import jax
import jax.numpy as jnp
import numpy as np

from neuralbody_tpu.ops import sparse_conv as sc


def _frame(rng, n=600, sh=(32, 64, 32), cap=768, fix_cap=256):
    coords = np.unique(
        rng.randint(0, np.array(sh)[None], size=(n, 3)).astype(np.int32),
        axis=0)
    sites, _ = sc.dedup_sites(coords, np.array(sh, np.int64))
    lk = sc._SiteLookup(sites, np.array(sh, np.int64))
    nbr_raw = sc.subm_table(sites, lk)
    nbr = np.where(nbr_raw < 0, cap, nbr_raw)
    nbr_tap = np.ascontiguousarray(sc._pad_rows(nbr, cap, cap).T)
    xtri = sc.xtri_aug_tables(nbr_raw, cap, fix_cap)
    return len(sites), nbr_tap, xtri


def _xtri_args(xtri):
    return tuple(jnp.asarray(xtri[n])
                 for n in ("lnbr", "rnbr", "nbr9", "augl", "augr"))


class TestXtriConv:
    def test_matches_27tap_fwd_and_grads(self, rng):
        cap, C = 768, 16
        S, nbr_tap, xtri = _frame(rng, 600)
        x = np.zeros((cap, C), np.float32)
        x[:S] = rng.randn(S, C) * 0.3
        w = rng.randn(27, C, 24).astype(np.float32) * 0.2
        xj, wj = jnp.asarray(x), jnp.asarray(w)
        nbrj = jnp.asarray(nbr_tap)
        targs = _xtri_args(xtri)

        ref = sc.subm_conv(xj, wj, nbrj)
        got = sc.subm_conv_xtri(xj, wj, *targs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

        # gradients: random cotangent projection through both paths
        gy = jnp.asarray(rng.randn(cap, 24).astype(np.float32))

        def loss_ref(x_, w_):
            return jnp.sum(sc.subm_conv(x_, w_, nbrj) * gy)

        def loss_xtri(x_, w_):
            return jnp.sum(sc.subm_conv_xtri(x_, w_, *targs) * gy)

        gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(xj, wj)
        gx_t, gw_t = jax.grad(loss_xtri, argnums=(0, 1))(xj, wj)
        np.testing.assert_allclose(np.asarray(gx_t), np.asarray(gx_r),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gw_t), np.asarray(gw_r),
                                   rtol=1e-4, atol=1e-5)

    def test_batched_matches_unbatched(self, rng):
        cap, C, B = 512, 8, 3
        frames = [_frame(rng, 350 + 40 * b, cap=cap, fix_cap=128)
                  for b in range(B)]
        x = rng.randn(B, cap, C).astype(np.float32) * 0.3
        for b, (S, _, _) in enumerate(frames):
            x[b, S:] = 0.0
        w = rng.randn(27, C, C).astype(np.float32) * 0.2
        xj, wj = jnp.asarray(x), jnp.asarray(w)
        batched = tuple(
            jnp.stack([jnp.asarray(f[2][n]) for f in frames])
            for n in ("lnbr", "rnbr", "nbr9", "augl", "augr"))
        got = sc.subm_conv_xtri(xj, wj, *batched)
        for b, f in enumerate(frames):
            one = sc.subm_conv_xtri(xj[b], wj, *_xtri_args(f[2]))
            np.testing.assert_allclose(np.asarray(got[b]), np.asarray(one),
                                       rtol=1e-5, atol=1e-6,
                                       err_msg=f"batch elem {b}")

    def test_bf16_encoder_close_to_f32(self, rng):
        """bf16 activations (compute_dtype flag) track f32 within bf16
        precision through the full encoder."""
        from neuralbody_tpu.models import latent_xyzc
        from neuralbody_tpu.models.latent_xyzc import ModelStatic
        from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
        from neuralbody_tpu.utils.synthetic import make_batch

        batch, static = make_batch(n_rays=16, n_verts=300, voxel_size=0.04,
                                   seed=3)
        geom = jax.tree.map(jnp.asarray, batch["geom"])
        params, _ = latent_xyzc.init(jax.random.PRNGKey(0),
                                     num_train_frame=2, nv=300)
        outs = {}
        for dt in ("float32", "bfloat16"):
            ms = ModelStatic(encoder=EncoderStatic(
                out_sh=static["out_sh"], site_caps=static["site_caps"],
                compute_dtype=dt))
            feats, _ = latent_xyzc.encode_sparse_voxels(
                params, geom, ms, densify=False)
            outs[dt] = [np.asarray(f) for f in feats]
        for a, b in zip(outs["float32"], outs["bfloat16"]):
            assert b.dtype == np.float32  # emitted f32 for interpolation
            scale = np.abs(a).max() + 1e-6
            assert np.abs(a - b).max() / scale < 0.05, "bf16 drifted >5%"
