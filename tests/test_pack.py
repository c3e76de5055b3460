"""Single-buffer dispatch payloads (parallel/pack.py): roundtrip + step
equivalence with the unpacked banked scan step."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuralbody_tpu.parallel.pack import make_layout, pack, unpack


def test_roundtrip_mixed_dtypes(rng):
    tree = {
        "a_f32": rng.randn(3, 5, 2).astype(np.float32),
        "b_u16": rng.randint(0, 65535, (4, 7)).astype(np.uint16),
        "c_i32": rng.randint(-9, 9, (2, 3, 1)).astype(np.int32),
        "d_u8": rng.randint(0, 255, (11,)).astype(np.uint8),
        "e_f32": rng.randn(1).astype(np.float32),
    }
    layout = make_layout(tree)
    assert layout.total == sum(v.nbytes for v in tree.values())
    buf = pack(tree, layout)
    out = jax.jit(unpack, static_argnames=("layout",))(
        jnp.asarray(buf), layout)
    assert set(out) == set(tree)
    for k in tree:
        assert out[k].dtype == tree[k].dtype, k
        np.testing.assert_array_equal(np.asarray(out[k]), tree[k])


def test_packed_scan_step_matches_banked(rng):
    from neuralbody_tpu.models import latent_xyzc
    from neuralbody_tpu.models.latent_xyzc import ModelStatic
    from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
    from neuralbody_tpu.renderer.renderer import RenderSettings
    from neuralbody_tpu.train.step import (train_step_scan_banked,
                                           train_step_scan_packed)
    from neuralbody_tpu.utils.synthetic import make_batch

    G = 2
    batch_np, static = make_batch(n_rays=64, n_verts=400, voxel_size=0.02,
                                  seed=2, hat=True, n_samples=8,
                                  hat_perturb=False)
    ms = ModelStatic(encoder=EncoderStatic(
        out_sh=static["out_sh"], site_caps=static["site_caps"]))
    settings = RenderSettings(
        model=ms, voxel_size=(0.02,) * 3, n_samples=8, chunk_rays=64,
        hat_rows_caps=tuple(static["hat"]["rows_caps"]))
    params, bn_stats = latent_xyzc.init(jax.random.PRNGKey(0),
                                        num_train_frame=4, nv=400)
    tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))

    geom = {k: jnp.asarray(v) for k, v in batch_np["geom"].items()}
    flat = {k: np.broadcast_to(np.asarray(v)[None], (G,) + np.shape(v))
            for k, v in batch_np.items() if k != "geom"}
    flat["geom_rows"] = np.zeros((G, 1), np.int32)
    keys = jax.random.split(jax.random.PRNGKey(3), G)

    def fresh_state():
        # donation-safe copies (the scan steps donate params/bn/opt)
        p = jax.tree.map(jnp.array, params)
        s = jax.tree.map(jnp.array, bn_stats)
        return p, s, tx.init(p)

    p1, s1, o1 = fresh_state()
    p1, s1, o1, st1 = train_step_scan_banked(
        p1, s1, o1, jax.tree.map(jnp.asarray, flat), keys, geom,
        settings, tx)

    layout = make_layout(flat)
    buf = pack(flat, layout)
    p2, s2, o2 = fresh_state()
    p2, s2, o2, st2 = train_step_scan_packed(
        p2, s2, o2, jnp.asarray(buf), keys, geom, layout, settings, tx)

    np.testing.assert_allclose(np.asarray(st1["loss"]),
                               np.asarray(st2["loss"]), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        p1, p2)
