"""Basic pallas viability + clean scan-timed enc/interp numbers."""
import sys, time, jax, jax.numpy as jnp, numpy as np

def scan_time(name, step, init, n=8):
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, _: (step(c), ()), c, None, length=n)[0]
    t0 = time.perf_counter(); out = run(init)
    _ = float(jax.tree.leaves(out)[0].sum())
    print(f"{name} compile {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); out = run(init)
        _ = float(jax.tree.leaves(out)[0].sum())
        ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)/n*1000:.3f} ms/iter", flush=True)

if sys.argv[1] == "pallas_mm":
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    M = N_ = K = 1024
    def mm(a, b):
        def kernel(a_ref, b_ref, o_ref):
            o_ref[...] = jnp.dot(a_ref[...], b_ref[...],
                                 preferred_element_type=jnp.float32)
        return pl.pallas_call(
            kernel,
            grid=(M // 256,),
            in_specs=[pl.BlockSpec((256, K), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((256, N_), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N_), jnp.float32))(a, b)
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(M, K).astype(np.float32))
    b = jnp.asarray(rng.randn(K, N_).astype(np.float32))
    try:
        y = jax.jit(mm)(a, b)
        err = float(jnp.abs(y - a @ b).max())
        print(f"pallas basic matmul OK, max err {err:.2e}", flush=True)
        scan_time("pallas mm 1024^3", lambda c: mm(c, b) * 1e-3, a)
    except Exception as e:
        print(f"pallas basic matmul FAILED: {type(e).__name__}: {str(e)[:300]}")

elif sys.argv[1] == "enc":
    from neuralbody_tpu.models import latent_xyzc, sparse_conv_net
    from neuralbody_tpu.models.latent_xyzc import ModelStatic
    from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
    from neuralbody_tpu.utils.synthetic import make_batch
    batch_np, static = make_batch(n_rays=1024, n_verts=6890,
                                  voxel_size=0.005, seed=0)
    batch = jax.tree.map(jnp.asarray, batch_np)
    ms = ModelStatic(encoder=EncoderStatic(out_sh=static["out_sh"],
                                           site_caps=static["site_caps"]))
    params, bn = latent_xyzc.init(jax.random.PRNGKey(0), num_train_frame=60)
    geom = batch["geom"]

    def step_f(c):
        p = jax.tree.map(lambda x: x + c * 1e-12, params)
        sf, _ = latent_xyzc.encode_sparse_voxels(p, geom, ms, densify=False)
        return sum(jnp.sum(x) for x in sf)
    scan_time("enc fwd", step_f, jnp.float32(0.0))

    def eloss(p):
        sf, _ = latent_xyzc.encode_sparse_voxels(p, geom, ms, densify=False)
        return sum(jnp.sum(x ** 2) for x in sf)
    def step_b(c):
        g = jax.grad(eloss)(jax.tree.map(lambda x: x + c * 1e-12, params))
        return jnp.sum(g["vertex_code"])
    scan_time("enc fwd+bwd", step_b, jnp.float32(0.0))

    sf, _ = jax.jit(lambda p, g: latent_xyzc.encode_sparse_voxels(
        p, g, ms, densify=False))(params, geom)
    iv = jax.jit(lambda g: sparse_conv_net.index_volumes(
        g, ms.encoder))(geom)
    sf0 = [x[0] for x in sf]; iv0 = [v[0] for v in iv]
    dhw = jnp.asarray(np.random.RandomState(0).uniform(
        0, 90, (65536, 3)).astype(np.float32))
    def iloss(sfeats):
        return jnp.sum(latent_xyzc.interpolate_site_features(
            sfeats, iv0, dhw, ms))
    def step_if(c):
        return iloss([x + c * 1e-12 for x in sf0])
    scan_time("site-interp fwd", step_if, jnp.float32(0.0))
    def step_ib(c):
        g = jax.grad(iloss)([x + c * 1e-12 for x in sf0])
        return jnp.sum(g[0])
    scan_time("site-interp fwd+bwd", step_ib, jnp.float32(0.0))

    feats = jnp.ones((65536, 352))
    def dec(f):
        return jnp.sum(latent_xyzc._density_trunk(params, f))
    scan_time("mlp fwd+bwd", lambda c: jnp.sum(jax.grad(dec)(feats + c*1e-12)),
              jnp.float32(0.0))
