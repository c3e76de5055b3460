import sys, time, jax, jax.numpy as jnp, numpy as np
from neuralbody_tpu.models import latent_xyzc, sparse_conv_net
from neuralbody_tpu.models.latent_xyzc import ModelStatic
from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
from neuralbody_tpu.utils.synthetic import make_batch

which = sys.argv[1]
batch_np, static = make_batch(n_rays=1024, n_verts=6890, voxel_size=0.005, seed=0)
batch = jax.tree.map(jnp.asarray, batch_np)
ms = ModelStatic(encoder=EncoderStatic(out_sh=static["out_sh"], site_caps=static["site_caps"]))
params, bn = latent_xyzc.init(jax.random.PRNGKey(0), num_train_frame=60)
geom = batch["geom"]

def t(name, f, *a, n=3):
    t0 = time.perf_counter()
    out = f(*a); _ = float(jax.tree.leaves(out)[0].sum())
    print(f"{name} compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    ts=[]
    for _i in range(n):
        t0=time.perf_counter(); out=f(*a)
        _=float(jax.tree.leaves(out)[0].sum())
        ts.append(time.perf_counter()-t0)
    print(f"{name}: {min(ts)*1000:.2f} ms", flush=True)

if which == "enc_fwd":
    enc = jax.jit(lambda p, g: latent_xyzc.encode_sparse_voxels(p, g, ms, densify=False)[0])
    t("encoder fwd (sites)", enc, params, geom)
elif which == "enc_bwd":
    def eloss(p, g):
        sf, _ = latent_xyzc.encode_sparse_voxels(p, g, ms, densify=False)
        return sum(jnp.sum(x**2) for x in sf)
    t("encoder fwd+bwd", jax.jit(jax.grad(eloss)), params, geom)
elif which == "ivol":
    t("index volumes", jax.jit(lambda g: sparse_conv_net.index_volumes(g, ms.encoder)), geom)
elif which == "mlp":
    feats = jnp.ones((65536, 352))
    def dec(p, f):
        return jnp.sum(latent_xyzc._density_trunk(p, f))
    t("trunk MLP fwd", jax.jit(dec), params, feats)
    t("trunk MLP fwd+bwd", jax.jit(jax.grad(dec, argnums=1)), params, feats)
elif which == "interp":
    sf, _ = jax.jit(lambda p, g: latent_xyzc.encode_sparse_voxels(p, g, ms, densify=False))(params, geom)
    iv = jax.jit(lambda g: sparse_conv_net.index_volumes(g, ms.encoder))(geom)
    sf0 = [x[0] for x in sf]; iv0 = [v[0] for v in iv]
    dhw = jnp.asarray(np.random.RandomState(0).uniform(0, 90, (65536, 3)).astype(np.float32))
    def interp(sfeats):
        return jnp.sum(latent_xyzc.interpolate_site_features(sfeats, iv0, dhw, ms))
    t("site interp fwd", jax.jit(interp), sf0)
    t("site interp fwd+bwd", jax.jit(jax.grad(interp)), sf0)
elif which == "step":
    import optax
    from neuralbody_tpu.renderer.renderer import RenderSettings
    from neuralbody_tpu.train.step import train_step_scan
    G = 8
    batches = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (G,)+x.shape), batch)
    s = RenderSettings(model=ms, voxel_size=(0.005,)*3, n_samples=64, chunk_rays=1024, site_interp=True)
    tx = optax.chain(optax.clip(40.0), optax.adam(5e-4))
    opt = tx.init(params)
    keys = jax.random.split(jax.random.PRNGKey(1), G)
    t0 = time.perf_counter()
    params, bn, opt, st = train_step_scan(params, bn, opt, batches, keys, s, tx)
    _ = float(st["loss"][-1])
    print(f"scan step compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        params, bn, opt, st = train_step_scan(params, bn, opt, batches, keys, s, tx)
        _ = float(st["loss"][-1])
        ts.append(time.perf_counter()-t0)
    print(f"scan step: {min(ts)/G*1000:.2f} ms/step -> {1024*G/min(ts):,.0f} rays/s", flush=True)
