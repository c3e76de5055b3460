"""RTT-free op microbenchmarks: each op is iterated N times inside one
dispatch via lax.scan with a data-dependent carry (no CSE, no per-iter RTT).

Usage: python _probe3.py <which> [N]
  enc_fwd | enc_bwd | interp | mlp | gather | empty
"""
import sys, time, jax, jax.numpy as jnp, numpy as np
from neuralbody_tpu.models import latent_xyzc, sparse_conv_net
from neuralbody_tpu.models.latent_xyzc import ModelStatic
from neuralbody_tpu.models.sparse_conv_net import EncoderStatic
from neuralbody_tpu.utils.synthetic import make_batch

which = sys.argv[1]
N = int(sys.argv[2]) if len(sys.argv) > 2 else 16

batch_np, static = make_batch(n_rays=1024, n_verts=6890, voxel_size=0.005,
                              seed=0)
batch = jax.tree.map(jnp.asarray, batch_np)
ms = ModelStatic(encoder=EncoderStatic(out_sh=static["out_sh"],
                                       site_caps=static["site_caps"]))
params, bn = latent_xyzc.init(jax.random.PRNGKey(0), num_train_frame=60)
geom = batch["geom"]


def scan_time(name, step, init_carry):
    """step: carry -> carry. Times N iterations in one dispatch."""
    @jax.jit
    def run(c):
        def body(c, _):
            return step(c), ()
        c, _ = jax.lax.scan(body, c, None, length=N)
        return c
    t0 = time.perf_counter()
    out = run(init_carry)
    _ = float(jax.tree.leaves(out)[0].sum())
    print(f"{name} compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(init_carry)
        _ = float(jax.tree.leaves(out)[0].sum())
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)/N*1000:.3f} ms/iter (N={N}, best dispatch "
          f"{min(ts)*1000:.1f} ms)", flush=True)


def perturb(params, eps):
    return jax.tree.map(lambda x: x + eps * 1e-9, params)


if which == "empty":
    scan_time("empty (carry add)", lambda c: c + 1.0, jnp.zeros((8, 128)))

elif which == "enc_fwd":
    def step(c):
        p = perturb(params, c)
        sf, _ = latent_xyzc.encode_sparse_voxels(p, geom, ms, densify=False)
        return sum(jnp.sum(x) for x in sf)
    scan_time("enc fwd", step, jnp.float32(0.0))

elif which == "enc_bwd":
    def eloss(p):
        sf, _ = latent_xyzc.encode_sparse_voxels(p, geom, ms, densify=False)
        return sum(jnp.sum(x ** 2) for x in sf)
    def step(c):
        g = jax.grad(eloss)(perturb(params, c))
        return jnp.sum(g["vertex_code"])
    scan_time("enc fwd+bwd", step, jnp.float32(0.0))

elif which == "interp":
    sf, _ = jax.jit(lambda p, g: latent_xyzc.encode_sparse_voxels(
        p, g, ms, densify=False))(params, geom)
    iv = jax.jit(lambda g: sparse_conv_net.index_volumes(g, ms.encoder))(geom)
    sf0 = [x[0] for x in sf]
    iv0 = [v[0] for v in iv]
    dhw = jnp.asarray(np.random.RandomState(0).uniform(
        0, 90, (65536, 3)).astype(np.float32))
    def iloss(sfeats):
        return jnp.sum(latent_xyzc.interpolate_site_features(
            sfeats, iv0, dhw, ms))
    def step(c):
        g = jax.grad(iloss)([x + c * 1e-12 for x in sf0])
        return jnp.sum(g[0])
    scan_time("site-interp fwd+bwd", step, jnp.float32(0.0))

    def step_f(c):
        return iloss([x + c * 1e-12 for x in sf0])
    scan_time("site-interp fwd", step_f, jnp.float32(0.0))

elif which == "mlp":
    feats = jnp.ones((65536, 352))
    def dec(f):
        return jnp.sum(latent_xyzc._density_trunk(params, f))
    def step(c):
        return jnp.sum(jax.grad(dec)(feats + c * 1e-12))
    scan_time("trunk MLP fwd+bwd", step, jnp.float32(0.0))

elif which == "gather":
    rng = np.random.RandomState(0)
    for (S, C) in [(6656, 16), (16128, 32), (9984, 64), (3072, 128)]:
        table = jnp.asarray(rng.randn(S + 1, C).astype(np.float32))
        nbr = jnp.asarray(rng.randint(0, S + 1, (S, 27)).astype(np.int32))
        w = jnp.asarray(rng.randn(27 * C, C).astype(np.float32) * 0.1)
        def step(t, S=S, C=C, nbr=nbr, w=w):
            g = t[nbr].reshape(S, 27 * C)
            y = jnp.dot(g, w, preferred_element_type=jnp.float32)
            return jnp.concatenate([y, t[-1:]], axis=0)  # carry shape [S+1,C]
        scan_time(f"gather+mm S={S} C={C}", step, table)
