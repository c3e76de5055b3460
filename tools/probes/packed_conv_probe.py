"""Probe: packed w-cell halo conv formulation vs the 27-tap gather conv.

(a) raw gather rate (ns/row) vs row width, f32, on this chip;
(b) submanifold conv at the L1 working point (S=16k, C=32): current
    tap-major 27-gather vs the packed-cell formulation (pack sites into
    (d, h, w//P) cells, build a (P+2)-slot halo array with 3 cheap
    gathers, gather 9 (dd,dh) neighbor halo rows, unfold the w window,
    batched matmul). Checks allclose vs the reference formulation first.

Usage: python tools/probes/packed_conv_probe.py [gather|conv] [N]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from neuralbody_tpu.ops import sparse_conv as sc
from neuralbody_tpu.utils.synthetic import make_batch

which = sys.argv[1] if len(sys.argv) > 1 else "conv"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def scan_time(name, step, init_carry, n=N):
    @jax.jit
    def run(c):
        def body(c, _):
            return step(c), ()
        c, _ = jax.lax.scan(body, c, None, length=n)
        return c

    t0 = time.perf_counter()
    out = run(init_carry)
    _ = float(jax.tree.leaves(out)[0].sum())
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(init_carry)
        _ = float(jax.tree.leaves(out)[0].sum())
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)/n*1000:.3f} ms/iter  (compile {compile_s:.1f}s,"
          f" best dispatch {min(ts)*1000:.1f} ms, N={n})", flush=True)
    return min(ts) / n


# ---------------------------------------------------------------------------
# host-side packed rulebook (prototype of the engine tables)
# ---------------------------------------------------------------------------

def build_packed(sites, sh, P):
    """sites [S,3] dhw -> packed tables.

    Returns dict with:
      n_cells, E
      site_flat [S]      site -> flat packed slot (cell*P + w%P)
      hleft/hcenter/hright [E]  halo build sources (cell rows; sentinel=n_cells)
      nbr9 [9, n_cells]  (dd,dh) neighbor halo-row index (sentinel=E)
    """
    d, h, w = sites[:, 0], sites[:, 1], sites[:, 2]
    u = w // P
    key = (d.astype(np.int64) * sh[1] + h) * (sh[2] // P + 2) + u
    cells_key, cell_inv = np.unique(key, return_inverse=True)
    n_cells = len(cells_key)
    site_flat = cell_inv * P + (w % P)

    # extended halo cell set: (d,h,u') with any site w in [P*u'-1, P*u'+P]
    cand = [key]
    sel_m = (w % P) == 0
    cand.append(key[sel_m] - 1)          # site at left edge -> cell u-1
    sel_p = (w % P) == (P - 1)
    cand.append(key[sel_p] + 1)          # site at right edge -> cell u+1
    halo_key = np.unique(np.concatenate(cand))
    E = len(halo_key)

    def find(keys, table, sentinel):
        pos = np.searchsorted(table, keys)
        pos_c = np.minimum(pos, len(table) - 1)
        ok = table[pos_c] == keys
        return np.where(ok, pos_c, sentinel).astype(np.int32)

    hcenter = find(halo_key, cells_key, n_cells)
    hleft = find(halo_key - 1, cells_key, n_cells)
    hright = find(halo_key + 1, cells_key, n_cells)

    # 9-neighborhood (dd, dh) of each OUTPUT cell into the halo set
    cd = cells_key // (sh[1] * (sh[2] // P + 2))
    rem = cells_key % (sh[1] * (sh[2] // P + 2))
    ch = rem // (sh[2] // P + 2)
    cu = rem % (sh[2] // P + 2)
    nbr9 = np.empty((9, n_cells), np.int32)
    t = 0
    for dd in (-1, 0, 1):
        for dh in (-1, 0, 1):
            qd, qh = cd + dd, ch + dh
            qkey = (qd * sh[1] + qh) * (sh[2] // P + 2) + cu
            idx = find(qkey, halo_key, E)
            oob = (qd < 0) | (qd >= sh[0]) | (qh < 0) | (qh >= sh[1])
            nbr9[t] = np.where(oob, E, idx)
            t += 1
    return dict(n_cells=n_cells, E=E, site_flat=site_flat.astype(np.int32),
                hleft=hleft, hcenter=hcenter, hright=hright, nbr9=nbr9)


def toeplitz_w(w27, P, Cin, Cout):
    """[27, Cin, Cout] -> [9, (P+2)*Cin, P*Cout] block-Toeplitz: output
    slot p contracts halo slots p..p+2 with dw=-1,0,+1 kernels."""
    wt = np.zeros((9, (P + 2) * Cin, P * Cout), w27.dtype)
    for t in range(9):
        for p in range(P):
            for dj in range(3):  # halo slot j = p + dj; dw index = dj
                j = p + dj
                wt[t, j * Cin:(j + 1) * Cin, p * Cout:(p + 1) * Cout] = \
                    w27[t * 3 + dj]
    return wt


def packed_conv(xp, wt, tabs, P):
    """xp [n_cells, P, Cin] (invalid slots zero);
    wt [9, (P+2)*Cin, P*Cout] block-Toeplitz.

    Every gather is a full-row gather from a 2D table (the fast TPU path;
    block-slice gathers are catastrophically slow)."""
    nc = xp.shape[0]
    C = xp.shape[-1]
    rows = xp.reshape(nc, P * C)
    rows_pad = jnp.concatenate([rows, jnp.zeros((1, P * C), xp.dtype)], 0)
    flat = jnp.concatenate([xp.reshape(nc * P, C),
                            jnp.zeros((P, C), xp.dtype)], 0)
    center = rows_pad[tabs["hcenter"]]                    # [E, P*C]
    left = flat[tabs["hleft"] * P + (P - 1)]              # [E, C]
    right = flat[tabs["hright"] * P]                      # [E, C]
    halo = jnp.concatenate([left, center, right], axis=-1)  # [E, (P+2)C]
    halo = jnp.concatenate(
        [halo, jnp.zeros((1, (P + 2) * C), xp.dtype)], axis=0)
    g = halo[tabs["nbr9"]]                                # [9, nc, (P+2)C]
    out = jax.lax.dot_general(
        g, wt, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # [9, nc, P*Cout]
    return jnp.sum(out, axis=0).reshape(nc, P, -1)


def main():
    batch, static = make_batch(n_rays=8, n_verts=6890, voxel_size=0.005,
                               seed=0)
    geom = {k: np.asarray(v[0]) for k, v in batch["geom"].items()}

    if which == "gather":
        R = 435456  # L1 conv row count
        S = 16128
        rng = np.random.RandomState(0)
        idx = jnp.asarray(rng.randint(0, S, R).astype(np.int32))
        for width in (16, 32, 64, 96, 144, 192, 384, 768):
            tbl = jnp.asarray(rng.randn(S, width).astype(np.float32))

            def step(c, tbl=tbl):
                g = (tbl + c)[idx]
                return jnp.float32(jnp.sum(g[0]) * 1e-20)

            t = scan_time(f"gather {R} rows x {width*4}B", step,
                          jnp.float32(0.0))
            print(f"    -> {t/R*1e9:.2f} ns/row", flush=True)
        return

    # conv formulation comparison at L1
    lvl = 1
    nsite = int(geom[f"nsite{lvl}"])
    sites = geom[f"sites{lvl}"][:nsite]
    cap = sites.shape[0]
    sh = np.asarray(static["out_sh"], np.int64) // 2
    C = 32
    rng = np.random.RandomState(1)
    x = rng.randn(nsite, C).astype(np.float32) * 0.1
    w27 = rng.randn(27, C, C).astype(np.float32) * 0.1

    # reference: current engine at the padded capacity
    capn = static["site_caps"][lvl]
    xpad_sites = np.zeros((capn, C), np.float32)
    xpad_sites[:nsite] = x
    nbr = geom[f"nbr{lvl}"]
    ref = np.asarray(sc.sparse_conv_matmul(
        sc.gather_taps(jnp.asarray(xpad_sites), jnp.asarray(nbr)),
        jnp.asarray(w27)))[:nsite]

    for P in (4, 8):
        tabs = build_packed(sites, sh, P)
        nc, E = tabs["n_cells"], tabs["E"]
        print(f"P={P}: n_cells={nc} E={E} rows 9nc+3E={9*nc+3*E} "
              f"vs 27S={27*capn}", flush=True)
        xp = np.zeros((nc * P, C), np.float32)
        xp[tabs["site_flat"]] = x
        xp = xp.reshape(nc, P, C)
        wt = toeplitz_w(w27, P, C, C)
        jt = {k: jnp.asarray(v) for k, v in tabs.items()
              if isinstance(v, np.ndarray)}
        out = np.asarray(packed_conv(jnp.asarray(xp), jnp.asarray(wt),
                                     jt, P))
        got = out.reshape(-1, C)[tabs["site_flat"]]
        err = np.abs(got - ref).max()
        print(f"P={P}: allclose max err {err:.2e}", flush=True)
        assert err < 1e-3, "formulation mismatch"

        xpj = jnp.asarray(xp)
        w9j = jnp.asarray(wt)

        def step(c, xpj=xpj, w9j=w9j, jt=jt, P=P):
            o = packed_conv(xpj + c, w9j, jt, P)
            return jnp.float32(jnp.sum(o[0, 0]) * 1e-20)

        scan_time(f"packed conv P={P} (L1, C=32)", step, jnp.float32(0.0))

    xsj = jnp.asarray(xpad_sites)
    nbrj = jnp.asarray(nbr)
    w27j = jnp.asarray(w27)

    def step_ref(c):
        o = sc.sparse_conv_matmul(sc.gather_taps(xsj + c, nbrj), w27j)
        return jnp.float32(jnp.sum(o[0]) * 1e-20)

    scan_time("current 27-tap conv (L1, C=32)", step_ref, jnp.float32(0.0))


if __name__ == "__main__":
    main()
