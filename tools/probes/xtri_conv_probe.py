"""Probe: w-triple packed submanifold conv vs the 27-tap gather conv.

Idea: gathers are row-COUNT bound (~3 ns/row at 128-512 B), so pack the
three w-taps of each (dd, dh) column into ONE gathered row. Build
xtri[q] = [x[w-left(q)] | x[q] | x[w-right(q)]]  (2 extra S-row gathers),
then gather 9 rows per site (one per (dd, dh), at the (dd,dh,0) neighbor)
of width 3C, and contract with the block-reshaped kernel. Entries whose
(dd,dh,0) center is missing but a (dd,dh,+-1) neighbor exists are fixed up
from per-tap compact lists (measured 0.5-1.3 rows/site).

Rows per conv: 11*S + fix (~12.3*S) vs 27*S.

Usage: python tools/probes/xtri_conv_probe.py [lvl] [C] [N]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from neuralbody_tpu.ops import sparse_conv as sc
from neuralbody_tpu.utils.synthetic import make_batch

lvl = int(sys.argv[1]) if len(sys.argv) > 1 else 1
C = int(sys.argv[2]) if len(sys.argv) > 2 else 32
N = int(sys.argv[3]) if len(sys.argv) > 3 else 32


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
    print(f"{name}: {min(ts)/n*1000:.3f} ms/iter (compile {compile_s:.1f}s)",
          flush=True)
    return min(ts) / n


# --------------------------------------------------------------------------
# host: xtri tables (prototype of the engine builder)
# --------------------------------------------------------------------------

def build_xtri_tables(sites, sh, cap, fix_round=32):
    """sites [S,3] (sorted by code) -> dict:
    lnbr/rnbr [cap]  w-neighbor rows (sentinel cap)
    nbr9 [9, cap]    (dd,dh,0)-neighbor rows (sentinel cap)
    fix_tap [18]     tap ids (k with dw!=0) — implicit, ordered
    fix_s  [18, F]   output rows needing fixup (sentinel cap)
    fix_src[18, F]   source site rows (sentinel cap)
    """
    S = len(sites)
    lk = sc._SiteLookup(sites, sh)
    nbr = sc.subm_table(sites, lk)          # [S, 27], -1 missing
    lr = {}
    for dw, name in ((-1, "lnbr"), (1, "rnbr")):
        q = sites.copy()
        q[:, 2] += dw
        r = lk(q)
        lr[name] = np.where(r < 0, cap, r).astype(np.int32)
        lr[name] = np.concatenate(
            [lr[name], np.full(cap - S, cap, np.int32)])
    nbr9 = np.full((9, cap), cap, np.int32)
    fix_s, fix_src = [], []
    t = 0
    for k in range(27):
        dw = k % 3 - 1
        if dw == 0:
            r = nbr[:, k]
            nbr9[t, :S] = np.where(r < 0, cap, r)
            t += 1
        else:
            k0 = k - dw
            # fixup: tap exists but the (dd,dh,0) center is missing, so the
            # xtri row read at the center can't supply it
            bad = (nbr[:, k] >= 0) & (nbr[:, k0] < 0)
            fix_s.append(np.flatnonzero(bad).astype(np.int32))
            fix_src.append(nbr[bad, k].astype(np.int32))
    F = max(max((len(f) for f in fix_s), default=0), 1)
    F = -(-F // fix_round) * fix_round
    fs = np.full((18, F), cap, np.int32)
    fc = np.full((18, F), cap, np.int32)
    for i, (s_, c_) in enumerate(zip(fix_s, fix_src)):
        fs[i, :len(s_)] = s_
        fc[i, :len(c_)] = c_
    return dict(lnbr=lr["lnbr"], rnbr=lr["rnbr"], nbr9=nbr9,
                fix_s=fs, fix_src=fc)


def w9_from_w27(w27):
    """[27, Cin, Cout] -> [9, 3*Cin, Cout]: xtri slot j of column t is
    tap t*3+j (dw = j-1)."""
    k, cin, cout = w27.shape
    return np.ascontiguousarray(
        w27.reshape(9, 3 * cin, cout))


FIX_TAPS = np.array([k for k in range(27) if k % 3 != 1], np.int32)


def xtri_conv(x, w9, w27_fix, tabs):
    """x [cap, Cin] (padded rows zero) -> [cap, Cout].

    w9: [9, 3Cin, Cout]; w27_fix: [18, Cin, Cout] (the dw!=0 taps).
    """
    cap, Cin = x.shape
    xpad = jnp.concatenate([x, jnp.zeros((1, Cin), x.dtype)])
    xl = xpad[tabs["lnbr"]]
    xr = xpad[tabs["rnbr"]]
    xtri = jnp.concatenate([xl, x, xr], axis=-1)        # [cap, 3Cin]
    xtri = jnp.concatenate(
        [xtri, jnp.zeros((1, 3 * Cin), x.dtype)])
    g9 = xtri[tabs["nbr9"]]                              # [9, cap, 3Cin]
    out = jax.lax.dot_general(
        g9, w9, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [9, cap, Cout]
    out = jnp.sum(out, axis=0)
    # fixup: compact per-tap gather+matmul, scatter-added at the end
    xf = xpad[tabs["fix_src"]]                           # [18, F, Cin]
    yf = jax.lax.dot_general(
        xf, w27_fix, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # [18, F, Cout]
    Cout = out.shape[-1]
    opad = jnp.concatenate([out, jnp.zeros((1, Cout), out.dtype)])
    opad = opad.at[tabs["fix_s"].reshape(-1)].add(
        yf.reshape(-1, Cout), mode="drop")
    return opad[:cap]


def main():
    batch, static = make_batch(n_rays=8, n_verts=6890, voxel_size=0.005,
                               seed=0)
    geom = {k: np.asarray(v[0]) for k, v in batch["geom"].items()}
    nsite = int(geom[f"nsite{lvl}"])
    cap = static["site_caps"][lvl]
    sh = np.asarray(static["out_sh"], np.int64) // (2 ** lvl)
    sites = geom[f"sites{lvl}"][:nsite]

    rng = np.random.RandomState(1)
    x = np.zeros((cap, C), np.float32)
    x[:nsite] = rng.randn(nsite, C).astype(np.float32) * 0.1
    w27 = rng.randn(27, C, C).astype(np.float32) * 0.1

    tabs = build_xtri_tables(sites, sh, cap)
    nfix = int((tabs["fix_s"] != cap).sum())
    print(f"L{lvl} S={nsite} cap={cap} C={C}: fix entries {nfix} "
          f"({nfix/nsite:.2f}/site), rows {11*cap + 18*tabs['fix_s'].shape[1]}"
          f" vs {27*cap}", flush=True)

    ref = np.asarray(sc.sparse_conv_matmul(
        sc.gather_taps(jnp.asarray(x), jnp.asarray(geom[f"nbr{lvl}"])),
        jnp.asarray(w27)))
    jt = {k: jnp.asarray(v) for k, v in tabs.items()}
    w9 = jnp.asarray(w9_from_w27(w27))
    wfix = jnp.asarray(w27[FIX_TAPS])
    got = np.asarray(xtri_conv(jnp.asarray(x), w9, wfix, jt))
    err = np.abs(got - ref).max()
    print(f"allclose max err {err:.2e}", flush=True)
    assert err < 1e-4

    xj = jnp.asarray(x)
    nbrj = jnp.asarray(geom[f"nbr{lvl}"])
    w27j = jnp.asarray(w27)

    def step_ref(c):
        o = sc.sparse_conv_matmul(sc.gather_taps(xj + c, nbrj), w27j)
        return jnp.float32(jnp.sum(o[0]) * 1e-20)

    def step_xtri(c):
        o = xtri_conv(xj + c, w9, wfix, jt)
        return jnp.float32(jnp.sum(o[0]) * 1e-20)

    a = scan_time(f"current 27-tap conv (L{lvl}, C={C})", step_ref,
                  jnp.float32(0.0))
    b = scan_time(f"xtri conv        (L{lvl}, C={C})", step_xtri,
                  jnp.float32(0.0))
    print(f"speedup {a/b:.2f}x", flush=True)


if __name__ == "__main__":
    main()
