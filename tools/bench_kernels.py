"""Per-kernel measured-vs-roofline numbers on the real chip (TPU-only).

Substantiates (or refutes) the "WENO kernels >=70% of HBM roofline" north
star (BASELINE.md) with per-kernel measurements: each hot kernel is timed
amortized inside one dispatch (lax.fori_loop — the axon tunnel's ~0.9 ms
dispatch overhead would otherwise dominate), and compared against its HBM
traffic roofline.

Roofline accounting counts *actual* HBM transits: kernel DMA windows
overlap by the halo, so reads are (bz+2H)(by+2HY)/(bz*by) x the field
size, not 1x.  Results feed the table in docs/kernels.md.

Usage: python tools/bench_kernels.py [--size 256x256x128] [--loops 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBPS = 819.0   # v5e peak HBM bandwidth (16 GB @ 819 GB/s)


def amortized_time(fn, state, n):
    """Time n applications of fn inside ONE dispatch via lax.fori_loop."""
    looped = jax.jit(lambda s: jax.lax.fori_loop(
        0, n, lambda i, x: fn(x), s))
    out = looped(state)
    float(jnp.sum(jax.tree.leaves(out)[0]))   # readback sync
    t0 = time.perf_counter()
    out = looped(state)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="256x256x128")
    p.add_argument("--loops", type=int, default=50)
    args = p.parse_args()
    nx, ny, nz = (int(s) for s in args.size.split("x"))

    import breeze_tpu as bz
    from breeze_tpu import fields as fl
    from breeze_tpu import model as M
    from breeze_tpu.pallas_kernels import advection as padv
    from breeze_tpu.pallas_kernels import momentum as pmom
    from breeze_tpu.pallas_kernels.advection import H, HY

    grid = bz.make_grid(size=(nx, ny, nz), extent=(12800., 12800., 3200.),
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                        halo=3, dtype=jnp.float32)
    model = bz.make_model(grid, advection=bz.WENO(5),
                          potential_temperature=300.0)
    rng = np.random.default_rng(0)
    r = lambda: jnp.asarray(rng.normal(size=grid.shape), jnp.float32)
    u, v, w, c = r(), r(), r().at[0].set(0.0), 300.0 + r()
    rho = jnp.broadcast_to(model.reference.rho_col, grid.shape).astype(jnp.float32)

    field_mb = nz * ny * nx * 4 / 1e6
    bz_blk = pmom._pick_block(nz, (8, 16, 4))
    by_blk = pmom._pick_block(ny, (32, 16, 8, 64))
    overlap = ((bz_blk + 2 * H) * (by_blk + 2 * HY)) / (bz_blk * by_blk)
    npts = nx * ny * nz
    n = args.loops

    print(f"size {nx}x{ny}x{nz}  field {field_mb:.1f} MB  "
          f"block ({bz_blk},{by_blk})  DMA overlap {overlap:.2f}x  "
          f"HBM roofline {HBM_GBPS} GB/s")
    rows = []

    def report(name, t, transits, flops_per_pt=None):
        gb = transits * field_mb / 1e3
        t_roof = gb / HBM_GBPS * 1e3          # ms
        pct = 100.0 * t_roof / (t * 1e3)
        line = (f"{name:28s} {t*1e3:7.3f} ms  traffic {gb*1e3:7.0f} MB "
                f"({transits:5.2f} transits)  roofline {t_roof:6.3f} ms  "
                f"-> {pct:5.1f}% of HBM roofline")
        if flops_per_pt:
            gflops = flops_per_pt * npts / t / 1e9
            line += f"  ({gflops:7.1f} GFLOP/s VPU)"
        print(line, flush=True)
        rows.append((name, t * 1e3, pct))

    pz = lambda a, loc: padv.pad_zy(a, grid, loc)
    pzu, pzv, pzw, pzc = pz(u, fl.CCF), pz(v, fl.CFC), pz(w, fl.FCC), pz(c, fl.CCC)
    pzrho = pz(rho, fl.CCC)
    colc, colf = M._padded_reference_columns(model, halo=pmom.H)

    # --- momentum cols kernel: 3 windowed reads + 3 writes -----------------
    def mom_cols(args_):
        a, b_, ww = args_
        du, dv, dw = pmom.momentum_div_pallas_cols(grid, a, b_, ww, colc, colf)
        # feed outputs back (keeps the loop a chain; pads are cheap constants)
        return (a, b_, ww + 0.0 * pz(dw, fl.FCC))
    t = amortized_time(mom_cols, (pzu, pzv, pzw), n)
    # transits: 3 overlapping window reads + 3 outputs + w feedback pad (~2.2)
    report("momentum WENO (cols)", t, 3 * overlap + 3 + 2.2, flops_per_pt=650)

    # --- scalar kernel: 5 windowed reads + 1 write -------------------------
    def scal(args_):
        cc, uu, vv, ww, rr = args_
        d = padv.div_rho_u_c_pallas(grid, cc, uu, vv, ww, rr)
        return (cc + 0.0 * pz(d, fl.CCC), uu, vv, ww, rr)
    t = amortized_time(scal, (pzc, pzu, pzv, pzw, pzrho), n)
    report("scalar WENO div", t, 5 * overlap + 1 + 2.2, flops_per_pt=230)

    # --- pad_zy alone -------------------------------------------------------
    def pads(x):
        return pz(x[H:-H, HY:-HY, :], fl.CCC)
    t = amortized_time(pads, pzc, n)
    report("pad_zy (2 concats)", t, 2 + 2 * (1 + 6 / nz) * (1 + 8 / ny))

    # --- full tendency stage (dry) ------------------------------------------
    state = bz.initial_state(model, theta=lambda x, y, z: 300.0 + 0.5 * jnp.exp(
        -((x - 6400.0)**2 + (y - 6400.0)**2 + (z - 800.0)**2) / 500.0**2))

    def tend(s):
        # consume EVERY output (a partially-consumed G lets XLA dead-code
        # eliminate whole kernels and fake the number)
        G = M.compute_tendencies(model, s)
        return s.replace(rho_u=s.rho_u + 1e-6 * G.rho_u,
                         rho_v=s.rho_v + 1e-6 * G.rho_v,
                         rho_w=s.rho_w + 1e-6 * G.rho_w,
                         rho_theta=s.rho_theta + 1e-6 * G.rho_theta)
    t = amortized_time(tend, state, n)
    print(f"{'tendency stage (dry)':28s} {t*1e3:7.3f} ms  "
          f"({npts / t / 1e6:.0f} M pts/s per stage)", flush=True)

    def step(s):
        from breeze_tpu.timesteppers import ssp_rk3_step
        return ssp_rk3_step(model, s, 0.5)
    t = amortized_time(step, state, n)
    print(f"{'full SSP-RK3 step':28s} {t*1e3:7.3f} ms  "
          f"({npts / t / 1e6:.0f} M pts/s)", flush=True)

    # --- projection ---------------------------------------------------------
    def proj(s):
        ru, rv, rw, _ = M.pressure_projection(model, s.rho_u, s.rho_v,
                                              s.rho_w, 0.5)
        return s.replace(rho_u=ru, rho_v=rv, rho_w=rw)
    t = amortized_time(proj, state, n)
    print(f"{'projection (pads+div+fft+gc)':28s} {t*1e3:7.3f} ms", flush=True)

    def solve(s):
        phi = model.solver.solve(s.rho_theta, 0.5)
        return s.replace(rho_theta=s.rho_theta + 0.0 * phi)
    t = amortized_time(solve, state, n)
    print(f"{'poisson solve':28s} {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
