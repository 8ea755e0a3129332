"""Measured x-prepad sharded-kernel overhead on the real chip (TPU-only).

The sharded kernel mode (1-D x / 2-D ``Partition``) runs the SAME fused
tendency kernel at lane width ``nx_local + 2·HX`` (HX=128) and slices the
interior back out — the per-shard cost of keeping the kernels alive under
an x decomposition.  Only one chip exists here, so the overhead is
measured directly: the dense kernel at ``nx`` vs the x-prepadded variant
at the same ``nx`` (exactly what one shard of an x-sharded run executes;
the ppermute that would FILL the pad is timed separately by
``bench_scaling.py --collective-share``).

Usage: python tools/bench_xpad.py [--size 256x256x128] [--loops 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def amortized(fn, args, n):
    looped = jax.jit(lambda a: jax.lax.fori_loop(
        0, n, lambda i, x: fn(x), a))
    out = looped(args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    out = looped(args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="256x256x128",
                   help="LOCAL shard size (z last)")
    p.add_argument("--loops", type=int, default=30)
    args = p.parse_args()
    nx, ny, nz = (int(s) for s in args.size.split("x"))

    import breeze_tpu as bz
    from breeze_tpu import fields as fl
    from breeze_tpu import model as M
    from breeze_tpu.pallas_kernels import advection as padv
    from breeze_tpu.pallas_kernels import tendency as ptend
    from breeze_tpu.pallas_kernels.momentum import H as PH

    grid = bz.make_grid(size=(nx, ny, nz), extent=(50. * nx, 50. * ny, 3200.),
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                        halo=3, dtype=jnp.float32)
    model = bz.make_model(grid, advection=bz.WENO(5),
                          potential_temperature=300.0)
    rng = np.random.default_rng(0)
    r = lambda: jnp.asarray(rng.normal(size=grid.shape), jnp.float32)
    u, v, w = r(), r(), r().at[0].set(0.0)
    th = 300.0 + r()
    col_c, col_f = M._padded_reference_columns(model, halo=PH)
    buoy_cols = M._dry_buoyancy_columns(model, halo=PH)
    npts = nx * ny * nz
    n = args.loops

    def run(hx):
        if hx:
            pz = lambda a, loc: padv.pad_zy(padv.pad_x(a, grid, loc),
                                            grid, loc)
        else:
            pz = lambda a, loc: padv.pad_zy(a, grid, loc)

        def body(arrs):
            uu, vv, ww, tt = arrs
            gu, gv, gw, gs = ptend.fused_tendency_pallas(
                grid, pz(uu, fl.CCF), pz(vv, fl.CFC), pz(ww, fl.FCC),
                [pz(tt, fl.CCC)], col_c, col_f, coriolis_f=1e-4,
                buoy_cols=buoy_cols, hx=hx)
            return (uu + 1e-6 * gu, vv + 1e-6 * gv, ww + 1e-6 * gw,
                    tt + 1e-6 * gs[0])
        return amortized(body, (u, v, w, th), n)

    t_dense = run(0)
    t_xpad = run(padv.HX)
    print(f"local size {nx}x{ny}x{nz}  HX={padv.HX}")
    print(f"dense kernel stage : {t_dense*1e3:7.3f} ms "
          f"({npts/t_dense/1e6:.0f} M pts/s)")
    print(f"x-prepad stage     : {t_xpad*1e3:7.3f} ms "
          f"({npts/t_xpad/1e6:.0f} M pts/s)")
    print(f"x-prepad overhead  : {100.0*(t_xpad/t_dense-1.0):+.1f}%  "
          f"(lane width {nx}+{2*padv.HX})")


if __name__ == "__main__":
    main()
