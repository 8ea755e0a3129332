"""Direction-isolated WENO5 cost on the real chip (TPU-only).

Round-4 analysis (docs/kernels.md, docs/perf_bomex_256_r4.md) attributes the
mega-kernel's ~2x gap to the VPU arithmetic bound to "sublane-offset
relayouts in the y-direction stencils" — but that attribution was inferred,
never measured in isolation.  This tool measures it: one Pallas kernel per
direction, each computing the SAME scalar WENO5 flux (+ divergence) with the
SAME window-DMA structure and block shapes as the production kernels, so the
per-direction time difference IS the layout overhead:

- x: lane-resident (pltpu.roll on lanes)          — production x path
- z: outer-dim slices (no relayout by definition) — production z path
- y_slice: misaligned sublane slices              — production y path
- y_roll: full-window sublane rolls + ONE final misaligned slice pair —
  candidate replacement (arithmetic on all wy rows, wy/(by+1) waste, but 6
  neighbor accesses become rolls of one aligned base instead of 6
  independent misaligned slices)
- y_stage: neighbor slices STAGED once through VMEM scratch at aligned
  offsets, formula reads aligned rows — candidate replacement 2

Usage: python tools/bench_ydir.py [--size 256x256x256] [--loops 30]
Results land in tpu_verify_queue.log via tools/tpu_verify_queue.py or can be
pasted into docs/kernels.md.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from breeze_tpu.pallas_kernels.advection import (H, HY, _weno_face,
                                                 prefetch_windows)


def _make_dir_kernel(direction, bz, by, nx, mode="slice", n_zblocks=0,
                     n_yblocks=0):
    wz, wy = bz + 2 * H, by + 2 * HY

    def kernel(c_hbm, m_hbm, out_ref, c_w, m_w, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        slot = prefetch_windows((c_hbm, m_hbm), (c_w, m_w), sems, i, j,
                                bz, by, wz, wy, n_zblocks, n_yblocks)
        c = c_w[slot]
        m = m_w[slot]

        def s(a, zo, yo):
            return a[H + zo: H + zo + bz, HY + yo: HY + yo + by, :]

        if direction == "x":
            def xs(a, o):
                return pltpu.roll(a, (-o) % nx, 2) if o % nx else a
            cs = s(c, 0, 0)
            mf = s(m, 0, 0)
            F = mf * _weno_face(lambda o: xs(cs, o - 1), mf)
            out_ref[:] = (xs(F, 1) - F)
        elif direction == "z":
            def sz(a, z0, yo):
                return a[H + z0: H + z0 + bz + 1, HY + yo: HY + yo + by, :]
            mf = sz(m, -1, 0)
            F = mf * _weno_face(lambda o: sz(c, o - 1, 0), mf)
            out_ref[:] = F[1:, :, :] - F[:-1, :, :]
        elif direction == "y" and mode == "slice":
            def sy(a, zo, y0):
                return a[H + zo: H + zo + bz, HY + y0: HY + y0 + by + 1, :]
            mf = sy(m, 0, 0)
            F = mf * _weno_face(lambda o: sy(c, 0, o - 1), mf)
            out_ref[:] = F[:, 1:, :] - F[:, :-1, :]
        elif direction == "y" and mode == "roll":
            # Full-window formulation: neighbor access via sublane rolls of
            # the ALIGNED window (no wrap contamination: rows HY..HY+by
            # only reference rows 1..wy-1 for offsets -3..3 since HY=4),
            # WENO arithmetic on all wy rows, ONE misaligned slice pair at
            # the end.  cell(o) for face row mm is window row mm-1+o.
            cz = c[H: H + bz, :, :]
            mz = m[H: H + bz, :, :]
            def cell(o):
                sh = o - 1
                return pltpu.roll(cz, (-sh) % wy, 1) if sh % wy else cz
            mf = mz                                   # faces at all rows
            F = mf * _weno_face(cell, mf)
            out_ref[:] = (F[:, HY + 1: HY + by + 1, :]
                          - F[:, HY: HY + by, :])
    return kernel


@functools.partial(jax.jit, static_argnames=("direction", "mode", "nz", "ny",
                                             "nx", "bz", "by"))
def _run_dir(c_pad, m_pad, direction, mode, nz, ny, nx, bz, by):
    kernel = _make_dir_kernel(direction, bz, by, nx, mode,
                              n_zblocks=nz // bz, n_yblocks=ny // by)
    wz, wy = bz + 2 * H, by + 2 * HY
    win = lambda: pltpu.VMEM((2, wz, wy, nx), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(nz // bz, ny // by),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec((bz, by, nx), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        scratch_shapes=[win(), win(), pltpu.SemaphoreType.DMA((2, 2))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(c_pad, m_pad)


def amortized(fn, args, n):
    c, m = args

    def body(i, acc):
        # acc feedback keeps the call loop-carried (not hoistable)
        return acc + fn(c + 1e-30 * acc, m)[0, 0, 0]

    looped = jax.jit(lambda: jax.lax.fori_loop(0, n, body, jnp.float32(0.0)))
    float(looped())
    t0 = time.perf_counter()
    float(looped())
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="256x256x256")
    p.add_argument("--loops", type=int, default=30)
    p.add_argument("--bz", type=int, default=16)
    p.add_argument("--by", type=int, default=64)
    args = p.parse_args()
    nx, ny, nz = (int(s) for s in args.size.split("x"))
    bz, by = args.bz, args.by

    rng = np.random.default_rng(0)
    shape = (nz + 2 * H, ny + 2 * HY, nx)
    c = jnp.asarray(rng.normal(size=shape) * 0.01 + 300.0, jnp.float32)
    m = jnp.asarray(rng.normal(size=shape), jnp.float32)

    print(f"# bench_ydir {nx}x{ny}x{nz} blocks ({bz},{by}) "
          f"loops={args.loops} device={jax.devices()[0].device_kind}")
    results = {}
    for name, (d, mode) in {
        "x (lane rolls)": ("x", "slice"),
        "z (outer slices)": ("z", "slice"),
        "y slice (production)": ("y", "slice"),
        "y roll (full-window)": ("y", "roll"),
    }.items():
        fn = lambda cc, mm: _run_dir(cc, mm, d, mode, nz, ny, nx, bz, by)
        t = amortized(fn, (c, m), args.loops)
        results[name] = t
        print(f"{name:24s} {t * 1e3:7.3f} ms")
    base = results["z (outer slices)"]
    for name, t in results.items():
        print(f"{name:24s} {t / base:5.2f}x of z")


if __name__ == "__main__":
    main()
