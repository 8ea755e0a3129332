"""Block-size sweep for the fused tendency mega-kernel (TPU-only).

Times the full BOMEX SSP-RK3 step for (bz, by) combinations via the
BREEZE_TPU_TEND_BZ/BY overrides (read at trace time), amortized inside one
dispatch.  One process, one tunnel registration.

Usage: python tools/sweep_tend_blocks.py [--size 256x256x256] [--steps 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="256x256x256")
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()
    nx, ny, nz = (int(s) for s in args.size.split("x"))

    import bench
    from breeze_tpu.timesteppers import ssp_rk3_step

    class _Args:
        svp = "flatau"

    grid, model, state = bench._build_bomex(_Args(), nx, ny, nz)
    npts = nx * ny * nz
    print("devices:", jax.devices(), flush=True)

    combos = [(None, None), (8, 16), (8, 32), (8, 64), (16, 16), (16, 32),
              (16, 64), (4, 32)]
    for bz, by in combos:
        for k in ("BREEZE_TPU_TEND_BZ", "BREEZE_TPU_TEND_BY"):
            os.environ.pop(k, None)
        if bz is not None:
            os.environ["BREEZE_TPU_TEND_BZ"] = str(bz)
            os.environ["BREEZE_TPU_TEND_BY"] = str(by)
        try:
            fn = jax.jit(lambda m, s: jax.lax.fori_loop(
                0, args.steps, lambda _, st: ssp_rk3_step(m, st, 1.0), s))
            out = fn(model, state)
            float(jnp.sum(out.rho_theta))
            t0 = time.perf_counter()
            out = fn(model, state)
            float(jnp.sum(out.rho_theta))
            dt = (time.perf_counter() - t0) / args.steps
            tag = "default" if bz is None else f"bz={bz} by={by}"
            print(f"{tag:14s}: {dt*1e3:7.2f} ms/step  "
                  f"{npts/dt/1e6:6.0f} M pts/s", flush=True)
        except Exception as e:  # Mosaic compile failures at bad shapes
            print(f"bz={bz} by={by}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    for k in ("BREEZE_TPU_TEND_BZ", "BREEZE_TPU_TEND_BY"):
        os.environ.pop(k, None)


if __name__ == "__main__":
    main()
