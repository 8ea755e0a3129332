"""Amortized micro-benchmarks of the non-kernel BOMEX stage components
(TPU-only): negative-moisture (Pallas vs jnp closed form), saturation
adjustment (cold vs warm), projection.  One dispatch per measurement
(lax.fori_loop), readback sync.

Usage: python tools/bench_micro.py [--size 256x256x256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def amortized(fn, args, n=30):
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
    p.add_argument("--size", default="256x256x256")
    args = p.parse_args()
    nx, ny, nz = (int(s) for s in args.size.split("x"))

    import bench
    from breeze_tpu import model as M
    from breeze_tpu.pallas_kernels import columnar as pcol
    from breeze_tpu.physics.microphysics import (fix_negative_moisture,
                                                 saturation_adjust)

    class _Args:
        svp = "flatau"

    grid, model, state = bench._build_bomex(_Args(), nx, ny, nz)
    print("devices:", jax.devices(), flush=True)
    aux = jax.jit(M.diagnose)(model, state)
    rng = np.random.default_rng(0)
    rq = state.rho_qt + jnp.asarray(
        rng.normal(0, 2e-4, grid.shape).astype(np.float32))
    dz = grid.dz_c_col

    t = amortized(lambda x: pcol.fix_negative_moisture_pallas(x, dz) + 0.0,
                  rq)
    print(f"negmoist pallas      : {t*1e3:7.3f} ms", flush=True)
    t = amortized(lambda x: fix_negative_moisture(x, dz) + 0.0, rq)
    print(f"negmoist jnp closed  : {t*1e3:7.3f} ms", flush=True)

    theta, qt = aux.theta, aux.qt
    p_col = model.reference.p_col
    c = model.constants
    mp = model.microphysics

    def sat_cold(x):
        T, q = saturation_adjust(x, qt, p_col, c, mp, model.p_standard)
        return x + 0.0 * T + 0.0 * q.liquid

    def sat_warm(x):
        T, q = saturation_adjust(x, qt, p_col, c, mp, model.p_standard,
                                 T_guess=aux.T)
        return x + 0.0 * T + 0.0 * q.liquid

    print(f"sat-adjust cold      : {amortized(sat_cold, theta)*1e3:7.3f} ms",
          flush=True)
    print(f"sat-adjust warm      : {amortized(sat_warm, theta)*1e3:7.3f} ms",
          flush=True)

    def proj(arrs):
        ru, rv, rw = arrs
        ru, rv, rw, _ = M.pressure_projection(model, ru, rv, rw, 1.0)
        return (ru, rv, rw)

    t = amortized(proj, (state.rho_u, state.rho_v, state.rho_w))
    print(f"projection           : {t*1e3:7.3f} ms", flush=True)

    def solve(x):
        return x + 0.0 * model.solver.solve(x, 1.0)

    t = amortized(solve, state.rho_theta)
    print(f"poisson solve        : {t*1e3:7.3f} ms", flush=True)

    def diag(s):
        a = M.diagnose(model, s)
        return s.replace(rho_theta=s.rho_theta + 0.0 * a.T
                         + 0.0 * a.buoyancy_force + 0.0 * a.u)

    t = amortized(diag, state)
    print(f"diagnose cold (full) : {t*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
