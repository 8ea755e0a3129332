"""TPU-only sweep of the K3 multi-substep acoustic kernel's (by, n_inner)
block geometry at the benchmark size.  Timing amortized inside one dispatch
(the axon tunnel's ~0.9 ms dispatch overhead) with a device→host readback.

Usage: python tools/sweep_k3_blocks.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import breeze_tpu as bz
    from breeze_tpu.dynamics.compressible import (
        SplitExplicitTimeDiscretization, compressible_diagnose,
        compressible_initial_state, make_compressible_model,
        slow_tendencies, stage_caches)
    from breeze_tpu.pallas_kernels import acoustic as pac
    from breeze_tpu.pallas_kernels.advection import bcast_col

    print("devices:", jax.devices(), flush=True)
    g = bz.make_grid(size=(256, 256, 128), extent=(25600.0, 25600.0, 12800.0),
                     topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                     halo=3, dtype=jnp.float32)
    td = SplitExplicitTimeDiscretization(substeps=4, damping_coefficient=0.1)
    model = make_compressible_model(g, advection=bz.Centered(2),
                                    time_discretization=td)
    state = compressible_initial_state(model, pressure_balanced=False)
    aux = compressible_diagnose(model, state)
    caches = stage_caches(model, state, aux)
    G = slow_tendencies(model, state, aux)
    nz, ny, nx = g.shape
    zero = jnp.zeros(g.shape, jnp.float32)
    inv_dzc = bcast_col(1.0 / jnp.asarray(g.dz_c_meta, jnp.float32), nx)
    inv_dzf = bcast_col(1.0 / jnp.asarray(g.dz_f_meta[:nz], jnp.float32), nx)

    for store in ("bfloat16", "float32"):
        sd = jnp.dtype(store)
        carries0 = tuple(zero.astype(sd) for _ in range(5))
        for by in (8, 16, 32):
            for k in (2, 3, 4, 6):
                if ny % by:
                    continue
                try:
                    def one(carries, k=k, by=by):
                        outs = pac._run_k3(
                            *carries, caches.C_L, caches.theta_L,
                            caches.theta_L_zf, G.rho_u, G.rho_v, G.rho_w,
                            G.rho, G.rho_theta, inv_dzc, inv_dzf,
                            tuple([1.0] * k),
                            by=by, nz=nz, ny=ny, nx=nx, n_inner=k,
                            dx=float(g.dx), dy=float(g.dy), dtau=0.5,
                            omega=0.65, g_acc=9.81, damp_coef=0.1,
                            store=store, interpret=False)
                        return tuple(outs[:5])

                    loops = 6
                    stepped = jax.jit(lambda c: jax.lax.fori_loop(
                        0, loops, lambda i, cc: one(cc), c))
                    out = stepped(carries0)
                    float(jnp.sum(out[4].astype(jnp.float32)))
                    t0 = time.perf_counter()
                    out = stepped(carries0)
                    float(jnp.sum(out[4].astype(jnp.float32)))
                    dt_sub = (time.perf_counter() - t0) / (loops * k)
                    print(f"{store:9s} by={by:3d} k={k}: "
                          f"{dt_sub * 1e3:7.3f} ms/substep", flush=True)
                except Exception as e:
                    print(f"{store:9s} by={by:3d} k={k}: FAIL "
                          f"{type(e).__name__} {str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
