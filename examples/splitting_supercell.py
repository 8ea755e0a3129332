"""Splitting supercell — 3-D deep moist convection with Kessler microphysics
(reference examples/splitting_supercell.jl, DCMIP2016 / Klemp et al. 2015;
BASELINE config 5).

A warm bubble in a sheared, conditionally-unstable sounding develops into a
storm whose updraft splits under the shear-induced pressure gradients.

Run:  python examples/splitting_supercell.py [--quick]
"""

import argparse

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.physics.kessler import KesslerMicrophysics
from breeze_tpu.simulation import IterationInterval, Simulation


def weisman_klemp_sounding(z, theta_0=300.0, theta_tr=343.0, z_tr=12_000.0,
                           T_tr=213.0):
    """Weisman & Klemp (1982) analytic θ(z) sounding."""
    z = np.asarray(z, np.float64)
    theta = np.where(
        z <= z_tr,
        theta_0 + (theta_tr - theta_0) * (z / z_tr) ** 1.25,
        theta_tr * np.exp(9.81 / (1005.0 * T_tr) * (z - z_tr)))
    return theta


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    if args.quick:
        n, nz, stop = 32, 16, 120.0
    else:
        n, nz, stop = 128, 40, 3600.0

    grid = bz.make_grid(size=(n, n, nz), extent=(80_000.0, 80_000.0, 20_000.0),
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                        halo=3, dtype=jnp.float32)

    theta_prof = lambda zz: float(weisman_klemp_sounding(np.array([zz]))[0])
    model = bz.make_model(
        grid, advection=bz.WENO(5),
        potential_temperature=theta_prof,
        microphysics=KesslerMicrophysics())

    def theta0(x, y, z):
        base = jnp.asarray(weisman_klemp_sounding(np.asarray(
            jnp.broadcast_to(z, (grid.nz, 1, 1)))), jnp.float32)
        base = jnp.broadcast_to(base, grid.shape)
        r = jnp.sqrt(((x - 40_000.0) / 10_000.0) ** 2
                     + ((y - 40_000.0) / 10_000.0) ** 2
                     + ((z - 1_500.0) / 1_500.0) ** 2)
        return base + 3.0 * jnp.maximum(0.0, jnp.cos(0.5 * jnp.pi * jnp.minimum(r, 1.0))) ** 2

    def qt0(x, y, z):
        # moist boundary layer capped at 14 g/kg (WK82-like)
        return jnp.minimum(0.014, 0.014 * jnp.exp(-z / 3_000.0) + 1e-4)

    def u0(x, y, z):
        # half-circle hodograph approximation: westerly shear over 5 km
        return jnp.where(z < 5_000.0, -12.0 + 24.0 * z / 5_000.0, 12.0)

    state = bz.initial_state(model, theta=theta0, qt=qt0, u=u0)

    sim = Simulation(model, state, dt=2.0 if args.quick else 4.0, stop_time=stop)

    def progress(s):
        aux = bz.diagnose(s.model, s.state)
        qr = s.state.tracers["rho_qr"]
        print(f"  t={s.time:7.0f}s  max w={float(aux.w.max()):6.2f} m/s  "
              f"max qʳ={float(qr.max() / model.reference.rho_c[0]) * 1e3:.2f} g/kg")

    sim.add_callback(progress, IterationInterval(25))
    sim.run()


if __name__ == "__main__":
    main()
