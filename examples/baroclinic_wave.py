"""Baroclinic wave on a latitude-longitude sphere — compressible dynamics
(reference examples/baroclinic_wave.jl, DCMIP2016-inspired setup).

A mid-latitude zonal jet with a localized perturbation develops a growing
baroclinic wave; integrates the split-explicit compressible core on a
spherical grid with full Coriolis.

Run:  python examples/baroclinic_wave.py [--quick]
"""

import argparse

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.dynamics.compressible import (
    SplitExplicitTimeDiscretization, acoustic_rk3_step, compressible_diagnose,
    compressible_initial_state, make_compressible_model)
from breeze_tpu.grid import make_latlon_grid
from breeze_tpu.physics.coriolis import HydrostaticSphericalCoriolis


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    if args.quick:
        nx, ny, nz, hours, dt = 48, 20, 10, 0.25, 15.0
    else:
        nx, ny, nz, hours, dt = 180, 80, 32, 12.0, 60.0

    grid = make_latlon_grid((nx, ny, nz), longitude=(0.0, 360.0),
                            latitude=(-75.0, 75.0), z=(0.0, 12_000.0),
                            dtype=jnp.float64 if args.quick else jnp.float32)

    N2, g_acc = 1.2e-4, 9.81
    theta_bar = lambda z: 288.0 * np.exp(N2 / g_acc * z)

    model = make_compressible_model(
        grid, advection=bz.WENO(5),
        reference_potential_temperature=theta_bar,
        coriolis=HydrostaticSphericalCoriolis(),
        time_discretization=SplitExplicitTimeDiscretization(
            substeps=None, acoustic_cfl=0.5))

    def theta0(lon, lat, z):
        base = 288.0 * jnp.exp(N2 / g_acc * z)
        # meridional baroclinicity + localized Gaussian perturbation (wave seed)
        dT = -6.0 * jnp.sin(lat) ** 2
        pert = 1.0 * jnp.exp(-((lon - 0.5) ** 2 + (lat - 0.7) ** 2) / 0.05)
        return base + dT + pert

    def u0(lon, lat, z):
        # idealized westerly jet peaked at mid-latitudes
        return 15.0 * jnp.sin(2.0 * lat) ** 2 * jnp.cos(lat) * (z / 12_000.0 + 0.3)

    state = compressible_initial_state(model, theta=theta0, u=u0)

    n_steps = int(hours * 3600.0 / dt)
    for i in range(n_steps):
        state = acoustic_rk3_step(model, state, dt)
        if i % max(1, n_steps // 10) == 0:
            aux = compressible_diagnose(model, state)
            print(f"  t={float(state.time) / 3600.0:6.2f} h  "
                  f"max|u|={float(jnp.abs(aux.u).max()):6.2f}  "
                  f"max|w|={float(jnp.abs(aux.w).max()):6.3f}")

    aux = compressible_diagnose(model, state)
    assert bool(jnp.all(jnp.isfinite(aux.u)))
    print(f"done: {n_steps} steps, max wind {float(jnp.abs(aux.u).max()):.1f} m/s")


if __name__ == "__main__":
    main()
