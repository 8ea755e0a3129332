"""Idealized tropical cyclone on an f-plane — anelastic moist dynamics with
warm-rain microphysics and azimuthal-mean diagnostics
(reference examples/tropical_cyclone_with_rainband.jl capability).

A warm-core vortex in a moist environment intensifies through surface
enthalpy fluxes (WISHE-like); azimuthal means show the developing
tangential-wind and rainband structure.

Run:  python examples/tropical_cyclone.py [--quick]
"""

import argparse

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.diagnostics import azimuthal_mean
from breeze_tpu.physics.closures import SmagorinskyLilly
from breeze_tpu.physics.kessler import KesslerMicrophysics
from breeze_tpu.physics.surface import BulkSurfaceFluxes
from breeze_tpu.simulation import IterationInterval, Simulation


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    n, nz, stop = (32, 10, 120.0) if args.quick else (128, 30, 6 * 3600.0)
    L = 200_000.0
    grid = bz.make_grid(size=(n, n, nz), extent=(L, L, 15_000.0),
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                        halo=3, dtype=jnp.float32)

    f = 5.0e-5
    model = bz.make_model(
        grid, advection=bz.WENO(5), potential_temperature=300.0,
        microphysics=KesslerMicrophysics(),
        closure=SmagorinskyLilly(),
        coriolis=bz.FPlane(f=f),
        boundary_fluxes=BulkSurfaceFluxes(
            surface_temperature=302.0, stability_correction=True,
            drag_coefficient=2.0e-3, heat_transfer_coefficient=1.3e-3,
            vapor_transfer_coefficient=1.3e-3))

    x0 = y0 = L / 2
    r_max = 25_000.0

    def theta0(x, y, z):
        r = jnp.sqrt((x - x0) ** 2 + (y - y0) ** 2)
        warm_core = 3.0 * jnp.exp(-r ** 2 / (2 * r_max ** 2)) * jnp.exp(-z / 8_000.0)
        strat = 3.0e-3 * jnp.maximum(z - 2_000.0, 0.0)
        return 300.0 + strat + warm_core

    def tangential(x, y, z, sign_x):
        r = jnp.sqrt((x - x0) ** 2 + (y - y0) ** 2) + 1.0
        v_t = 15.0 * (r / r_max) * jnp.exp(0.5 * (1.0 - (r / r_max) ** 2))
        v_t = v_t * jnp.exp(-z / 8_000.0)
        return sign_x * v_t * ((y - y0) if sign_x < 0 else (x - x0)) / r

    state = bz.initial_state(
        model,
        theta=theta0,
        qt=lambda x, y, z: 0.018 * jnp.exp(-z / 2_500.0),
        u=lambda x, y, z: tangential(x, y, z, -1.0),
        v=lambda x, y, z: tangential(x, y, z, +1.0))

    sim = Simulation(model, state, dt=2.0 if args.quick else 5.0, stop_time=stop)

    def progress(s):
        aux = bz.diagnose(s.model, s.state)
        v_t = jnp.sqrt(aux.u ** 2 + aux.v ** 2)
        qr = s.state.tracers["rho_qr"]
        print(f"  t={s.time:7.0f}s  max wind={float(v_t.max()):5.1f} m/s  "
              f"max qʳ={float(qr.max()) * 1e3:.2f} g·m⁻³")

    sim.add_callback(progress, IterationInterval(20))
    sim.run()

    # azimuthal-mean structure (reference azimuthal_mean.jl capability)
    aux = bz.diagnose(model, sim.state)
    v_t = np.asarray(jnp.sqrt(aux.u ** 2 + aux.v ** 2))
    r_c, mean_wind = azimuthal_mean(v_t, grid, x0, y0)
    k_low = 1
    i_max = int(np.argmax(mean_wind[k_low]))
    print(f"azimuthal-mean max wind {mean_wind[k_low].max():.1f} m/s "
          f"at r = {r_c[i_max] / 1000:.0f} km")


if __name__ == "__main__":
    main()
