"""Radiative-convective equilibrium slab — spectral all-sky radiation
(reference examples/radiative_convection.jl, RRTMGP all-sky).

A 2-D x-z moist slab on a stretched grid: interactive all-sky spectral
radiation (clear bands + cloud optics), bulk surface fluxes against a fixed
SST, saturation adjustment; convection organizes under the radiative
destabilization.

Run:  python examples/radiative_convection.py [--quick]
"""

import argparse

import jax
import jax.numpy as jnp

import breeze_tpu as bz
from breeze_tpu.physics.closures import SmagorinskyLilly
from breeze_tpu.physics.radiation import DiurnalSolarPosition
from breeze_tpu.physics.spectral_radiation import SpectralRadiation
from breeze_tpu.physics.surface import BulkSurfaceFluxes
from breeze_tpu.simulation import Simulation


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    nx = 32 if args.quick else 128
    z_faces = bz.piecewise_stretched_z(
        40 if args.quick else 60, surface_layer_height=3000.0,
        surface_layer_spacing=100.0 if args.quick else 100.0, top=15000.0)
    nz = len(z_faces) - 1
    grid = bz.make_grid(size=(nx, 1, nz), x=(0.0, 12800.0), y=(0.0, 1.0),
                        z=z_faces,
                        topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                        dtype=jnp.float32)

    radiation = SpectralRadiation(
        optics="all", surface_temperature=300.0,
        solar_position=DiurnalSolarPosition(latitude=0.0, day_of_year=80))

    model = bz.make_model(
        grid, advection=bz.WENO(5), potential_temperature=300.0,
        microphysics=bz.SaturationAdjustment(),
        closure=SmagorinskyLilly(),
        boundary_fluxes=BulkSurfaceFluxes(
            surface_temperature=300.0, drag_coefficient=1.2e-3,
            heat_transfer_coefficient=1.2e-3,
            vapor_transfer_coefficient=1.2e-3, gustiness=1.0),
        forcings=(radiation,))

    def theta0(x, y, z):
        return 300.0 + 4.0e-3 * z

    state = bz.initial_state(model, theta=theta0,
                             qt=lambda x, y, z: 0.016 * jnp.exp(-z / 2500.0))
    noise = 0.1 * jax.random.normal(jax.random.key(2025), grid.shape)
    state = state.replace(
        rho_theta=state.rho_theta
        + model.reference.rho_col * noise * jnp.exp(-grid.z_c_col / 500.0))

    stop = 60.0 if args.quick else 6.0 * 3600.0
    sim = Simulation(model, state, dt=3.0, stop_time=stop)
    sim.run()

    aux = bz.diagnose(model, sim.state)
    heat = radiation.heating_rate(model, aux, sim.state.time)
    print(f"done: max |w| = {float(jnp.max(jnp.abs(aux.w))):.2f} m/s, "
          f"radiative θ-tendency range "
          f"[{float(jnp.min(heat))*86400:.2f}, "
          f"{float(jnp.max(heat))*86400:.2f}] K/day")
    assert bool(jnp.all(jnp.isfinite(sim.state.rho_theta)))


if __name__ == "__main__":
    main()
