"""Moist convection over a prescribed sea-surface-temperature front
(reference examples/prescribed_sea_surface_temperature.jl).

A 2-D x-z slab over a warm SST anomaly: bulk aerodynamic surface fluxes
(drag + sensible + latent) against the prescribed SST drive organized moist
convection with saturation adjustment.

Run:  python examples/prescribed_sst.py [--quick]
"""

import argparse

import jax
import jax.numpy as jnp

import breeze_tpu as bz
from breeze_tpu.physics.closures import SmagorinskyLilly
from breeze_tpu.physics.surface import BulkSurfaceFluxes
from breeze_tpu.simulation import Simulation


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    nx, nz = (48, 32) if args.quick else (128, 128)
    grid = bz.make_grid(size=(nx, 1, nz), extent=(20e3, 1.0, 10e3),
                        topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                        dtype=jnp.float32)

    model = bz.make_model(
        grid, advection=bz.WENO(5), potential_temperature=300.0,
        microphysics=bz.SaturationAdjustment(
            equilibrium=bz.WarmPhaseEquilibrium()),
        closure=SmagorinskyLilly(),
        boundary_fluxes=BulkSurfaceFluxes(
            surface_temperature=302.0,       # warm SST
            drag_coefficient=1.5e-3,
            heat_transfer_coefficient=1.5e-3,
            vapor_transfer_coefficient=1.5e-3,
            gustiness=1.0))

    def theta0(x, y, z):
        return 300.0 + 5.0e-3 * z     # weakly stable

    def qt0(x, y, z):
        return 0.014 * jnp.exp(-z / 2500.0)

    state = bz.initial_state(model, theta=theta0, qt=qt0,
                             u=lambda x, y, z: 2.0 + 0.0 * z)
    noise = 0.05 * jax.random.normal(jax.random.key(7), grid.shape)
    state = state.replace(
        rho_theta=state.rho_theta
        + model.reference.rho_col * noise * jnp.exp(-grid.z_c_col / 500.0))

    stop = 120.0 if args.quick else 2.0 * 3600.0
    sim = Simulation(model, state, dt=2.0, stop_time=stop)
    sim.run()

    aux = bz.diagnose(model, sim.state)
    print(f"done: max |w| = {float(jnp.max(jnp.abs(aux.w))):.2f} m/s, "
          f"max qˡ = {float(jnp.max(aux.q.liquid))*1e3:.2f} g/kg")
    assert bool(jnp.all(jnp.isfinite(sim.state.rho_theta)))


if __name__ == "__main__":
    main()
