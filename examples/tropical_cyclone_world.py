"""Tropical-cyclone world: rotating radiative-convective f-plane channel
(reference examples/tropical_cyclone_world.jl, after Ramírez Reyes &
Yang 2021 scaled down).

A doubly periodic f-plane ocean with bulk WISHE fluxes, Kessler warm rain,
gray radiative cooling, and strong rotation: convection self-aggregates
into cyclonic vortices.  Stretched vertical grid (fine boundary layer).

Run:  python examples/tropical_cyclone_world.py [--quick]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.physics.closures import SmagorinskyLilly
from breeze_tpu.physics.kessler import KesslerMicrophysics
from breeze_tpu.physics.radiation import FixedCosineZenith, GrayRadiation
from breeze_tpu.physics.surface import BulkSurfaceFluxes
from breeze_tpu.simulation import Simulation


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    n = 24 if args.quick else 72
    L = 288e3
    z_faces = bz.piecewise_stretched_z(
        20 if args.quick else 40, surface_layer_height=1000.0,
        surface_layer_spacing=250.0 if args.quick else 100.0, top=20e3)
    nz = len(z_faces) - 1
    grid = bz.make_grid(size=(n, n, nz), x=(0.0, L), y=(0.0, L), z=z_faces,
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                        dtype=jnp.float32)

    f_cor = 5.0e-4    # strongly rotating "TC world"
    model = bz.make_model(
        grid, advection=bz.WENO(5), potential_temperature=300.0,
        microphysics=KesslerMicrophysics(),
        closure=SmagorinskyLilly(),
        coriolis=bz.FPlane(f=f_cor),
        boundary_fluxes=BulkSurfaceFluxes(
            surface_temperature=301.0, drag_coefficient=1.2e-3,
            heat_transfer_coefficient=1.2e-3,
            vapor_transfer_coefficient=1.2e-3, gustiness=2.0),
        forcings=(GrayRadiation(surface_temperature=301.0,
                                solar_position=FixedCosineZenith(0.3)),))

    def theta0(x, y, z):
        return 300.0 + 4.5e-3 * z

    state = bz.initial_state(model, theta=theta0,
                             qt=lambda x, y, z: 0.017 * jnp.exp(-z / 2200.0))
    noise = 0.3 * jax.random.normal(jax.random.key(2019), grid.shape)
    state = state.replace(
        rho_theta=state.rho_theta
        + model.reference.rho_col * noise * jnp.exp(-grid.z_c_col / 800.0))

    stop = 120.0 if args.quick else 12.0 * 3600.0
    sim = Simulation(model, state, dt=3.0, stop_time=stop)
    sim.run()

    aux = bz.diagnose(model, sim.state)
    # cyclonic organization diagnostic: vertical-vorticity extrema at z≈1km
    k1 = int(np.searchsorted(np.asarray(grid.z_c), 1000.0))
    u, v = np.asarray(aux.u[k1]), np.asarray(aux.v[k1])
    zeta = ((np.roll(v, -1, 1) - v) / grid.dx - (np.roll(u, -1, 0) - u) / grid.dy)
    print(f"done: max |w| = {float(jnp.max(jnp.abs(aux.w))):.2f} m/s, "
          f"max ζ/f = {np.abs(zeta).max() / f_cor:.2f}")
    assert bool(jnp.all(jnp.isfinite(sim.state.rho_theta)))


if __name__ == "__main__":
    main()
