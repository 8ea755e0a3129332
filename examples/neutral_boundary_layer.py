"""Neutral atmospheric boundary layer (Moeng 1994 "S" case)
(reference examples/neutral_atmospheric_boundary_layer.jl).

Dry shear-driven ABL capped by a stable inversion: geostrophic wind +
Coriolis, fixed friction velocity at the surface, inversion lapse rate
maintained by an upper sponge; Smagorinsky-Lilly SGS.

Run:  python examples/neutral_boundary_layer.py [--quick]
"""

import argparse

import jax
import jax.numpy as jnp

import breeze_tpu as bz
from breeze_tpu.physics.closures import SmagorinskyLilly
from breeze_tpu.physics.forcings import GeostrophicForcing, UpperSponge
from breeze_tpu.physics.surface import PrescribedSurfaceFluxes
from breeze_tpu.simulation import Simulation

U_G = 10.0          # geostrophic wind [m/s]
F_COR = 1.0e-4
U_STAR = 0.5        # imposed friction velocity [m/s]
Z_INV = 500.0       # initial boundary-layer height


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    n, nz = (24, 24) if args.quick else (96, 96)
    grid = bz.make_grid(size=(n, n, nz), extent=(3000.0, 3000.0, 1000.0),
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                        dtype=jnp.float32)

    model = bz.make_model(
        grid, advection=bz.WENO(5), potential_temperature=300.0,
        closure=SmagorinskyLilly(),
        coriolis=bz.FPlane(f=F_COR),
        boundary_fluxes=PrescribedSurfaceFluxes(friction_velocity=U_STAR),
        forcings=(GeostrophicForcing(f=F_COR, u_g=U_G, v_g=0.0),
                  UpperSponge(rate=0.1, bottom=800.0)))

    # neutral layer + capping inversion (Moeng 1994)
    def theta0(x, y, z):
        return jnp.where(z < Z_INV, 300.0, 300.0 + 0.01 * (z - Z_INV))

    state = bz.initial_state(model, theta=theta0,
                             u=lambda x, y, z: U_G + 0.0 * z)
    noise = 0.1 * jax.random.normal(jax.random.key(1994), grid.shape)
    damp = jnp.exp(-grid.z_c_col / 200.0)
    state = state.replace(
        rho_theta=state.rho_theta + model.reference.rho_col * noise * damp)

    stop = 120.0 if args.quick else 4.0 * 3600.0
    sim = Simulation(model, state, dt=1.0, stop_time=stop)
    sim.run()

    aux = bz.diagnose(model, sim.state)
    print(f"done: <u> near surface = {float(jnp.mean(aux.u[1])):.2f} m/s, "
          f"max |w| = {float(jnp.max(jnp.abs(aux.w))):.2f} m/s")
    assert bool(jnp.all(jnp.isfinite(sim.state.rho_u)))


if __name__ == "__main__":
    main()
