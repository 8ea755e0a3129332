"""Boussinesq BOMEX: moist thermodynamics on a constant-density reference
(reference examples/boussinesq_bomex.jl — MoistAirBuoyancy inside an
Oceananigans NonhydrostaticModel).

The same Siebesma et al. (2003) trade-cumulus configuration as
examples/bomex.py, but with the constant-density (Boussinesq) reference
from ``make_boussinesq_reference`` — the anelastic machinery degenerates to
classical moist Boussinesq dynamics while keeping the full Breeze-style
saturation-adjustment thermodynamics.

Run:  python examples/boussinesq_bomex.py [--quick]
"""

import argparse

import jax
import jax.numpy as jnp

import breeze_tpu as bz
from breeze_tpu.physics.closures import SmagorinskyLilly
from breeze_tpu.physics.forcings import (GeostrophicForcing, SubsidenceForcing,
                                         UpperSponge)
from breeze_tpu.physics.surface import PrescribedSurfaceFluxes
from breeze_tpu.simulation import Simulation
from breeze_tpu.thermo.constants import ThermodynamicConstants
from breeze_tpu.thermo.reference import make_boussinesq_reference

F_CORIOLIS = 3.76e-5


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    n, nz = (16, 25) if args.quick else (64, 75)
    grid = bz.make_grid(size=(n, n, nz), extent=(6400.0, 6400.0, 3000.0),
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                        dtype=jnp.float32)

    constants = ThermodynamicConstants()
    reference = make_boussinesq_reference(
        grid, constants, surface_pressure=101_500.0,
        potential_temperature=298.7)

    model = bz.make_model(
        grid, constants=constants, reference=reference,
        advection=bz.WENO(5),
        microphysics=bz.SaturationAdjustment(
            equilibrium=bz.WarmPhaseEquilibrium()),
        closure=SmagorinskyLilly(),
        coriolis=bz.FPlane(f=F_CORIOLIS),
        boundary_fluxes=PrescribedSurfaceFluxes(
            theta_flux=8.0e-3, qt_flux=5.2e-5, friction_velocity=0.28),
        forcings=(
            GeostrophicForcing(f=F_CORIOLIS,
                               u_g=lambda z: -10.0 + 1.8e-3 * z, v_g=0.0),
            SubsidenceForcing(w_profile=lambda z: jnp.where(
                z < 1500.0, -0.0065 * z / 1500.0,
                jnp.where(z < 2100.0,
                          -0.0065 * (1 - (z - 1500.0) / 600.0), 0.0))),
            UpperSponge(rate=0.05, bottom=2400.0),
        ))

    def theta0(x, y, z):
        return jnp.where(z < 520.0, 298.7,
               jnp.where(z < 1480.0, 298.7 + (z - 520.0) * 3.854e-3,
               jnp.where(z < 2000.0, 302.4 + (z - 1480.0) * 11.15e-3,
                         308.2 + (z - 2000.0) * 3.65e-3)))

    def qt0(x, y, z):
        return jnp.where(z < 520.0, 17.0e-3 - z * 1.346e-6,
               jnp.where(z < 1480.0, 16.3e-3 - (z - 520.0) * 5.833e-6,
               jnp.where(z < 2000.0, 10.7e-3 - (z - 1480.0) * 12.5e-6,
                         jnp.maximum(4.2e-3 - (z - 2000.0) * 1.2e-6, 1e-4))))

    state = bz.initial_state(model, theta=theta0, qt=qt0,
                             u=lambda x, y, z: jnp.where(
                                 z < 700.0, -8.75, -8.75 + (z - 700.0) * 1.8e-3))
    noise = 0.1 * jax.random.normal(jax.random.key(11), grid.shape)
    state = state.replace(
        rho_theta=state.rho_theta
        + model.reference.rho_col * noise * jnp.exp(-grid.z_c_col / 500.0))

    stop = 120.0 if args.quick else 3600.0
    sim = Simulation(model, state, dt=2.0, stop_time=stop)
    sim.run()

    aux = bz.diagnose(model, sim.state)
    print(f"done: max |w| = {float(jnp.max(jnp.abs(aux.w))):.2f} m/s  "
          f"(Boussinesq: reference density is uniform "
          f"{float(model.reference.rho_c[0]):.3f} kg/m³)")
    assert bool(jnp.all(jnp.isfinite(sim.state.rho_theta)))


if __name__ == "__main__":
    main()
