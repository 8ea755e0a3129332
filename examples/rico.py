"""RICO — precipitating trade-wind cumulus LES (vanZanten et al. 2011;
reference examples/rico.jl) with one-moment bulk microphysics.

Run:  python examples/rico.py [--quick]
"""

import argparse

import jax
import jax.numpy as jnp

import breeze_tpu as bz
from breeze_tpu.physics.closures import SmagorinskyLilly
from breeze_tpu.physics.forcings import (DrySubsidenceTendency, GeostrophicForcing,
                                         SubsidenceForcing, UpperSponge)
from breeze_tpu.physics.one_moment import OneMomentMicrophysics
from breeze_tpu.physics.surface import BulkSurfaceFluxes
from breeze_tpu.simulation import IterationInterval, Simulation, conjure_time_step_wizard

F_COR = 4.5e-5


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    n, nz, stop = (32, 25, 240.0) if args.quick else (128, 100, 4 * 3600.0)
    grid = bz.make_grid(size=(n, n, nz), extent=(12_800.0, 12_800.0, 4_000.0),
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                        halo=3, dtype=jnp.float32)

    model = bz.make_model(
        grid, advection=bz.WENO(5), potential_temperature=297.9,
        surface_pressure=101_540.0,
        microphysics=OneMomentMicrophysics(),
        closure=SmagorinskyLilly(),
        coriolis=bz.FPlane(f=F_COR),
        boundary_fluxes=BulkSurfaceFluxes(
            surface_temperature=299.8, stability_correction=True,
            drag_coefficient=1.3e-3, heat_transfer_coefficient=1.0e-3,
            vapor_transfer_coefficient=1.2e-3),
        forcings=(
            GeostrophicForcing(f=F_COR, u_g=lambda z: -9.9 + 2.0e-3 * z, v_g=-3.8),
            SubsidenceForcing(w_profile=lambda z: -0.005 * jnp.clip(z / 2260.0, 0, 1)),
            DrySubsidenceTendency(tendency_profile=lambda z: jnp.where(
                z < 2980.0, -1.0e-8 + 1.3456e-8 * z / 2980.0, 4e-9)),
            UpperSponge(rate=0.05, bottom=3200.0),
        ))

    # vanZanten RICO profiles
    def theta0(x, y, z):
        return jnp.where(z < 740.0, 297.9, 297.9 + (z - 740.0) * (317.0 - 297.9) / 3260.0)

    def qt0(x, y, z):
        q = jnp.where(z < 740.0, 16.0e-3 + z * (13.8e-3 - 16.0e-3) / 740.0,
            jnp.where(z < 3260.0, 13.8e-3 + (z - 740.0) * (2.4e-3 - 13.8e-3) / 2520.0,
                      2.4e-3))
        return q

    def u0(x, y, z):
        return -9.9 + 2.0e-3 * z

    state = bz.initial_state(model, theta=theta0, qt=qt0, u=u0,
                             v=lambda x, y, z: -3.8 * jnp.ones_like(z * x * y))
    noise = 0.1 * jax.random.normal(jax.random.key(0), grid.shape)
    state = state.replace(rho_theta=state.rho_theta + model.reference.rho_col
                          * noise * jnp.exp(-grid.z_c_col / 500.0))

    sim = Simulation(model, state, dt=2.0, stop_time=stop)
    conjure_time_step_wizard(sim, cfl=0.6, max_dt=8.0)

    def progress(s):
        aux = bz.diagnose(s.model, s.state)
        qr = s.state.tracers["rho_qr"]
        print(f"  t={s.time:7.0f}s dt={s.dt:4.1f}  max|w|={float(jnp.abs(aux.w).max()):5.2f}"
              f"  max qˡ={float(aux.q.liquid.max()) * 1e3:5.2f} g/kg"
              f"  max qʳ={float(qr.max()) * 1e3:5.2f}")

    sim.add_callback(progress, IterationInterval(25))
    sim.run()


if __name__ == "__main__":
    main()
