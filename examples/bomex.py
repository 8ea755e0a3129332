"""BOMEX — trade-wind shallow cumulus LES intercomparison
(Siebesma et al. 2003; reference examples/bomex.jl; BASELINE config 4).

The canonical moist-LES benchmark: prescribed surface fluxes, geostrophic
wind, large-scale subsidence + drying, Smagorinsky-Lilly SGS closure, and
saturation-adjustment moist thermodynamics on a 3-D grid.

Run:  python examples/bomex.py [--quick]
"""

import argparse

import jax
import jax.numpy as jnp

import breeze_tpu as bz
from breeze_tpu.physics.closures import SmagorinskyLilly
from breeze_tpu.physics.forcings import (DrySubsidenceTendency, GeostrophicForcing,
                                         SubsidenceForcing, UpperSponge)
from breeze_tpu.physics.surface import PrescribedSurfaceFluxes
from breeze_tpu.simulation import IterationInterval, Simulation, conjure_time_step_wizard


F_CORIOLIS = 3.76e-5


def bomex_model(n=64, nz=75, quick=False):
    if quick:
        n, nz = 32, 25
    grid = bz.make_grid(size=(n, n, nz), extent=(6400.0, 6400.0, 3000.0),
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                        halo=3, dtype=jnp.float32)

    model = bz.make_model(
        grid,
        advection=bz.WENO(5),
        potential_temperature=298.7,
        surface_pressure=101_500.0,
        microphysics=bz.SaturationAdjustment(equilibrium=bz.WarmPhaseEquilibrium()),
        closure=SmagorinskyLilly(),
        coriolis=bz.FPlane(f=F_CORIOLIS),
        boundary_fluxes=PrescribedSurfaceFluxes(
            theta_flux=8.0e-3,          # w'θ'  [K m/s]      (Siebesma §3)
            qt_flux=5.2e-5,             # w'qᵗ' [m/s]
            friction_velocity=0.28),    # u*    [m/s]
        forcings=(
            GeostrophicForcing(f=F_CORIOLIS,
                               u_g=lambda z: -10.0 + 1.8e-3 * z, v_g=0.0),
            SubsidenceForcing(w_profile=lambda z: jnp.where(
                z < 1500.0, -0.0065 * z / 1500.0,
                jnp.where(z < 2100.0, -0.0065 * (1 - (z - 1500.0) / 600.0), 0.0))),
            DrySubsidenceTendency(tendency_profile=lambda z: jnp.where(
                z < 300.0, -1.2e-8, jnp.where(z < 500.0,
                                              -1.2e-8 * (1 - (z - 300.0) / 200.0), 0.0))),
            UpperSponge(rate=0.05, bottom=2400.0),
        ))

    # Siebesma initial profiles
    def theta0(x, y, z):
        return jnp.where(z < 520.0, 298.7,
               jnp.where(z < 1480.0, 298.7 + (z - 520.0) * (302.4 - 298.7) / 960.0,
               jnp.where(z < 2000.0, 302.4 + (z - 1480.0) * (308.2 - 302.4) / 520.0,
                         308.2 + (z - 2000.0) * 3.65e-3)))

    def qt0(x, y, z):
        return jnp.where(z < 520.0, 17.0e-3 + z * (16.3e-3 - 17.0e-3) / 520.0,
               jnp.where(z < 1480.0, 16.3e-3 + (z - 520.0) * (10.7e-3 - 16.3e-3) / 960.0,
               jnp.where(z < 2000.0, 10.7e-3 + (z - 1480.0) * (4.2e-3 - 10.7e-3) / 520.0,
                         jnp.maximum(4.2e-3 - (z - 2000.0) * 1.2e-6, 1e-4))))

    def u0(x, y, z):
        return jnp.where(z < 700.0, -8.75, -8.75 + (z - 700.0) * 1.8e-3)

    state = bz.initial_state(model, theta=theta0, qt=qt0, u=u0)
    # seed convection with boundary-layer θ noise
    noise = 0.1 * jax.random.normal(jax.random.key(1), grid.shape)
    damp = jnp.exp(-grid.z_c_col / 500.0)
    state = state.replace(
        rho_theta=state.rho_theta + model.reference.rho_col * noise * damp)
    return model, state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--check", action="store_true",
                   help="physics-assertion run: 15 sim-min at the quick "
                        "grid, asserts spun-up BL turbulence + sane "
                        "cloud/moisture structure")
    p.add_argument("--hours", type=float, default=1.0)
    args = p.parse_args()

    model, state = bomex_model(quick=args.quick or args.check)
    stop = (300.0 if args.quick
            else 900.0 if args.check else args.hours * 3600.0)
    sim = Simulation(model, state, dt=2.0, stop_time=stop)
    conjure_time_step_wizard(sim, cfl=0.6, max_dt=10.0)

    def progress(s):
        aux = bz.diagnose(s.model, s.state)
        cloud_cover = float(jnp.mean(jnp.any(aux.q.liquid > 1e-5, axis=0)))
        print(f"  t={s.time:7.0f}s dt={s.dt:5.2f}  max|w|={float(jnp.abs(aux.w).max()):5.2f} "
              f"m/s  cloud cover={cloud_cover:4.2f}  "
              f"max qˡ={float(aux.q.liquid.max()) * 1e3:.2f} g/kg")

    sim.add_callback(progress, IterationInterval(20))
    sim.run()

    if args.check:
        # Physics signatures after 15 sim-min of BOMEX spin-up (Siebesma
        # et al. 2003 intercomparison bands, early-time):
        import numpy as np
        aux = bz.diagnose(sim.model, sim.state)
        w = np.asarray(aux.w)
        assert np.isfinite(w).all()
        g = sim.model.grid
        zc = np.asarray(g.z_c)
        bl = zc < 600.0
        w_rms_bl = float(np.sqrt((w[bl] ** 2).mean()))
        wmax = float(np.abs(w).max())
        cloud_cover = float(np.mean(np.any(
            np.asarray(aux.q.liquid) > 1e-5, axis=0)))
        qt = np.asarray(aux.qt)
        qt_sfc = float(qt[0].mean())
        print(f"check: BL w_rms = {w_rms_bl:.3f} m/s, max|w| = {wmax:.2f}, "
              f"cloud cover = {cloud_cover:.2f}, "
              f"surface qt = {qt_sfc * 1e3:.2f} g/kg")
        # surface-flux-driven convection has spun up, but stays LES-sane
        assert 0.02 < w_rms_bl < 2.0, "BL turbulence not in band"
        assert wmax < 12.0, "runaway updraft"
        # trade-cumulus regime: broken clouds at most (0 early is fine)
        assert cloud_cover < 0.6, "overcast — not BOMEX"
        # moisture budget sane: surface qt still near the initial 17 g/kg
        assert 0.014 < qt_sfc < 0.020, "surface moisture drifted"
        print("check PASSED")


if __name__ == "__main__":
    main()
