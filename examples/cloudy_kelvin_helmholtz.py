"""Cloudy Kelvin-Helmholtz instability — moist 2-D shear layer
(reference examples/cloudy_kelvin_helmholtz.jl).

A stably stratified x-z slice with a sheared wind profile U(z) and a
Gaussian moisture layer on the shear layer; as the billows roll up the
moist filament condenses into wave clouds (saturation adjustment).

Run:  python examples/cloudy_kelvin_helmholtz.py [--quick]
"""

import argparse

import jax
import jax.numpy as jnp

import breeze_tpu as bz
from breeze_tpu.simulation import Simulation


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    nx, nz = (96, 32) if args.quick else (384, 128)
    Lx, Lz = 10e3, 3e3
    grid = bz.make_grid(size=(nx, 1, nz), extent=(Lx, 1.0, Lz),
                        topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                        dtype=jnp.float32)

    model = bz.make_model(
        grid, advection=bz.WENO(5), potential_temperature=290.0,
        microphysics=bz.SaturationAdjustment(
            equilibrium=bz.WarmPhaseEquilibrium()))

    # shear layer at mid-height; N² = 1e-4 stratification
    z0, dz_sh = 0.5 * Lz, 150.0
    N2, g_acc, th0 = 1.0e-4, 9.81, 290.0

    def theta0(x, y, z):
        return th0 * jnp.exp(N2 * z / g_acc)

    def u0(x, y, z):
        return 10.0 * jnp.tanh((z - z0) / dz_sh)

    def qt0(x, y, z):
        return 0.0065 * jnp.exp(-(((z - z0) / 300.0) ** 2))

    state = bz.initial_state(model, theta=theta0, u=u0, qt=qt0)
    noise = 0.02 * jax.random.normal(jax.random.key(301), grid.shape)
    band = jnp.exp(-(((grid.z_c_col - z0) / 300.0) ** 2))
    state = state.replace(rho_w=(state.rho_w + model.reference.rho_f_col[:nz]
                                 * noise * band).at[0].set(0.0))

    stop = 60.0 if args.quick else 1800.0
    sim = Simulation(model, state, dt=2.0, stop_time=stop)
    sim.run()

    aux = bz.diagnose(model, state=sim.state)
    ql = aux.q.liquid
    print(f"done: max cloud liquid = {float(jnp.max(ql))*1e3:.3f} g/kg, "
          f"max |w| = {float(jnp.max(jnp.abs(aux.w))):.2f} m/s")
    assert bool(jnp.all(jnp.isfinite(sim.state.rho_theta)))


if __name__ == "__main__":
    main()
