"""Single-column radiation intercomparison: gray vs clear-sky spectral vs
high-CO₂ (reference examples/single_column_radiation.jl).

Computes radiative flux profiles through one resting atmospheric column
with three radiative-transfer configurations and prints the broadband
summary (OLR, surface fluxes, CO₂ forcing).

Run:  python examples/single_column_radiation.py [--quick]
"""

import argparse

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.physics.radiation import FixedCosineZenith, GrayRadiation
from breeze_tpu.physics.spectral_radiation import (BackgroundAtmosphere,
                                                   SpectralRadiation)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    nz = 32 if args.quick else 64
    grid = bz.make_grid(size=(1, 1, nz), extent=(1.0, 1.0, 20e3),
                        topology=(bz.FLAT, bz.FLAT, bz.BOUNDED))
    model = bz.make_model(grid, potential_temperature=300.0,
                          microphysics=bz.SaturationAdjustment())
    state = bz.initial_state(
        model, theta=lambda x, y, z: 300.0 + 0.012 * z,
        qt=lambda x, y, z: 0.016 * jnp.exp(-z / 2500.0))
    aux = bz.diagnose(model, state)
    mu = FixedCosineZenith(0.5)

    gray = GrayRadiation(surface_temperature=300.0, solar_position=mu,
                         surface_albedo=0.1)
    clear = SpectralRadiation(optics="clear", surface_temperature=300.0,
                              solar_position=mu)
    high_co2 = SpectralRadiation(
        optics="clear", surface_temperature=300.0, solar_position=mu,
        background=BackgroundAtmosphere(co2=840e-6))

    lw_up, lw_dn, sw_dn = gray.fluxes(model, aux, 0.0)
    print(f"gray:      OLR = {float(lw_up[-1,0,0]-lw_dn[-1,0,0]):7.1f} W/m²  "
          f"surface LW↓ = {float(lw_dn[0,0,0]):6.1f}  SW↓ = {float(sw_dn[0,0,0]):6.1f}")

    olr = {}
    for name, rad in (("clear-sky", clear), ("2xCO2", high_co2)):
        lw_up, lw_dn, sw_dn, sw_up = rad.fluxes(model, aux, 0.0)
        olr[name] = float(lw_up[-1, 0, 0] - lw_dn[-1, 0, 0])
        print(f"{name:9s}: OLR = {olr[name]:7.1f} W/m²  "
              f"surface LW↓ = {float(lw_dn[0,0,0]):6.1f}  "
              f"SW↓ = {float(sw_dn[0,0,0]):6.1f}  SW↑(TOA) = {float(sw_up[-1,0,0]):6.1f}")

    forcing = olr["clear-sky"] - olr["2xCO2"]
    print(f"2xCO2 radiative forcing (OLR drop): {forcing:.2f} W/m²")
    assert 1.0 < forcing < 10.0

    # heating-rate profile for the clear-sky configuration
    heat = np.asarray(clear.heating_rate(model, aux, 0.0))[:, 0, 0] * 86400.0
    z = np.asarray(grid.z_c) / 1000.0
    for k in range(0, nz, max(1, nz // 8)):
        print(f"  z = {z[k]:5.1f} km   dθ/dt = {heat[k]:+6.2f} K/day")


if __name__ == "__main__":
    main()
