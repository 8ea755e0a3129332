"""Acoustic wave — compressible split-explicit validation
(reference examples/acoustic_wave.jl; BASELINE config 3).

A small pressure pulse radiates at the speed of sound; the split-explicit
substepping resolves it with an outer Δt far above the acoustic CFL.

Run:  python examples/acoustic_wave.py [--quick]
"""

import argparse

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.dynamics.compressible import (
    SplitExplicitTimeDiscretization, acoustic_rk3_step, compressible_diagnose,
    compressible_initial_state, make_compressible_model, sound_speed)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    nx = 128 if args.quick else 512
    grid = bz.make_grid(size=(nx, 1, 16), extent=(64_000.0, 1.0, 8_000.0),
                        topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                        halo=3, dtype=jnp.float64)
    model = make_compressible_model(
        grid, advection=bz.Centered(2),
        time_discretization=SplitExplicitTimeDiscretization(substeps=12))

    def theta0(x, y, z):
        return 300.0 * (1.0 + 1e-3 * jnp.exp(-(x - 32_000.0) ** 2 / 2_000.0 ** 2))

    state = compressible_initial_state(model, theta=theta0, pressure_balanced=False)
    p0 = np.asarray(compressible_diagnose(model, state).p)

    cs = sound_speed(model)
    T = 40.0
    dt = 5.0
    print(f"sound speed {cs:.1f} m/s; outer dt {dt}s "
          f"(acoustic CFL would need dt < {grid.dx / cs:.2f}s)")
    for _ in range(int(T / dt)):
        state = acoustic_rk3_step(model, state, dt)

    p1 = np.asarray(compressible_diagnose(model, state).p)
    dp = (p1 - p0)[grid.nz // 2, 0]
    x = np.asarray(grid.x_c())
    right = dp[x > 32_000.0]
    xr = x[x > 32_000.0]
    front = xr[np.argmax(right)] - 32_000.0
    print(f"wavefront at {front:,.0f} m after {T}s; expected {cs * T:,.0f} m "
          f"(error {abs(front - cs * T):,.0f} m)")


if __name__ == "__main__":
    main()
