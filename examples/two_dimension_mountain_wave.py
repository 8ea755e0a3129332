"""2-D mountain wave over a witch-of-Agnesi hill — terrain-following
coordinates (reference examples/two_dimension_mountain_wave.jl, Schär-type
setup).

Uniform stratified flow over an isolated ridge generates vertically
propagating gravity waves; integrates the split-explicit compressible core
in Gal-Chen σ-coordinates (acoustic substepper terrain dispatch, reference
``terrain_compressible_physics.jl:486-659``); ``--explicit`` selects the
fully explicit acoustic-CFL-limited validation path instead.

Run:  python examples/two_dimension_mountain_wave.py [--quick] [--explicit] [--sleve]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.dynamics.compressible import (UpperSponge,
                                              SplitExplicitTimeDiscretization,
                                              acoustic_rk3_step,
                                              make_compressible_model)
from breeze_tpu.dynamics.terrain import (make_terrain, terrain_explicit_rk3_step,
                                         terrain_initial_state)
from breeze_tpu.thermo.constants import ThermodynamicConstants


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--explicit", action="store_true",
                   help="fully explicit compressible path (validation)")
    p.add_argument("--sleve", action="store_true",
                   help="SLEVE (TwoLevelDecay) terrain-following coordinates")
    args = p.parse_args()

    nx, nz = (64, 20) if args.quick else (256, 64)
    T_total = 10.0 if args.quick else 3600.0

    grid = bz.make_grid(size=(nx, 1, nz), extent=(40_000.0, 1.0, 12_000.0),
                        topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                        dtype=jnp.float64)
    const = ThermodynamicConstants()

    h0, a = 250.0, 3_000.0
    sleve_kw = (dict(large_scale_height=8_000.0, small_scale_height=4_000.0,
                     sleve_smoothing_passes=8) if args.sleve else {})
    terrain = make_terrain(
        grid, const,
        lambda x, y: h0 / (1.0 + ((x - 20_000.0) / a) ** 2),
        potential_temperature=lambda z: 288.0 * np.exp(1e-4 / 9.81 * z),
        **sleve_kw)

    model = make_compressible_model(
        grid, advection=bz.Centered(2),
        terrain=None if args.explicit else terrain,
        time_discretization=SplitExplicitTimeDiscretization(
            sponge=None if args.quick else UpperSponge(depth=3_000.0)),
        reference_potential_temperature=lambda z: 288.0 * np.exp(1e-4 / 9.81 * z))

    state = terrain_initial_state(
        model, terrain,
        theta=lambda x, y, z: 288.0 * jnp.exp(1e-4 / 9.81 * z),
        u=10.0)

    if args.explicit:
        dt = 0.05  # explicit path: acoustic CFL
        step = jax.jit(lambda s: terrain_explicit_rk3_step(model, terrain, s, dt))
    else:
        dt = 1.0 if args.quick else 2.0  # split-explicit: advective CFL
        step = jax.jit(lambda s: acoustic_rk3_step(model, s, dt))
    n = int(T_total / dt)
    for i in range(n):
        state = step(state)
        if i % max(1, n // 8) == 0:
            w = state.rho_w / model.reference.rho_col
            print(f"  t={float(state.time):7.1f}s  max|w| = "
                  f"{float(jnp.abs(w[1:]).max()):.4f} m/s")

    w = np.asarray(state.rho_w)
    assert np.isfinite(w).all()
    print(f"done: mountain-wave vertical velocity range "
          f"[{w[1:].min():.4f}, {w[1:].max():.4f}] (kg/m²/s)")


if __name__ == "__main__":
    main()
