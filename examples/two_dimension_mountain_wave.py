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
    p.add_argument("--check", action="store_true",
                   help="physics-assertion run: 20 sim-min at the quick "
                        "grid, asserts positive wave drag + amplitude band")
    p.add_argument("--explicit", action="store_true",
                   help="fully explicit compressible path (validation)")
    p.add_argument("--sleve", action="store_true",
                   help="SLEVE (TwoLevelDecay) terrain-following coordinates")
    args = p.parse_args()

    # Schär et al. (2002) setup, matching the reference example
    # (examples/two_dimension_mountain_wave.jl:100-160): isothermal base
    # state at T₀ = 300 K (N ≈ 0.018 s⁻¹), U = 20 m/s, h₀ = 250 m Gaussian
    # ridge with a = 5 km, 100 km × 20 km domain with a 5-km KDH08 sponge.
    nx, nz = (64, 20) if args.quick else ((128, 32) if args.check
                                          else (256, 64))
    T_total = 10.0 if args.quick else (1_800.0 if args.check else 3_600.0)

    grid = bz.make_grid(size=(nx, 1, nz), extent=(100_000.0, 1.0, 20_000.0),
                        topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                        dtype=jnp.float64)
    const = ThermodynamicConstants()
    T0 = 300.0
    N2 = (const.gravitational_acceleration ** 2
          / (const.dry_air.heat_capacity * T0))
    beta = N2 / const.gravitational_acceleration
    theta_bg = lambda z: T0 * np.exp(beta * z)

    h0, a = 250.0, 5_000.0
    sleve_kw = (dict(large_scale_height=10_000.0, small_scale_height=2_500.0,
                     sleve_smoothing_passes=8) if args.sleve else {})
    terrain = make_terrain(
        grid, const,
        lambda x, y: h0 * jnp.exp(-(((x - 50_000.0)) / a) ** 2),
        potential_temperature=theta_bg,
        **sleve_kw)

    model = make_compressible_model(
        grid, advection=bz.WENO(5),
        terrain=None if args.explicit else terrain,
        time_discretization=SplitExplicitTimeDiscretization(
            # KDH08 full-field sponge: absorbs the wave itself, not just
            # the substep increments (UpperSponge.damp_full docstring —
            # breaking waves otherwise accumulate under the rigid lid)
            sponge=None if args.quick else UpperSponge(
                damping_rate=0.1, depth=5_000.0)),
        reference_potential_temperature=theta_bg)

    state = terrain_initial_state(
        model, terrain,
        theta=lambda x, y, z: T0 * jnp.exp(beta * z),
        u=20.0)

    if args.explicit:
        dt = 0.05  # explicit path: acoustic CFL
        step = jax.jit(lambda s: terrain_explicit_rk3_step(model, terrain, s, dt))
    else:
        dt = 1.0 if (args.quick or args.check) else 2.0  # advective CFL
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

    if args.check and not args.explicit:
        # Physics signatures after 30 sim-min (hydrostatic wave amplitude
        # ~ N h₀ ≈ 4.5 m/s × ρ-amplification aloft; measured envelope at
        # this resolution: 2.7 (t=1500s) → 7-9 saturated (t≥3000s)):
        from breeze_tpu.dynamics.compressible import compressible_diagnose
        aux = compressible_diagnose(model, state)
        w_phys = np.asarray(aux.w)[1:]
        wmax = np.abs(w_phys).max()
        assert 0.2 < wmax < 12.0, f"wave amplitude {wmax:.3f} m/s off-band"
        # Surface form drag on the ridge F_x = ∮ p ∂h/∂x dx > 0: high
        # pressure on the windward slope of a vertically-propagating wave
        # pushes the mountain downstream (the equal-and-opposite wave drag
        # decelerates the flow aloft).
        sx_f = np.asarray(terrain.sx_xf)            # dh/dx at x-faces
        sx_c = 0.5 * (sx_f + np.roll(sx_f, -1, axis=-1))
        p_s = np.asarray(aux.p)[0, 0]
        p_s = p_s - p_s.mean()
        drag = float((p_s * sx_c[0]).sum() * grid.dx)
        print(f"check: max|w| = {wmax:.3f} m/s, surface form drag = "
              f"{drag:,.0f} N/m")
        assert drag > 0.0, f"wave drag sign wrong: {drag:.1f} N/m"
        print("check PASSED")


if __name__ == "__main__":
    main()
