"""Benchmark: LES throughput in grid-points/s on one chip.

Canonical case (the ``vs_baseline`` metric, per BASELINE.json): **256^3
BOMEX LES** — saturation-adjustment moist thermodynamics, Smagorinsky-Lilly
SGS closure, prescribed bulk surface fluxes, geostrophic + subsidence
forcing, WENO5 float32 (reference ``benchmarking/README.md:193-208`` defines
the harness; ``examples/bomex.jl`` the physics).  A dry thermal-bubble case
(the reference CI matrix config, ``.github/workflows/Benchmarks.yml:29-50``)
stays available via ``--case bubble``.

10 warmup + 100 timed steps; metric = Nx*Ny*Nz / time_per_step
(``benchmarking/src/result.jl:18-20``).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    args = _parse_args()
    try:
        return _build_and_run(args)
    except Exception as e:  # noqa: BLE001 — always emit a bench line
        # Safety net: if the Pallas-default path fails on this backend
        # (e.g. a Mosaic compile error on a kernel revision not yet
        # hardware-verified), fall back to the pure-jnp path so the
        # driver still records a result.
        import os

        if os.environ.get("BREEZE_TPU_DISABLE_PALLAS"):
            raise
        print(f"# bench retry with BREEZE_TPU_DISABLE_PALLAS=1 after: "
              f"{type(e).__name__}: {e}", file=sys.stderr)
        os.environ["BREEZE_TPU_DISABLE_PALLAS"] = "1"
        args.pallas_fallback = True
        return _build_and_run(args)


def _parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--case", choices=("bomex", "bubble"), default="bomex",
                   help="bomex = canonical 256^3 BOMEX LES (the vs_baseline "
                        "metric); bubble = dry/moist thermal bubble (the "
                        "reference CI matrix config)")
    p.add_argument("--size", type=str, default=None,
                   help="NxNyNz override (default: 256x256x256 for bomex, "
                        "256x256x128 for bubble)")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--dt", type=float, default=None,
                   help="default: 1.0 for bomex, 0.5 for bubble")
    p.add_argument("--moist", action="store_true",
                   help="bubble case: enable saturation-adjustment moist "
                        "thermodynamics (bomex is always moist)")
    p.add_argument("--dynamics", choices=("anelastic", "compressible"),
                   default="anelastic")
    p.add_argument("--svp", choices=("clausius_clapeyron", "flatau", "tetens"),
                   default="clausius_clapeyron",
                   help="saturation vapor pressure closure (flatau = the "
                        "reference's fast polynomial fit)")
    p.add_argument("--terrain", action="store_true",
                   help="compressible over a Schaer-type ridge (the r5 "
                        "terrain acoustic kernel)")
    p.add_argument("--substep-floattype", default=None,
                   help="compressible acoustic working-field dtype (e.g. bfloat16)")
    args = p.parse_args()
    if args.dynamics == "compressible":
        args.case = "bubble"      # the compressible bench is the bubble case
    if args.size is None:
        args.size = "256x256x256" if args.case == "bomex" else "256x256x128"
    if args.dt is None:
        args.dt = 1.0 if args.case == "bomex" else 0.5
    args.pallas_fallback = False
    return args


def _build_bomex(args, nx, ny, nz):
    """256^3 BOMEX: Siebesma et al. (2003) trade-cumulus intercomparison
    (reference examples/bomex.jl), at benchmark resolution."""
    import jax
    import jax.numpy as jnp

    import breeze_tpu as bz
    from breeze_tpu.physics.closures import SmagorinskyLilly
    from breeze_tpu.physics.forcings import (DrySubsidenceTendency,
                                             GeostrophicForcing,
                                             SubsidenceForcing, UpperSponge)
    from breeze_tpu.physics.surface import PrescribedSurfaceFluxes

    f_cor = 3.76e-5
    grid = bz.make_grid(size=(nx, ny, nz), extent=(6_400.0, 6_400.0, 3_000.0),
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                        halo=3, dtype=jnp.float32)
    constants = bz.ThermodynamicConstants(saturation_formulation=args.svp)
    model = bz.make_model(
        grid,
        advection=bz.WENO(5),
        potential_temperature=298.7,
        surface_pressure=101_500.0,
        constants=constants,
        microphysics=bz.SaturationAdjustment(
            equilibrium=bz.WarmPhaseEquilibrium()),
        closure=SmagorinskyLilly(),
        coriolis=bz.FPlane(f=f_cor),
        boundary_fluxes=PrescribedSurfaceFluxes(
            theta_flux=8.0e-3, qt_flux=5.2e-5, friction_velocity=0.28),
        forcings=(
            GeostrophicForcing(f=f_cor,
                               u_g=lambda z: -10.0 + 1.8e-3 * z, v_g=0.0),
            SubsidenceForcing(w_profile=lambda z: jnp.where(
                z < 1500.0, -0.0065 * z / 1500.0,
                jnp.where(z < 2100.0,
                          -0.0065 * (1 - (z - 1500.0) / 600.0), 0.0))),
            DrySubsidenceTendency(tendency_profile=lambda z: jnp.where(
                z < 300.0, -1.2e-8,
                jnp.where(z < 500.0,
                          -1.2e-8 * (1 - (z - 300.0) / 200.0), 0.0))),
            UpperSponge(rate=0.05, bottom=2400.0),
        ))

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
    noise = 0.1 * jax.random.normal(jax.random.key(1), grid.shape,
                                    dtype=jnp.float32)
    damp = jnp.exp(-grid.z_c_col / 500.0)
    state = state.replace(
        rho_theta=state.rho_theta + model.reference.rho_col * noise * damp)
    return grid, model, state


def _build_and_run(args) -> int:
    import jax
    import jax.numpy as jnp

    import breeze_tpu as bz
    from breeze_tpu.timesteppers import ssp_rk3_step

    nx, ny, nz = (int(s) for s in args.size.split("x"))

    if args.case == "bomex" and args.dynamics == "anelastic":
        grid, model, state = _build_bomex(args, nx, ny, nz)
        chunk = jax.jit(
            lambda m, s, dt: jax.lax.fori_loop(
                0, 10, lambda _, st: ssp_rk3_step(m, st, dt), s),
            donate_argnums=(1,))
        return _run_bench(args, grid, model, state, chunk, nx, ny, nz)

    # FastEddy CBL-like domain (reference benchmarking/README.md:193-208):
    # 12.8 km x 12.8 km x 3.2 km.
    grid = bz.make_grid(size=(nx, ny, nz), extent=(12_800.0, 12_800.0, 3_200.0),
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                        halo=3, dtype=jnp.float32)
    microphysics = (bz.SaturationAdjustment(equilibrium=bz.WarmPhaseEquilibrium())
                    if args.moist else None)
    constants = bz.ThermodynamicConstants(saturation_formulation=args.svp)

    if args.dynamics == "compressible":
        from breeze_tpu.dynamics.compressible import (
            SplitExplicitTimeDiscretization, acoustic_rk3_step,
            compressible_initial_state, make_compressible_model)

        terr = None
        if getattr(args, "terrain", False):
            from breeze_tpu.dynamics.terrain import make_terrain
            terr = make_terrain(
                grid, constants,
                lambda x, y: 250.0 * jnp.exp(-((x - 6400.0) / 5000.0) ** 2)
                * jnp.cos(jnp.pi * (x - 6400.0) / 4000.0) ** 2)
        model = make_compressible_model(
            grid, advection=bz.WENO(5), coriolis=bz.FPlane(1e-4),
            microphysics=microphysics, constants=constants, terrain=terr,
            time_discretization=SplitExplicitTimeDiscretization(
                acoustic_cfl=0.5, substep_floattype=args.substep_floattype))

        def theta0c(x, y, z):
            bubble = 0.5 * jnp.exp(-((x - 6400.0) ** 2 + (y - 6400.0) ** 2
                                     + (z - 800.0) ** 2) / 500.0 ** 2)
            return 300.0 + bubble

        state = compressible_initial_state(
            model, theta=theta0c,
            qt=(lambda x, y, z: 0.008 * jnp.exp(-z / 1500.0)) if args.moist else None)

        chunk = jax.jit(
            lambda m, s, dt: jax.lax.fori_loop(
                0, 10, lambda _, st: acoustic_rk3_step(m, st, float(args.dt)), s),
            donate_argnums=(1,), static_argnums=(2,))
        # static dt baked via closure; keep the call signature uniform
        chunk_call = lambda m, s, dt: chunk(m, s, dt)
        return _run_bench(args, grid, model, state, chunk_call, nx, ny, nz)

    model = bz.make_model(grid, advection=bz.WENO(5), potential_temperature=300.0,
                          microphysics=microphysics, coriolis=bz.FPlane(1e-4),
                          constants=constants)

    def theta0(x, y, z):
        bubble = 0.5 * jnp.exp(-((x - 6400.0) ** 2 + (y - 6400.0) ** 2
                                 + (z - 800.0) ** 2) / 500.0 ** 2)
        strat = jnp.where(z > 1000.0, 3e-3 * (z - 1000.0), 0.0)
        return 300.0 + strat + bubble

    state = bz.initial_state(model, theta=theta0,
                             qt=(lambda x, y, z: 0.008 * jnp.exp(-z / 1500.0))
                             if args.moist else None)

    chunk = jax.jit(
        lambda m, s, dt: jax.lax.fori_loop(
            0, 10, lambda _, st: ssp_rk3_step(m, st, dt), s),
        donate_argnums=(1,))
    return _run_bench(args, grid, model, state, chunk, nx, ny, nz)


def _run_bench(args, grid, model, state, chunk, nx, ny, nz) -> int:
    import jax
    import jax.numpy as jnp

    # Warmup (compile + first run).  NOTE: synchronization is via an actual
    # device→host readback — block_until_ready through the remote-execution
    # relay does not reliably await completion, which silently inflates
    # throughput numbers.  At least TWO warmup chunks: the first call runs
    # on the freshly-built state's layouts, the second on the chunk's own
    # (donated) output layouts — a one-chunk warmup leaves that relayout
    # recompile inside the timed region (measured +4 ms/step at 256³).
    for _ in range(max(2, args.warmup // 10)):
        state = chunk(model, state, args.dt)
    _sync = float(jnp.sum(state.rho_theta))

    n_chunks = max(1, args.steps // 10)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state = chunk(model, state, args.dt)
    _sync = float(jnp.sum(state.rho_theta))
    elapsed = time.perf_counter() - t0

    steps = n_chunks * 10
    time_per_step = elapsed / steps
    gps = nx * ny * nz / time_per_step

    # The reference publishes no absolute numbers (BASELINE.json "published": {});
    # vs_baseline reports against the north-star working target of 1e9
    # grid-points/s/chip on the canonical case (256^3 BOMEX for --case bomex).
    result = {
        "metric": "grid_points_per_second",
        "value": round(gps, 1),
        "unit": "points/s",
        "vs_baseline": round(gps / 1.0e9, 4),
        "config": {
            "case": args.case,
            "size": args.size, "advection": "WENO5",
            "dynamics": args.dynamics,
            "dtype": "float32",
            "moist": bool(args.moist or args.case == "bomex"),
            "steps": steps, "time_per_step_seconds": round(time_per_step, 6),
            "device": str(jax.devices()[0]).replace(" ", "_"),
        },
    }
    if getattr(args, "pallas_fallback", False):
        result["config"]["pallas_fallback"] = True
    if getattr(args, "terrain", False):
        result["config"]["terrain"] = "schaer_ridge"
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
