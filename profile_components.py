"""Per-component wall timing on the real chip (tendencies / projection / FFT).

TPU analogue of the reference's ``benchmarking/src/tendency_profiling.jl``:
wall-times individual hot paths and reports grid-points/s per kernel.
"""

import argparse
import time

import jax
import jax.numpy as jnp


def _readback(out):
    """Force a device→host readback: on the axon tunnel
    ``block_until_ready`` does not reliably await remote completion
    (CLAUDE.md), so sum one leaf and pull the scalar."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf))


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _readback(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _readback(out)
    return (time.perf_counter() - t0) / n


def profile_compressible(nx, ny, nz, substep_floattype=None):
    """Per-phase breakdown of the split-explicit compressible step:
    diagnose / slow tendencies / acoustic fast loop / full step."""
    import breeze_tpu as bz
    from breeze_tpu.dynamics.compressible import (
        SplitExplicitTimeDiscretization, Perturbations, acoustic_rk3_step,
        acoustic_substep_loop, compressible_diagnose,
        compressible_initial_state, make_compressible_model, slow_tendencies,
        stage_caches, substep_count)

    grid = bz.make_grid(size=(nx, ny, nz), extent=(12800.0, 12800.0, 3200.0),
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                        halo=3, dtype=jnp.float32)
    td = SplitExplicitTimeDiscretization(substep_floattype=substep_floattype)
    model = make_compressible_model(grid, advection=bz.WENO(5),
                                    coriolis=bz.FPlane(1e-4),
                                    time_discretization=td)
    state = compressible_initial_state(
        model, theta=lambda x, y, z: 300.0 + 0.5 * jnp.exp(
            -((x - 6400.0) ** 2 + (y - 6400.0) ** 2
              + (z - 800.0) ** 2) / 500.0 ** 2))
    npts = nx * ny * nz
    dt = 0.25
    N = substep_count(model, dt)
    print(f"compressible {nx}x{ny}x{nz}, dt={dt}, substeps N={N}, "
          f"substep dtype={substep_floattype or 'f32'}")

    full = jax.jit(lambda m, s: acoustic_rk3_step(m, s, dt))
    t = timeit(full, model, state)
    print(f"full acoustic step  : {t * 1e3:8.2f} ms  {npts / t / 1e9:6.2f} Gpt/s")

    diag = jax.jit(compressible_diagnose)
    t = timeit(diag, model, state)
    print(f"diagnose            : {t * 1e3:8.2f} ms")

    def slow(m, s):
        return slow_tendencies(m, s, compressible_diagnose(m, s))

    t = timeit(jax.jit(slow), model, state)
    print(f"slow tendencies     : {t * 1e3:8.2f} ms (x3 stages)")

    def fast(m, s):
        aux = compressible_diagnose(m, s)
        caches = stage_caches(m, s, aux)
        G = slow_tendencies(m, s, aux)
        zero = jnp.zeros(m.grid.shape, m.grid.dtype)
        pert = Perturbations(rho=zero, rho_u=zero, rho_v=zero, rho_w=zero,
                             rho_theta=zero, sum_rho_u=zero, sum_rho_v=zero,
                             sum_rho_w=zero)
        return acoustic_substep_loop(m, caches, G, pert, dt / N, N,
                                     gate_first=True)

    t_fast_tot = timeit(jax.jit(fast), model, state)
    t_pre = timeit(jax.jit(slow), model, state)
    print(f"fast loop (N={N:3d})   : {(t_fast_tot - t_pre) * 1e3:8.2f} ms "
          f"(~{(t_fast_tot - t_pre) / max(N, 1) * 1e3:6.3f} ms/substep; "
          f"x3 stages, stage N varies)")


def profile_bomex(nx, ny, nz):
    """Per-piece breakdown of the canonical BOMEX step (the vs_baseline
    config): fused advective tendencies / closure / sat-adjust diagnose /
    surface+forcings / projection."""
    import jax.numpy as jnp

    import breeze_tpu as bz
    from breeze_tpu import fields as fl
    from breeze_tpu import model as M
    from breeze_tpu.timesteppers import ssp_rk3_step

    class _A:
        size = f"{nx}x{ny}x{nz}"
        svp = "clausius_clapeyron"

    import bench
    grid, model, state = bench._build_bomex(_A, nx, ny, nz)
    npts = nx * ny * nz
    dt = 1.0

    full = jax.jit(lambda m, s: ssp_rk3_step(m, s, dt))
    t = timeit(full, model, state, n=10)
    print(f"full step           : {t * 1e3:8.2f} ms  {npts / t / 1e9:6.2f} Gpt/s")

    diag = jax.jit(M.diagnose)
    t_diag = timeit(diag, model, state, n=10)
    print(f"diagnose (sat adj)  : {t_diag * 1e3:8.2f} ms (x3 stages)")

    tend = jax.jit(lambda m, s: M.compute_tendencies(m, s))
    t = timeit(tend, model, state, n=10)
    print(f"tendencies (1 stage): {t * 1e3:8.2f} ms (incl diagnose)")

    def closure_only(m, s):
        from breeze_tpu.physics.closures import closure_tendencies
        aux = M.diagnose(m, s)
        g = m.grid
        so = m.stencil_ops()
        u_pad = fl.pad(aux.u, g, fl.CCF)
        v_pad = fl.pad(aux.v, g, fl.CFC)
        w_pad = fl.pad(aux.w, g, fl.FCC)
        return closure_tendencies(m, so, aux, u_pad, v_pad, w_pad)

    t = timeit(jax.jit(closure_only), model, state, n=10)
    print(f"closure jnp(+dg+pad): {t * 1e3:8.2f} ms")

    # In-step fused kernels, isolated (each incl. diagnose + its pads so the
    # deltas vs t_diag are the true kernel costs).
    from breeze_tpu.pallas_kernels import advection as padv
    from breeze_tpu.pallas_kernels import closure as pclo
    from breeze_tpu.pallas_kernels import tendency as ptend
    from breeze_tpu.pallas_kernels.momentum import H as _PH

    def mega_only(m, s):
        aux = M.diagnose(m, s)
        g = m.grid
        pz = lambda a, loc: padv.pad_zy(a, g, loc)
        pzu, pzv, pzw = pz(aux.u, fl.CCF), pz(aux.v, fl.CFC), pz(aux.w, fl.FCC)
        col_c, col_f = M._padded_reference_columns(m, halo=_PH)
        chi = s.rho_theta / m.reference.rho_col
        scal_pads = [pz(chi, fl.CCC), pz(aux.qt, fl.CCC)]
        b_pad = pz(aux.buoyancy_force, fl.CCC)
        f_cor = None if m.coriolis is None else m.coriolis.f
        return ptend.fused_tendency_pallas(g, pzu, pzv, pzw, scal_pads,
                                           col_c, col_f, coriolis_f=f_cor,
                                           buoy_cols=None, b_pad=b_pad)

    t = timeit(jax.jit(mega_only), model, state, n=10)
    print(f"mega kernel(+dg+pad): {t * 1e3:8.2f} ms  (delta {1e3*(t-t_diag):.2f})")

    def pclo_only(m, s):
        aux = M.diagnose(m, s)
        g = m.grid
        c = m.constants
        pz = lambda a, loc: padv.pad_zy(a, g, loc)
        pzu, pzv, pzw = pz(aux.u, fl.CCF), pz(aux.v, fl.CFC), pz(aux.w, fl.FCC)
        chi = s.rho_theta / m.reference.rho_col
        delta_rv = c.Rv / c.Rd - 1.0
        th_b = aux.theta * (1.0 + delta_rv * aux.q.vapor
                            - aux.q.liquid - aux.q.ice)
        return pclo.closure_tendencies_pallas(
            m, pzu, pzv, pzw, pz(chi, fl.CCC), pz(aux.qt, fl.CCC),
            pz(th_b, fl.CCC))

    t = timeit(jax.jit(pclo_only), model, state, n=10)
    print(f"clo  kernel(+dg+pad): {t * 1e3:8.2f} ms  (delta {1e3*(t-t_diag):.2f})")

    def satadj_only(m, s):
        from breeze_tpu.physics.microphysics import saturation_adjust
        ref = m.reference
        theta = s.rho_theta / ref.rho_col
        qt = s.rho_qt / ref.rho_col
        return saturation_adjust(theta, qt, ref.p_col, m.constants,
                                 m.microphysics, m.p_standard)

    t = timeit(jax.jit(satadj_only), model, state, n=10)
    print(f"sat-adjust only     : {t * 1e3:8.2f} ms")

    def pads_only(m, s):
        aux = M.diagnose(m, s)
        g = m.grid
        pz = lambda a, loc: padv.pad_zy(a, g, loc)
        chi = s.rho_theta / m.reference.rho_col
        return (pz(aux.u, fl.CCF), pz(aux.v, fl.CFC), pz(aux.w, fl.FCC),
                pz(chi, fl.CCC), pz(aux.qt, fl.CCC),
                pz(aux.buoyancy_force, fl.CCC))

    t = timeit(jax.jit(pads_only), model, state, n=10)
    print(f"6 pads     (+diag)  : {t * 1e3:8.2f} ms  (delta {1e3*(t-t_diag):.2f})")

    def sforce_only(m, s):
        from breeze_tpu.physics.surface import apply_boundary_flux_tendencies
        aux = M.diagnose(m, s)
        zero = jnp.zeros(m.grid.shape, m.grid.dtype)
        G = M.State(rho_u=zero, rho_v=zero, rho_w=zero, rho_theta=zero,
                    rho_qt=zero, tracers={}, time=jnp.zeros_like(s.time))
        if m.boundary_fluxes is not None:
            G = apply_boundary_flux_tendencies(m, s, aux, G)
        for forcing in m.forcings:
            G = forcing(m, s, aux, G)
        return G

    t = timeit(jax.jit(sforce_only), model, state, n=10)
    print(f"surface+forcings(+d): {t * 1e3:8.2f} ms  (delta {1e3*(t-t_diag):.2f})")

    proj = jax.jit(lambda m, ru, rv, rw: M.pressure_projection(m, ru, rv, rw, dt))
    t = timeit(proj, model, state.rho_u, state.rho_v, state.rho_w, n=10)
    print(f"projection          : {t * 1e3:8.2f} ms")

    def negmoist(m, s):
        from breeze_tpu.physics.microphysics import (
            apply_negative_moisture_correction)
        return apply_negative_moisture_correction(m, s)

    t = timeit(jax.jit(negmoist), model, state, n=10)
    print(f"negative-moisture   : {t * 1e3:8.2f} ms (x1 per step)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="256x256x128")
    p.add_argument("--dynamics", choices=("anelastic", "compressible"),
                   default="anelastic")
    p.add_argument("--substep-floattype", default=None)
    p.add_argument("--moist", action="store_true",
                   help="saturation-adjustment moist thermodynamics")
    p.add_argument("--case", choices=("bubble", "bomex"), default="bubble")
    args = p.parse_args()
    nx, ny, nz = (int(s) for s in args.size.split("x"))

    if args.case == "bomex":
        profile_bomex(nx, ny, nz)
        return
    if args.dynamics == "compressible":
        profile_compressible(nx, ny, nz, args.substep_floattype)
        return

    import breeze_tpu as bz
    from breeze_tpu import fields as fl
    from breeze_tpu import model as M
    from breeze_tpu.timesteppers import ssp_rk3_step

    grid = bz.make_grid(size=(nx, ny, nz), extent=(12800.0, 12800.0, 3200.0),
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                        halo=3, dtype=jnp.float32)
    micro = (bz.SaturationAdjustment(equilibrium=bz.WarmPhaseEquilibrium())
             if args.moist else None)
    model = bz.make_model(grid, advection=bz.WENO(5),
                          potential_temperature=300.0, microphysics=micro)
    state = bz.initial_state(
        model, theta=lambda x, y, z: 300.0 + 0.5 * jnp.exp(
            -((x - 6400.0) ** 2 + (y - 6400.0) ** 2 + (z - 800.0) ** 2) / 500.0 ** 2),
        qt=(lambda x, y, z: 0.012 * jnp.exp(-z / 2000.0)) if args.moist
        else None)

    npts = nx * ny * nz

    full = jax.jit(lambda m, s: ssp_rk3_step(m, s, 0.5))
    t = timeit(full, model, state)
    print(f"full step           : {t * 1e3:8.2f} ms  {npts / t / 1e9:6.2f} Gpt/s")

    tend = jax.jit(lambda m, s: M.compute_tendencies(m, s))
    t = timeit(tend, model, state)
    print(f"tendencies (1 stage): {t * 1e3:8.2f} ms  {npts / t / 1e9:6.2f} Gpt/s")

    diag = jax.jit(lambda m, s: M.diagnose(m, s))
    t = timeit(diag, model, state)
    print(f"diagnose            : {t * 1e3:8.2f} ms")

    proj = jax.jit(lambda m, ru, rv, rw: M.pressure_projection(m, ru, rv, rw, 0.5))
    t = timeit(proj, model, state.rho_u, state.rho_v, state.rho_w)
    print(f"projection          : {t * 1e3:8.2f} ms")

    solve = jax.jit(lambda m, d: m.solver.solve(d, 0.5))
    t = timeit(solve, model, state.rho_theta)
    print(f"poisson solve       : {t * 1e3:8.2f} ms")

    fft = jax.jit(lambda x: jnp.fft.irfft2(jnp.fft.rfft2(x, axes=(1, 2)),
                                           s=(ny, nx), axes=(1, 2)))
    t = timeit(fft, state.rho_theta)
    print(f"rfft2+irfft2        : {t * 1e3:8.2f} ms")

    padf = jax.jit(lambda x: fl.pad(x, grid, fl.CCC).sum())
    t = timeit(padf, state.rho_theta)
    print(f"pad(+reduce)        : {t * 1e3:8.2f} ms")

    # advection alone
    from breeze_tpu import advection as adv
    so = model.stencil_ops()

    def adv_only(m, s):
        aux = M.diagnose(m, s)
        g = m.grid
        rho_r_pad = fl.pad(jnp.broadcast_to(m.reference.rho_col, g.shape), g, fl.CCC)
        return adv.div_rho_u_c(so, m.scalar_advection, rho_r_pad,
                               fl.pad(aux.u, g, fl.CCF), fl.pad(aux.v, g, fl.CFC),
                               fl.pad(aux.w, g, fl.FCC), fl.pad(aux.theta, g, fl.CCC))

    t = timeit(jax.jit(adv_only), model, state)
    print(f"scalar WENO divρUc  : {t * 1e3:8.2f} ms")

    def mom_only(m, s):
        aux = M.diagnose(m, s)
        g = m.grid
        return adv.momentum_flux_divergence(
            so, m.momentum_advection,
            fl.pad(s.rho_u, g, fl.CCF), fl.pad(s.rho_v, g, fl.CFC),
            fl.pad(s.rho_w, g, fl.FCC), fl.pad(aux.u, g, fl.CCF),
            fl.pad(aux.v, g, fl.CFC), fl.pad(aux.w, g, fl.FCC))

    t = timeit(jax.jit(mom_only), model, state)
    print(f"momentum WENO div   : {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
