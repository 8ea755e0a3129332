"""Fused Pallas Smagorinsky-Lilly closure kernel.

ONE VMEM pass computes the full SGS stage of the anelastic model: the six
staggered strain components, |S|² with Lilly's stratification correction,
the eddy viscosity, the ρ-weighted stress divergences at all three momentum
locations, and the diffusive flux divergences for θ and qᵗ.  The jnp path
(``physics/closures.py::closure_tendencies``) materializes ~15 full-field
intermediates (strains, interpolated squares, ν, six stresses + their halo
pads, scalar fluxes) — measured ≈13 ms/stage at 256³ on v5e; this kernel
reads the five (six moist) input windows once.

Numerics identical to the jnp path (same staggered formulas, same
interpolations, same wall handling):

- strains from the SAME halo-padded windows (``pad_zy``) the advection
  kernels use, so wall ghosts (mirror / odd-reflection) match ``fl.pad``;
- ν is computed on a (bz+2, by+2) extended center slab and MIRRORED at the
  global z walls (row −1 ← row 0, row nz ← row nz−1) exactly like
  ``fl.pad(nu_c, CCC)`` in the jnp path — strains evaluated inside the
  ghost region would otherwise differ from the mirrored interior values;
- wall-normal diffusive fluxes vanish automatically through the mirror
  ghosts (∂z c = 0 across the wall), matching the explicit ``.at[0]`` zero.

Reference: Oceananigans ``SmagorinskyLilly`` + density-weighting wrappers
(``src/TurbulenceClosures/TurbulenceClosures.jl:52-101``).

Envelope: SmagorinskyLilly, explicit (not vertically_implicit), anelastic
ρ-columns, periodic x/y, f32, WENO-kernel block constraints.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .advection import H, HY, bcast_col, force_interpret
from .momentum import _pick_block


def _smag_block(bz, by, nx, inv_dx, inv_dy, prandtl, buoy_corr, g_acc,
                has_qt, i, n_zblocks,
                u, v, w, thb, th, qt,
                colc, colf, invdzc_e, invdzf_e, cdelta2_e):
    """Closure tendencies on one (z, y) block.

    Window coordinates: interior block cell (k, j) sits at window row
    (H + k, HY + j).  Column args are window-length (wz, 1, nx) slices of
    z-halo-padded columns: ``invdzc_e[H+k]`` = 1/Δz_c[k] etc.

    Returns (gu, gv, gw, gth, gqt) block-sized.
    """
    wz = bz + 2 * H

    def xs(a, o):
        return pltpu.roll(a, (-o) % nx, 2) if o % nx else a

    # generic window slice: z rows [H+z0, H+z0+nzr), y rows [HY+y0, ...)
    def sl(a, z0, nzr, y0, nyr):
        return a[H + z0: H + z0 + nzr, HY + y0: HY + y0 + nyr, :]

    def colw(c, z0, nzr):                      # column slice aligned with sl
        return c[H + z0: H + z0 + nzr, :, :]

    # ---- strain components --------------------------------------------
    # Extended center slab E: z -1..bz (bz+2), y -1..by (by+2) — everything
    # ν needs.  dif helpers act along an axis of an already-sliced slab.
    EZ0, EZN = -1, bz + 2
    EY0, EYN = -1, by + 2

    uE1 = sl(u, EZ0, EZN, EY0, EYN)
    S11 = (xs(uE1, 1) - uE1) * inv_dx                       # centers, E slab

    vE = sl(v, EZ0, EZN, EY0, EYN + 1)                      # y faces -1..by+1
    S22 = (vE[:, 1:, :] - vE[:, :-1, :]) * inv_dy           # centers, E slab

    wE = sl(w, EZ0, EZN + 1, EY0, EYN)                      # z faces -1..bz+1
    S33 = (wE[1:, :, :] - wE[:-1, :, :]) * colw(invdzc_e, EZ0, EZN)

    # S12 at (zc, yf, xf) on slab z -1..bz, y faces -1..by+1 (by+3 rows)
    u12 = sl(u, EZ0, EZN, EY0 - 1, EYN + 2)                 # y cells -2..by+1
    dy_u = (u12[:, 1:, :] - u12[:, :-1, :]) * inv_dy        # y faces -1..by+1
    v12 = sl(v, EZ0, EZN, EY0, EYN + 1)                     # y faces -1..by+1
    dx_v = (v12 - xs(v12, -1)) * inv_dx
    S12 = 0.5 * (dy_u + dx_v)                               # (bz+2, by+3, nx)

    # S13 at (zf, yc, xf) on slab z faces -1..bz+1 (bz+3), y -1..by (by+2)
    u13 = sl(u, EZ0 - 1, EZN + 2, EY0, EYN)                 # z cells -2..bz+1
    dz_u = (u13[1:, :, :] - u13[:-1, :, :]) * colw(invdzf_e, EZ0, EZN + 1)
    w13 = sl(w, EZ0, EZN + 1, EY0, EYN)                     # z faces -1..bz+1
    dx_w = (w13 - xs(w13, -1)) * inv_dx
    S13 = 0.5 * (dz_u + dx_w)                               # (bz+3, by+2, nx)

    # S23 at (zf, yf, xc) on slab z faces -1..bz+1, y faces -1..by+1
    v23 = sl(v, EZ0 - 1, EZN + 2, EY0, EYN + 1)
    dz_v = (v23[1:, :, :] - v23[:-1, :, :]) * colw(invdzf_e, EZ0, EZN + 1)
    w23 = sl(w, EZ0, EZN + 1, EY0 - 1, EYN + 2)             # y cells -2..by+1
    dy_w = (w23[:, 1:, :] - w23[:, :-1, :]) * inv_dy
    S23 = 0.5 * (dz_v + dy_w)                               # (bz+3, by+3, nx)

    # ---- |S|² at centers on the E slab --------------------------------
    # off-diagonals interpolated center-ward with 4-point averages
    # (matches _corner_avg inverse in the jnp path: S12c[k,j] averages
    # corners (j, j+1) × (i, i+1)).
    S12c = 0.25 * (S12[:, :-1, :] + S12[:, 1:, :]
                   + xs(S12[:, :-1, :], 1) + xs(S12[:, 1:, :], 1))
    S13c = 0.25 * (S13[:-1, :, :] + S13[1:, :, :]
                   + xs(S13[:-1, :, :], 1) + xs(S13[1:, :, :], 1))
    S23c = 0.25 * (S23[:-1, :-1, :] + S23[:-1, 1:, :]
                   + S23[1:, :-1, :] + S23[1:, 1:, :])
    S2 = 2.0 * (S11 * S11 + S22 * S22 + S33 * S33
                + 2.0 * (S12c * S12c + S13c * S13c + S23c * S23c))

    abs_S = jnp.sqrt(S2)
    if buoy_corr:
        # N² = (g/θᵥ) ∂zθᵥ at centers (E slab); Ri = N²/|S|²; ς clip.
        tE = sl(thb, EZ0 - 1, EZN + 2, EY0, EYN)            # z cells -2..bz+1
        dth_f = (tE[1:, :, :] - tE[:-1, :, :]) * colw(invdzf_e, EZ0, EZN + 1)
        dth = 0.5 * (dth_f[:-1, :, :] + dth_f[1:, :, :])    # centers, E slab
        # jnp path quirk: the TOP cell replicates its lower-face gradient
        # (concat([dthdz_f[1:], dthdz_f[-1:]]) in closures.py) instead of
        # using the mirror-ghost zero — match it exactly.
        kc = (jax.lax.broadcasted_iota(jnp.int32, dth.shape, 0)
              + i * bz - 1)
        dth = jnp.where(kc == n_zblocks * bz - 1, dth_f[:-1, :, :], dth)
        thE = sl(thb, EZ0, EZN, EY0, EYN)
        N2 = g_acc / jnp.maximum(thE, 1.0) * dth
        Ri = N2 / jnp.maximum(S2, 1e-20)
        zeta2 = jnp.maximum(0.0, 1.0 - Ri / prandtl)
        abs_S = abs_S * jnp.sqrt(zeta2)

    nu = colw(cdelta2_e, EZ0, EZN) * abs_S                  # (CΔ)²|S|ς, E slab

    # ---- global z-wall mirror of ν (matches fl.pad(nu_c, CCC)) --------
    # E-slab row 0 is global cell i·bz − 1; for the bottom block that is
    # the ghost row, which the jnp path fills by mirroring row 0.
    kz = jax.lax.broadcasted_iota(jnp.int32, nu.shape, 0) + i * bz - 1
    nz_glob = n_zblocks * bz
    nu = jnp.where(kz < 0, jnp.roll(nu, -1, 0), nu)         # row -1 ← row 0
    nu = jnp.where(kz > nz_glob - 1, jnp.roll(nu, 1, 0), nu)

    # ---- ρν at the stress locations ------------------------------------
    # interior-sized pieces; E-slab index of interior cell k is k+1 (z),
    # j+1 (y).
    def nuc(z0, nzr, y0, nyr):      # ν slab view in E coordinates
        return nu[1 + z0: 1 + z0 + nzr, 1 + y0: 1 + y0 + nyr, :]

    rc = lambda z0, nzr: colw(colc, z0, nzr)
    rf = lambda z0, nzr: colw(colf, z0, nzr)

    # T11/T22/T33 at centers — needed on z 0..bz-1 (+x/y via rolls/slabs)
    rho_nu_c = rc(0, bz) * nuc(0, bz, -1, by + 2)           # y -1..by
    T11 = -2.0 * rho_nu_c[:, 1:-1, :] * S11[1:-1, 1:-1, :]
    T22 = -2.0 * rho_nu_c * S22[1:-1, :, :]                 # y -1..by
    T33c = rc(-1, bz + 2) * nuc(-1, bz + 2, 0, by)          # z -1..bz
    T33 = -2.0 * T33c * S33[:, 1:-1, :]

    # T12 at (zc, yf, xf): ν 4-pt corner avg over (x-1, y-1); y faces 0..by
    nu12 = nuc(0, bz, -1, by + 2)                           # y cells -1..by
    nu_xy = 0.25 * (nu12[:, 1:, :] + xs(nu12[:, 1:, :], -1)
                    + nu12[:, :-1, :] + xs(nu12[:, :-1, :], -1))
    T12 = -2.0 * rc(0, bz) * nu_xy * S12[1:-1, 1:-1, :]     # y faces 0..by

    # T13 at (zf, yc, xf): ν avg over (x-1, z-1); z faces 0..bz
    nu13 = nuc(-1, bz + 2, 0, by)                           # z cells -1..bz
    nu_xz = 0.25 * (nu13[1:, :, :] + xs(nu13[1:, :, :], -1)
                    + nu13[:-1, :, :] + xs(nu13[:-1, :, :], -1))
    T13 = -2.0 * rf(0, bz + 1) * nu_xz * S13[1:-1, 1:-1, :]

    # T23 at (zf, yf, xc): ν avg over (y-1, z-1); z faces 0..bz, y faces 0..by
    nu23 = nuc(-1, bz + 2, -1, by + 2)
    nu_yz = 0.25 * (nu23[1:, 1:, :] + nu23[1:, :-1, :]
                    + nu23[:-1, 1:, :] + nu23[:-1, :-1, :])
    T23 = -2.0 * rf(0, bz + 1) * nu_yz * S23[1:-1, 1:-1, :]

    # ---- stress divergences --------------------------------------------
    invdzc_b = colw(invdzc_e, 0, bz)
    # G_u at (zc, yc, xf) = −[dx_cf(T11) + dy_fc(T12) + dz_fc(T13)]
    gu = -((T11 - xs(T11, -1)) * inv_dx
           + (T12[:, 1:, :] - T12[:, :-1, :]) * inv_dy
           + (T13[1:, :, :] - T13[:-1, :, :]) * invdzc_b)
    # G_v at (zc, yf, xc) = −[dx_fc(T12) + dy_cf(T22) + dz_fc(T23)]
    T12v = T12[:, :-1, :]                                   # y faces 0..by-1
    gv = -((xs(T12v, 1) - T12v) * inv_dx
           + (T22[:, 1:-1, :] - T22[:, :-2, :]) * inv_dy
           + (T23[1:, :-1, :] - T23[:-1, :-1, :]) * invdzc_b)
    # G_w at (zf, yc, xc) = −[dx_fc(T13) + dy_fc(T23) + dz_cf(T33)]
    T13w = T13[:-1, :, :]                                   # z faces 0..bz-1
    invdzf_b = colw(invdzf_e, 0, bz)
    gw = -((xs(T13w, 1) - T13w) * inv_dx
           + (T23[:-1, 1:, :] - T23[:-1, :-1, :]) * inv_dy
           + (T33[1:-1, :, :] - T33[:-2, :, :]) * invdzf_b)

    # ---- scalar diffusive flux divergences -----------------------------
    kap = nu * (1.0 / prandtl)                              # κ on E slab

    def scalar_diffusion(c):
        # faces from mirror-consistent windows: wall-normal flux is zero
        # automatically (∂z c = 0 across the mirror ghost).
        cz = sl(c, -1, bz + 2, 0, by)                       # z cells -1..bz
        Fz = (rf(0, bz + 1)
              * 0.5 * (kap[:-1, 1:-1, :] + kap[1:, 1:-1, :])
              * (cz[1:, :, :] - cz[:-1, :, :]) * colw(invdzf_e, 0, bz + 1))
        cy = sl(c, 0, bz, -1, by + 2)                       # y cells -1..by
        Fy = (rc(0, bz)
              * 0.5 * (kap[1:-1, :-1, :] + kap[1:-1, 1:, :])
              * (cy[:, 1:, :] - cy[:, :-1, :]) * inv_dy)    # y faces 0..by
        cxs = sl(c, 0, bz, 0, by)
        kx = kap[1:-1, 1:-1, :]
        Fx = (rc(0, bz) * 0.5 * (kx + xs(kx, -1))
              * (cxs - xs(cxs, -1)) * inv_dx)               # x faces
        return ((xs(Fx, 1) - Fx) * inv_dx
                + (Fy[:, 1:, :] - Fy[:, :-1, :]) * inv_dy
                + (Fz[1:, :, :] - Fz[:-1, :, :]) * invdzc_b)

    gth = scalar_diffusion(th)
    gqt = scalar_diffusion(qt) if has_qt else None
    return gu, gv, gw, gth, gqt


def _make_kernel(bz, by, nx, inv_dx, inv_dy, prandtl, buoy_corr, g_acc,
                 has_qt, has_thb, n_zblocks):
    wz, wy = bz + 2 * H, by + 2 * HY
    n_win = 4 + (1 if has_qt else 0) + (1 if has_thb else 0)

    def kernel(*refs):
        it = iter(refs)
        u_hbm, v_hbm, w_hbm, th_hbm = (next(it) for _ in range(4))
        qt_hbm = next(it) if has_qt else None
        thb_hbm = next(it) if has_thb else None
        colc_ref, colf_ref, invdzc_ref, invdzf_ref, cd2_ref = (
            next(it) for _ in range(5))
        gu_ref, gv_ref, gw_ref, gth_ref = (next(it) for _ in range(4))
        gqt_ref = next(it) if has_qt else None
        wins = [next(it) for _ in range(n_win)]
        sems = next(it)

        i = pl.program_id(0)
        j = pl.program_id(1)
        srcs = [u_hbm, v_hbm, w_hbm, th_hbm]
        if has_qt:
            srcs.append(qt_hbm)
        if has_thb:
            srcs.append(thb_hbm)
        for n, (src, dst) in enumerate(zip(srcs, wins)):
            pltpu.make_async_copy(
                src.at[pl.ds(i * bz, wz), pl.ds(j * by, wy), :],
                dst, sems.at[n]).start()
        for n, (src, dst) in enumerate(zip(srcs, wins)):
            pltpu.make_async_copy(
                src.at[pl.ds(i * bz, wz), pl.ds(j * by, wy), :],
                dst, sems.at[n]).wait()

        u, v, w, th = (wins[k][:] for k in range(4))
        qt = wins[4][:] if has_qt else None
        thb = wins[4 + (1 if has_qt else 0)][:] if has_thb else th

        cslice = lambda r: r[pl.ds(i * bz, wz), :, :]
        gu, gv, gw, gth, gqt = _smag_block(
            bz, by, nx, inv_dx, inv_dy, prandtl, buoy_corr, g_acc,
            has_qt, i, n_zblocks,
            u, v, w, thb, th, qt,
            cslice(colc_ref), cslice(colf_ref), cslice(invdzc_ref),
            cslice(invdzf_ref), cslice(cd2_ref))
        gu_ref[:] = gu
        gv_ref[:] = gv
        gw_ref[:] = gw
        gth_ref[:] = gth
        if has_qt:
            gqt_ref[:] = gqt

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "inv_dx", "inv_dy", "nz", "ny", "nx", "bz", "by", "prandtl",
    "buoy_corr", "g_acc", "has_qt", "has_thb", "interpret"))
def _run(u_pad, v_pad, w_pad, th_pad, qt_pad, thb_pad, colc, colf,
         invdzc, invdzf, cd2, inv_dx, inv_dy, nz, ny, nx, bz, by,
         prandtl, buoy_corr, g_acc, has_qt, has_thb, interpret=False):
    kernel = _make_kernel(bz, by, nx, inv_dx, inv_dy, prandtl, buoy_corr,
                          g_acc, has_qt, has_thb, nz // bz)
    wz, wy = bz + 2 * H, by + 2 * HY
    grid = (nz // bz, ny // by)
    n_win = 4 + (1 if has_qt else 0) + (1 if has_thb else 0)
    win = lambda: pltpu.VMEM((wz, wy, nx), jnp.float32)
    out = jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32)
    n_out = 5 if has_qt else 4
    args = [u_pad, v_pad, w_pad, th_pad]
    if has_qt:
        args.append(qt_pad)
    if has_thb:
        args.append(thb_pad)
    args += [colc, colf, invdzc, invdzf, cd2]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_win
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec((bz, by, nx), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)] * n_out,
        out_shape=[out] * n_out,
        scratch_shapes=[win() for _ in range(n_win)]
        + [pltpu.SemaphoreType.DMA((n_win,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def supported(grid, closure) -> bool:
    from ..grid import Topology
    from ..physics.closures import SmagorinskyLilly

    return (isinstance(closure, SmagorinskyLilly)
            and not closure.vertically_implicit
            and grid.x_topology == Topology.PERIODIC
            and grid.y_topology == Topology.PERIODIC
            and not grid.is_latlon
            and grid.dtype == jnp.float32
            and grid.halo >= H
            and grid.nx >= 128 and grid.ny >= 8 and grid.nz >= 8
            and _pick_block(grid.nz, (8, 16, 4)) is not None
            and _pick_block(grid.ny, (32, 16, 8, 64)) is not None)


def closure_tendencies_pallas(model, u_pad_zy, v_pad_zy, w_pad_zy,
                              th_pad_zy, qt_pad_zy=None, thb_pad_zy=None,
                              interpret=False):
    """Fused SGS tendencies; inputs pre-padded by :func:`advection.pad_zy`.

    ``thb_pad_zy``: θᵥ window for the Lilly correction (None → dry, uses
    the θ window).  Returns ``(G_u, G_v, G_w, G_theta, G_qt)`` matching
    ``physics.closures.closure_tendencies`` (ρ-weighted, anelastic).
    """
    g = model.grid
    closure = model.closure
    nz, ny, nx = g.shape
    bz = _pick_block(nz, (8, 16, 4))
    by = _pick_block(ny, (32, 16, 8, 64))
    from ..model import _pad_center_column, _padded_reference_columns

    colc, colf = _padded_reference_columns(model, halo=H)
    import numpy as np

    dz_c = np.asarray(g.dz_c_meta, np.float64)
    delta = (g.dx * g.dy * dz_c) ** (1.0 / 3.0)
    cd2 = (closure.coefficient * delta) ** 2
    pad_col = lambda c: bcast_col(
        _pad_center_column(g, jnp.asarray(c, jnp.float32), H), nx)
    cd2_col = pad_col(cd2)
    invdzc = pad_col(1.0 / dz_c)
    # face spacings at faces 0..nz-1; ghost rows edge-replicated (their
    # strain values only feed mirrored-away ν ghost rows)
    dz_f = np.asarray(g.dz_f_meta, np.float64)[: nz]
    invdzf = pad_col(1.0 / dz_f)

    has_qt = qt_pad_zy is not None
    has_thb = thb_pad_zy is not None
    outs = _run(u_pad_zy, v_pad_zy, w_pad_zy, th_pad_zy, qt_pad_zy,
                thb_pad_zy,
                bcast_col(colc, nx), bcast_col(colf, nx),
                invdzc, invdzf, cd2_col,
                float(1.0 / g.dx), float(1.0 / g.dy),
                nz, ny, nx, bz, by,
                float(closure.prandtl), bool(closure.buoyancy_correction),
                float(model.constants.gravitational_acceleration),
                has_qt, has_thb,
                interpret=interpret or force_interpret())
    if has_qt:
        return outs[0], outs[1], outs[2], outs[3], outs[4]
    return outs[0], outs[1], outs[2], outs[3], None
