"""Fused anelastic tendency mega-kernel.

ONE Pallas kernel computes the entire advective tendency stage of the
anelastic model: all nine WENO5 momentum reconstructions, the scalar WENO5
flux divergences for every advected specific scalar (θ, qᵗ, tracers — all
sharing the reference-column mass fluxes), the f-plane Coriolis terms, and
the buoyancy force interpolated to z-faces — reading each velocity window
from HBM exactly once.

This replaces the round-2 structure (separate momentum + per-scalar
kernels, jnp Coriolis over full halo pads, jnp buoyancy pad + interp) whose
HBM traffic re-read the u/v/w windows per kernel and materialized full
halo-padded copies whenever Coriolis was active.  The reference computes
the same stage as a sequence of per-field KernelAbstractions kernels
(``update_atmosphere_model_state.jl:294-387``, kernel functions in
``dynamics_kernel_functions.jl``); here the whole stage is one VMEM pass.

Anelastic structure exploited:
- ρ is the z-only reference column → momenta and interface mass fluxes are
  formed in VMEM from ρᵣ(z)·(u,v,w) (3 field reads, nothing materialized);
- the scalar mass fluxes are SHARED across all advected scalars (the jnp
  path re-interpolates them per scalar);
- dry θˡⁱ buoyancy is a closed form of the θ window
  (b = gρᵣ(1 − Tᵣ/(Π·θ)), exact for q ≡ 0), so the dry path needs NO
  buoyancy input field; moist paths pass the precomputed buoyancy force as
  one extra window.

Restrictions (jnp fallback otherwise): periodic x/y, bounded or periodic z
via the host-side pad, WENO5 (non-bounds) for momentum AND scalars,
float32, rectilinear, Coriolis ∈ {None, FPlane}.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .advection import H, HY, _weno_face, bcast_col, force_interpret
from .closure import _smag_block
from .momentum import _pick_block, _weno_sel, momentum_divs


def _scalar_div(bz, by, nx, inv_dx, inv_dy, c, ru, rv, rw_col_mf, invdzc,
                bounds=False):
    """−∇·(ρuc) on one block for a specific scalar ``c`` (window-shaped).

    ``ru``/``rv`` are the in-VMEM momenta windows (they ARE the interface
    mass fluxes: ρ is z-only so no x/y interpolation is needed);
    ``rw_col_mf`` is the z-face mass-flux slab ``0.5(ρ[k-1]+ρ[k])·w``
    (bz+1, by, nx) shared across scalars.  Numerics identical to
    ``pallas_kernels.advection`` (same getters, same upwind rule).
    """
    def xs(a, o):
        return pltpu.roll(a, (-o) % nx, 2) if o % nx else a

    def s(a, zo, yo):
        return a[H + zo: H + zo + bz, HY + yo: HY + yo + by, :]

    def sy(a, zo, y0):
        return a[H + zo: H + zo + bz, HY + y0: HY + y0 + by + 1, :]

    def sz(a, z0, yo):
        return a[H + z0: H + z0 + bz + 1, HY + yo: HY + yo + by, :]

    # x: mass flux at x-face i is ρᵣ(z)u[i] = ru[i]; F at faces, div at centers
    cs = s(c, 0, 0)
    mfx = s(ru, 0, 0)
    Fx = mfx * _weno_face(lambda o: xs(cs, o - 1), mfx, bounds)
    acc = (xs(Fx, 1) - Fx) * inv_dx

    # y: faces jy..jy+by (by+1 rows)
    mfy = sy(rv, 0, 0)
    Fy = mfy * _weno_face(lambda o: sy(c, 0, o - 1), mfy, bounds)
    acc = acc + (Fy[:, 1:, :] - Fy[:, :-1, :]) * inv_dy

    # z: faces k..k+bz (bz+1 slabs); mass flux slab precomputed
    Fz = rw_col_mf * _weno_face(lambda o: sz(c, o - 1, 0), rw_col_mf, bounds)
    acc = acc + (Fz[1:, :, :] - Fz[:-1, :, :]) * invdzc
    return -acc


def _make_kernel(bz: int, by: int, nx: int, inv_dx: float, inv_dy: float,
                 n_scalars: int, f_cor: float | None, dry_buoy: bool,
                 has_b: bool, scal_bounds: bool, clo=None, has_thb=False,
                 n_zblocks=0, n_yblocks=0, substep=False,
                 fadd_mask=(), fdamp_mask=()):
    """``clo``: optional static SGS-closure config
    ``(prandtl, buoy_corr, g_acc)`` — fuses the Smagorinsky-Lilly stage
    (``closure._smag_block``) into the epilogue on the SAME windows, adding
    the stress/diffusive-flux divergences into the advective accumulators
    before the single HBM write (saves re-reading u/v/w/θ/qᵗ windows AND
    the output-add round-trip the separate closure kernel costs).
    ``has_thb``: extra θᵥ window for the Lilly correction (moist).
    ``substep``: fused SSP-RK3 stage mode — 2(3+K) extra pointwise block
    inputs (current + stage-0 ρ-prognostics) and an SMEM (α, Δt) pair;
    outputs become the substepped fields (1−α)s⁰ + α(s + Δt·G) instead of
    G, eliminating the separate XLA substep pass (~4(3+K) HBM transits per
    stage).
    ``fadd_mask``/``fdamp_mask``: per-output flags (each length 3+K) for
    column-linear forcing inputs — G += add(z) − damp(z)·(ρ-prognostic),
    the fused form of geostrophic/subsidence/drying/sponge forcings
    (``physics.forcings.*.column_parts``); kills the post-kernel
    full-field read-modify-write extras pass."""
    wz, wy = bz + 2 * H, by + 2 * HY
    n_win = 3 + n_scalars + (1 if has_b else 0) + (1 if has_thb else 0)
    n_cols = 3 if dry_buoy else 0    # Tref, Pi, gρ columns (VMEM-resident)
    n_ccols = 3 if clo is not None else 0  # invdzc_e, invdzf_e, cd2 columns

    def kernel(*refs):
        # layout: [u,v,w, s0..sK-1, (b), (thb), colc, colf, (Tref,Pi,grho),
        #          (invdzc_e,invdzf_e,cd2), invdzc, invdzf,
        #          (substep: cur×(3+K), prev×(3+K), ab_smem)] HBM inputs;
        #          then 3+K output refs; then n_win window scratch +
        #          invdzc_w/invdzf_w + sems.
        it = iter(refs)
        u_hbm, v_hbm, w_hbm = next(it), next(it), next(it)
        s_hbm = [next(it) for _ in range(n_scalars)]
        b_hbm = next(it) if has_b else None
        thb_hbm = next(it) if has_thb else None
        colc_ref, colf_ref = next(it), next(it)
        buoy_cols = [next(it) for _ in range(n_cols)]
        clo_cols = [next(it) for _ in range(n_ccols)]
        invdzc_hbm, invdzf_hbm = next(it), next(it)
        fadd_refs = [next(it) if m else None for m in fadd_mask]
        fdamp_refs = [next(it) if m else None for m in fdamp_mask]
        cur_refs = [next(it) for _ in range(3 + n_scalars)] if substep else None
        prev_refs = [next(it) for _ in range(3 + n_scalars)] if substep else None
        ab_ref = next(it) if substep else None
        gu_ref, gv_ref, gw_ref = next(it), next(it), next(it)
        gs_refs = [next(it) for _ in range(n_scalars)]
        wins = [next(it) for _ in range(n_win)]
        invdzc_w, invdzf_w = next(it), next(it)
        sems = next(it)

        i = pl.program_id(0)
        j = pl.program_id(1)

        srcs = ([u_hbm, v_hbm, w_hbm] + s_hbm + ([b_hbm] if has_b else [])
                + ([thb_hbm] if has_thb else []))

        # Cross-grid-step window prefetch: the TPU grid is a sequential
        # loop and scratch persists across steps, so each instance starts
        # the NEXT instance's window DMAs into the alternate buffer slot
        # before computing — hiding the ~0.9 ms/stage of serialized window
        # DMA behind compute (the Blocked substep inputs/outputs are
        # already auto-pipelined by Pallas; only these manual overlapping
        # windows needed it).  wins are (2, wz, wy, nx) scratches.
        step = i * n_yblocks + j
        slot = jax.lax.rem(step, jnp.int32(2))
        total = n_zblocks * n_yblocks

        def start_all(iz, jy, sl):
            for n, (src, dst) in enumerate(zip(srcs, wins)):
                pltpu.make_async_copy(
                    src.at[pl.ds(iz * bz, wz), pl.ds(jy * by, wy), :],
                    dst.at[sl], sems.at[sl, n]).start()

        @pl.when(step == 0)
        def _():
            start_all(0, 0, 0)

        @pl.when(step + 1 < total)
        def _():
            nstep = step + 1
            ni = nstep // n_yblocks
            nj = nstep - ni * n_yblocks
            start_all(ni, nj, 1 - slot)

        pltpu.make_async_copy(invdzc_hbm.at[pl.ds(i * bz, bz)],
                              invdzc_w, sems.at[0, n_win]).start()
        pltpu.make_async_copy(invdzf_hbm.at[pl.ds(i * bz, bz)],
                              invdzf_w, sems.at[0, n_win + 1]).start()
        for n, (src, dst) in enumerate(zip(srcs, wins)):
            pltpu.make_async_copy(
                src.at[pl.ds(i * bz, wz), pl.ds(j * by, wy), :],
                dst.at[slot], sems.at[slot, n]).wait()
        pltpu.make_async_copy(invdzc_hbm.at[pl.ds(i * bz, bz)],
                              invdzc_w, sems.at[0, n_win]).wait()
        pltpu.make_async_copy(invdzf_hbm.at[pl.ds(i * bz, bz)],
                              invdzf_w, sems.at[0, n_win + 1]).wait()

        u, v, w = wins[0][slot], wins[1][slot], wins[2][slot]
        scal = [wins[3 + k][slot] for k in range(n_scalars)]
        b_win = wins[3 + n_scalars][slot] if has_b else None
        thb_win = wins[3 + n_scalars + (1 if has_b else 0)][slot] \
            if has_thb else None

        colc = colc_ref[pl.ds(i * bz, wz), :, :]      # (wz, 1, nx)
        colf = colf_ref[pl.ds(i * bz, wz), :, :]
        ru = u * colc
        rv = v * colc
        rw = w * colf
        invdzc = invdzc_w[:]
        invdzf = invdzf_w[:]

        du, dv, dw = momentum_divs(bz, by, nx, inv_dx, inv_dy,
                                   ru, rv, rw, u, v, w, invdzc, invdzf)

        def xs(a, o):
            return pltpu.roll(a, (-o) % nx, 2) if o % nx else a

        def s(a, zo, yo):
            return a[H + zo: H + zo + bz, HY + yo: HY + yo + by, :]

        def sy(a, zo, y0):
            return a[H + zo: H + zo + bz, HY + y0: HY + y0 + by + 1, :]

        def sz(a, z0, yo):
            return a[H + z0: H + z0 + bz + 1, HY + yo: HY + yo + by, :]

        gu = -du
        gv = -dv
        if f_cor is not None:
            # FPlane f×ρU with 4-point transverse averages (matches
            # physics.coriolis.coriolis_terms): G_u += f·ρv̄ˣʸ, G_v −= f·ρūˣʸ
            rv_u = 0.25 * (s(rv, 0, 0) + s(rv, 0, 1)
                           + xs(s(rv, 0, 0), -1) + xs(s(rv, 0, 1), -1))
            ru_v = 0.25 * (s(ru, 0, 0) + xs(s(ru, 0, 0), 1)
                           + s(ru, 0, -1) + xs(s(ru, 0, -1), 1))
            gu = gu + f_cor * rv_u
            gv = gv - f_cor * ru_v

        # Buoyancy at z-faces: b centers k-1..k+bz-1 (bz+1 slab), then iz_cf
        if dry_buoy:
            Tref_ref, Pi_ref, grho_ref = buoy_cols
            th_slab = sz(scal[0], -1, 0)
            cw = lambda r: r[pl.ds(i * bz, wz), :, :][H - 1: H + bz, :, :]
            # b = gρᵣ(1 − Tᵣ/(Π·θ)): same residual as the jnp form
            # −gρᵣ(RᵣTᵣ/(R·Πθ) − 1) — verified equal at the rest state
            # (both O(1e-6), absorbed by the projection; see model).
            b_slab = cw(grho_ref) * (1.0 - cw(Tref_ref) / (cw(Pi_ref) * th_slab))
        else:
            b_slab = sz(b_win, -1, 0) if has_b else None
        if b_slab is not None:
            gw_b = 0.5 * (b_slab[:-1, :, :] + b_slab[1:, :, :])
            gw = -dw + gw_b
        else:
            gw = -dw

        # SGS closure epilogue on the same windows (see _make_kernel doc)
        cgth = cgqt = None
        if clo is not None:
            prandtl, buoy_corr, g_acc, has_qt = clo
            cgu, cgv, cgw, cgth, cgqt = _smag_block(
                bz, by, nx, inv_dx, inv_dy, prandtl, buoy_corr, g_acc,
                has_qt, i, n_zblocks,
                u, v, w, thb_win if has_thb else scal[0], scal[0],
                scal[1] if has_qt else None,
                colc, colf,
                clo_cols[0][pl.ds(i * bz, wz), :, :],
                clo_cols[1][pl.ds(i * bz, wz), :, :],
                clo_cols[2][pl.ds(i * bz, wz), :, :])
            gu = gu + cgu
            gv = gv + cgv
            gw = gw + cgw

        # column-linear forcings (see _make_kernel doc): the (nz,1,nx)
        # VMEM-resident columns slice per z-block like the density cols
        def _fcol(r):
            return r[pl.ds(i * bz, bz), :, :]

        if any(fadd_mask[:3] if fadd_mask else ()) or \
                any(fdamp_mask[:3] if fdamp_mask else ()):
            rufs = (s(ru, 0, 0), s(rv, 0, 0), s(rw, 0, 0))
            gs_mom = [gu, gv, gw]
            for n in range(3):
                if fadd_mask and fadd_refs[n] is not None:
                    gs_mom[n] = gs_mom[n] + _fcol(fadd_refs[n])
                if fdamp_mask and fdamp_refs[n] is not None:
                    gs_mom[n] = gs_mom[n] - _fcol(fdamp_refs[n]) * rufs[n]
            gu, gv, gw = gs_mom

        if substep:
            # fused SSP-RK3 substep: (1−α)s⁰ + α(s + Δt·G) — the exact
            # arithmetic order of timesteppers._substep (bitwise match)
            # ab = (α, Δt, 1−α): the complement is computed host-side in
            # f64 then rounded, matching the jnp constant bitwise
            a = ab_ref[0]
            dtv = ab_ref[1]
            oma = ab_ref[2]
            sub = lambda cur, prev, gg: (oma * prev[:]
                                         + a * (cur[:] + dtv * gg))
            gu_ref[:] = sub(cur_refs[0], prev_refs[0], gu)
            gv_ref[:] = sub(cur_refs[1], prev_refs[1], gv)
            gw_ref[:] = sub(cur_refs[2], prev_refs[2], gw)
        else:
            gu_ref[:] = gu
            gv_ref[:] = gv
            gw_ref[:] = gw

        if n_scalars:
            # z-face mass-flux slab 0.5(ρᶜ[k-1]+ρᶜ[k])·w, shared by all
            # scalars (the jnp path interpolates the broadcast ρ field).
            colc_iw = colc[H - 1: H + bz + 1, :, :]
            mfz = 0.5 * (colc_iw[:-1, :, :] + colc_iw[1:, :, :]) * sz(w, 0, 0)
            for k in range(n_scalars):
                gs = _scalar_div(bz, by, nx, inv_dx, inv_dy,
                                 scal[k], ru, rv, mfz, invdzc,
                                 scal_bounds)
                if k == 0 and cgth is not None:
                    gs = gs + cgth
                elif k == 1 and cgqt is not None:
                    gs = gs + cgqt
                if fadd_mask and fadd_refs[3 + k] is not None:
                    gs = gs + _fcol(fadd_refs[3 + k])
                if fdamp_mask and fdamp_refs[3 + k] is not None:
                    # damp col × ρ-scalar: the scalar windows hold the
                    # SPECIFIC scalar; ρs = χ·ρᵣ(z) from the center column
                    gs = gs - (_fcol(fdamp_refs[3 + k])
                               * s(scal[k], 0, 0) * colc[H: H + bz, :, :])
                if substep:
                    gs = (oma * prev_refs[3 + k][:]
                          + a * (cur_refs[3 + k][:] + dtv * gs))
                gs_refs[k][:] = gs

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "inv_dx", "inv_dy", "nz", "ny", "nx", "bz", "by", "n_scalars",
    "f_cor", "dry_buoy", "has_b", "scal_bounds", "clo", "has_thb",
    "interpret", "fadd_mask", "fdamp_mask"))
def _run(u_pad, v_pad, w_pad, scalars_pad, b_pad, thb_pad, colc, colf,
         buoy_cols, clo_cols, invdzc, invdzf, inv_dx, inv_dy, nz, ny, nx,
         bz, by, n_scalars, f_cor, dry_buoy, has_b, scal_bounds=False,
         clo=None, has_thb=False, interpret=False,
         cur_fields=(), prev_fields=(), ab=None,
         fadd_cols=(), fdamp_cols=(), fadd_mask=(), fdamp_mask=()):
    substep = ab is not None
    kernel = _make_kernel(bz, by, nx, inv_dx, inv_dy, n_scalars, f_cor,
                          dry_buoy, has_b, scal_bounds, clo=clo,
                          has_thb=has_thb, n_zblocks=nz // bz,
                          n_yblocks=ny // by,
                          substep=substep, fadd_mask=fadd_mask,
                          fdamp_mask=fdamp_mask)
    wz, wy = bz + 2 * H, by + 2 * HY
    grid = (nz // bz, ny // by)
    n_win = 3 + n_scalars + (1 if has_b else 0) + (1 if has_thb else 0)
    n_cols = 3 if dry_buoy else 0
    n_ccols = 3 if clo is not None else 0
    win = lambda: pltpu.VMEM((2, wz, wy, nx), jnp.float32)   # 2 = prefetch slots
    col = lambda: pltpu.VMEM((bz, 1, nx), jnp.float32)
    out = jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32)
    n_fcols = sum(1 for m in fadd_mask if m) + sum(1 for m in fdamp_mask if m)
    args = ([u_pad, v_pad, w_pad] + list(scalars_pad)
            + ([b_pad] if has_b else []) + ([thb_pad] if has_thb else [])
            + [colc, colf] + list(buoy_cols) + list(clo_cols)
            + [invdzc, invdzf] + list(fadd_cols) + list(fdamp_cols))
    blk = lambda: pl.BlockSpec((bz, by, nx), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)
    sub_specs = []
    if substep:
        args += list(cur_fields) + list(prev_fields) + [ab]
        sub_specs = ([blk()] * (2 * (3 + n_scalars))
                     + [pl.BlockSpec(memory_space=pltpu.SMEM)])
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_win
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + n_cols + n_ccols)
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_fcols
        + sub_specs,
        out_specs=[blk()] * (3 + n_scalars),
        out_shape=[out] * (3 + n_scalars),
        scratch_shapes=[win() for _ in range(n_win)] + [col(), col()]
        + [pltpu.SemaphoreType.DMA((2, n_win + 2))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def supported(grid, mom_scheme, scal_scheme, coriolis) -> bool:
    from ..advection import WENO
    from ..grid import Topology
    from ..physics.coriolis import FPlane

    def weno5(s, bounds_ok=False):
        return (isinstance(s, WENO) and s.order == 5
                and (bounds_ok or not s.bounds_preserving))

    return (weno5(mom_scheme) and weno5(scal_scheme, bounds_ok=True)
            and (coriolis is None or isinstance(coriolis, FPlane))
            and grid.x_topology == Topology.PERIODIC
            and grid.y_topology == Topology.PERIODIC
            and not grid.is_latlon
            and grid.dtype == jnp.float32
            and grid.halo >= H
            and grid.nx >= 128 and grid.ny >= 8 and grid.nz >= 8
            and _pick_block(grid.nz, (8, 16, 4)) is not None
            and _pick_block(grid.ny, (32, 16, 8, 64)) is not None)


def fused_tendency_pallas(grid, u_pad, v_pad, w_pad, scalars_pad, colc, colf,
                          coriolis_f=None, buoy_cols=None, b_pad=None,
                          scal_bounds=False, closure_model=None,
                          thb_pad=None, hx=0, interpret=False,
                          substep=None, forcing_cols=None):
    """Fused advective tendencies: returns ``(G_ρu, G_ρv, G_ρw, [G_ρs...])``.

    - ``u_pad``/``v_pad``/``w_pad``/``scalars_pad``: pre-padded by
      :func:`~breeze_tpu.pallas_kernels.advection.pad_zy` (z by H, y by HY).
    - ``colc``/``colf``: z-halo-padded ``(nz+2H, 1, 1)`` reference-density
      columns at centers/faces.
    - ``coriolis_f``: FPlane parameter or None.
    - ``buoy_cols``: ``(T_ref, Π, gρᵣ)`` padded center columns for the dry
      in-kernel buoyancy; mutually exclusive with ``b_pad`` (precomputed
      buoyancy force field, pre-padded like a scalar).
    - ``closure_model``: the :class:`AtmosphereModel` when the
      Smagorinsky-Lilly SGS stage should be fused into the epilogue
      (requires ``closure.supported``); ``thb_pad``: optional pre-padded θᵥ
      window for the Lilly buoyancy correction (moist).  The closure
      tendencies for θ/qᵗ are folded into the first two scalar outputs.
    - sign convention: G already includes the −∇·, Coriolis, +b, and (when
      fused) SGS terms (what :func:`breeze_tpu.model.compute_tendencies`
      assembles).
    - ``substep``: optional ``(cur_fields, prev_fields, alpha, dt)`` —
      current and stage-0 ρ-prognostics (u,v,w momenta then the ρ-scalars,
      UNPADDED interior fields) plus the SSP-RK3 blend scalars.  Outputs
      become the substepped prognostics (1−α)s⁰ + α(s + Δt·G) instead of
      the tendencies (exact arithmetic of ``timesteppers._substep``).
      Incompatible with ``hx`` (x-prepadded sharded mode).
    """
    import os as _os

    nz, ny, nx = grid.shape
    # x-prepadded mode (``advection.HX`` doc): run the identical kernel at
    # lane width nxp and slice the interior back out of the outputs.
    nxp = nx + 2 * hx
    # Block choice: (16, 64) measured 61.5 vs 64.4 ms/step on 256³ BOMEX
    # (v5e, tools/sweep_tend_blocks.py r4) — the larger window cuts the
    # halo-overlap DMA share (1.55× vs 2.19×).  Guarded by lane width: at
    # nx ≳ 512 the (22, 72, nx) windows push VMEM past what Mosaic
    # schedules well, so wide grids keep the round-3 (8, 32) blocks.
    if nxp <= 384:
        bz = _pick_block(nz, (16, 8, 4))
        by = _pick_block(ny, (64, 32, 16, 8))
    else:
        bz = _pick_block(nz, (8, 16, 4))
        by = _pick_block(ny, (32, 16, 8, 64))
    # block-sweep overrides (tools/sweep_tend_blocks.py); must divide nz/ny
    bz_env = _os.environ.get("BREEZE_TPU_TEND_BZ")
    by_env = _os.environ.get("BREEZE_TPU_TEND_BY")
    if bz_env and nz % int(bz_env) == 0:
        bz = int(bz_env)
    if by_env and ny % int(by_env) == 0:
        by = int(by_env)
    from .momentum import _inv_dz_cols

    invdzc, invdzf = _inv_dz_cols(grid, nxp)
    dry_buoy = buoy_cols is not None
    has_b = b_pad is not None
    assert not (dry_buoy and has_b)
    bc = (tuple(bcast_col(c, nxp) for c in buoy_cols) if dry_buoy else ())

    clo = None
    clo_cols = ()
    if closure_model is not None:
        import numpy as np

        from ..model import _pad_center_column
        cl = closure_model.closure
        clo = (float(cl.prandtl), bool(cl.buoyancy_correction),
               float(closure_model.constants.gravitational_acceleration),
               bool(closure_model.has_moisture))
        dz_c = np.asarray(grid.dz_c_meta, np.float64)
        delta = (grid.dx * grid.dy * dz_c) ** (1.0 / 3.0)
        cd2 = (cl.coefficient * delta) ** 2
        pad_col = lambda c: bcast_col(
            _pad_center_column(grid, jnp.asarray(c, jnp.float32), H), nxp)
        dz_f = np.asarray(grid.dz_f_meta, np.float64)[: nz]
        clo_cols = (pad_col(1.0 / dz_c), pad_col(1.0 / dz_f), pad_col(cd2))

    # Column-linear forcings: (adds, damps) lists of per-output (nz,)
    # columns (or None) in [ρu, ρv, ρw, scalars...] order — see
    # physics.forcings.*.column_parts.
    fadd_mask = fdamp_mask = ()
    fadd_cols = fdamp_cols = ()
    if forcing_cols is not None:
        adds, damps = forcing_cols
        n_out = 3 + len(scalars_pad)
        assert len(adds) == n_out and len(damps) == n_out
        fadd_mask = tuple(a is not None for a in adds)
        fdamp_mask = tuple(d is not None for d in damps)
        fadd_cols = tuple(bcast_col(jnp.asarray(a, jnp.float32).reshape(-1),
                                    nxp) for a in adds if a is not None)
        fdamp_cols = tuple(bcast_col(jnp.asarray(d, jnp.float32).reshape(-1),
                                     nxp) for d in damps if d is not None)

    cur_fields = prev_fields = ()
    ab = None
    if substep is not None:
        assert hx == 0, "fused substep is not supported in x-prepadded mode"
        cur_fields, prev_fields, alpha, dt = substep
        assert len(cur_fields) == 3 + len(scalars_pad)
        assert len(prev_fields) == 3 + len(scalars_pad)
        ab = jnp.stack([jnp.asarray(alpha, jnp.float32),
                        jnp.asarray(dt, jnp.float32),
                        jnp.asarray(1.0 - alpha, jnp.float32)])
    outs = _run(u_pad, v_pad, w_pad, tuple(scalars_pad), b_pad, thb_pad,
                bcast_col(colc, nxp), bcast_col(colf, nxp), bc, clo_cols,
                invdzc, invdzf,
                float(1.0 / grid.dx), float(1.0 / grid.dy),
                nz, ny, nxp, bz, by, len(scalars_pad),
                None if coriolis_f is None else float(coriolis_f),
                dry_buoy, has_b, scal_bounds=scal_bounds,
                clo=clo, has_thb=thb_pad is not None,
                interpret=interpret or force_interpret(),
                cur_fields=tuple(cur_fields), prev_fields=tuple(prev_fields),
                ab=ab, fadd_cols=fadd_cols, fdamp_cols=fdamp_cols,
                fadd_mask=fadd_mask, fdamp_mask=fdamp_mask)
    if hx:
        outs = [o[:, :, hx: hx + nx] for o in outs]
    return outs[0], outs[1], outs[2], list(outs[3:])
