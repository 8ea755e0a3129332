"""Fused Pallas WENO5 momentum flux-divergence kernel.

Computes all three components of ∇·(ρU ⊗ u) — nine WENO5 reconstructions,
nine interface mass-flux interpolations, and nine flux divergences — in ONE
VMEM pass over the six input fields (ρu, ρv, ρw, u, v, w).  This is the
hottest kernel of the framework (the jnp path spends ≈10 ms/stage here at
256×256×128 on v5e, ~20× the HBM roofline, ~3× the VPU compute roofline).

TPU analogue of the reference's momentum advection kernels
(``div_𝐯u/v/w`` usage in ``dynamics_kernel_functions.jl:54-62`` over
Oceananigans WENO); numerics identical to the jnp path in
:func:`breeze_tpu.advection.momentum_flux_divergence` (validated in
interpret mode).

Performance notes:
- stencil-select upwinding (pick upwind cells with 5 selects, evaluate the
  WENO formula once) — half the arithmetic of compute-both-branches;
- every reconstruction operates on block-sized slices of the VMEM windows
  (no wasted halo-row arithmetic);
- grid over (z, y) blocks; x fully lane-resident, periodic via lane rolls;
- inputs pre-padded in z (H=3) and y (HY=4) host-side so each block DMAs a
  contiguous ``(bz+2H, by+2HY, nx)`` window.

Restrictions (jnp fallback otherwise): periodic x/y, bounded or periodic z
via the host-side pad, uniform Δz, WENO5, float32, rectilinear (non-latlon).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _force_interpret():
    from .advection import force_interpret
    return force_interpret()


H = 3   # WENO5 z-halo
HY = 4  # y-halo: one extra row so VMEM window sublane count is 8-aligned


def _weno5(g, normalize: bool = True):
    """WENO5-JS given the (already upwind-selected) cell getter ``g``.

    ``normalize=False`` skips the max-normalization of the common-
    denominator weights (saves ~9 VPU ops/face on this compute-bound
    kernel).  SAFE ONLY for fields with |q| ≲ 3e3: the raw pair products
    reach ~(17q²)⁴·q before the final normalization, hitting f32 overflow
    near |q| ~ 3e3 — velocities (≤ sound speed ~ 3.4e2 m/s) qualify with
    an order of magnitude of margin; scalars (tracers can be number
    concentrations ~ 1e8) must keep the normalized form.
    """
    import os as _os

    qm2, qm1, q0, q1, q2 = g(-2), g(-1), g(0), g(1), g(2)
    p0 = (2.0 * qm2 - 7.0 * qm1 + 11.0 * q0) * (1.0 / 6.0)
    p1 = (-qm1 + 5.0 * q0 + 2.0 * q1) * (1.0 / 6.0)
    p2 = (2.0 * q0 + 5.0 * q1 - q2) * (1.0 / 6.0)
    if _os.environ.get("BREEZE_TPU_WENO_DIFFS"):
        # experimental (trace-time knob, tools/bench_tend_ablate.py):
        # β via first differences — fewer fused ops, identical algebra up
        # to f32 reassociation
        d1 = qm1 - qm2
        d2 = q0 - qm1
        d3 = q1 - q0
        d4 = q2 - q1
        t0 = d2 - d1
        t1 = d3 - d2
        t2 = d4 - d3
        s0 = t0 + 2.0 * d2
        s1 = d2 + d3
        s2 = t2 - 2.0 * d3
        b0 = (13.0 / 12.0) * t0 * t0 + 0.25 * s0 * s0
        b1 = (13.0 / 12.0) * t1 * t1 + 0.25 * s1 * s1
        b2 = (13.0 / 12.0) * t2 * t2 + 0.25 * s2 * s2
    else:
        b0 = (13.0 / 12.0) * (qm2 - 2.0 * qm1 + q0) ** 2 + 0.25 * (qm2 - 4.0 * qm1 + 3.0 * q0) ** 2
        b1 = (13.0 / 12.0) * (qm1 - 2.0 * q0 + q1) ** 2 + 0.25 * (qm1 - q1) ** 2
        b2 = (13.0 / 12.0) * (q0 - 2.0 * q1 + q2) ** 2 + 0.25 * (3.0 * q0 - 4.0 * q1 + q2) ** 2
    eps = 1e-6
    # Common-denominator weights (two divides instead of four), ratios
    # identical to the classic 0.1/(b+eps)^2 (see advection._weno5).
    e0 = b0 + eps
    e1 = b1 + eps
    e2 = b2 + eps
    if normalize:
        # max-normalized so the pair products stay in f32 range; approx
        # reciprocal is safe — the scale cancels exactly in the final
        # ratio (see advection._weno5_plus)
        inv_m = pl.reciprocal(jnp.maximum(e0, jnp.maximum(e1, e2)),
                              approx=True)
        # floor the normalized ratios: keeps the pair products out of the
        # f32 denormal-flush range (ratios < 1e-9 mean that stencil is
        # >=1e9x rougher -- its weight split is already decided)
        e0 = jnp.maximum(e0 * inv_m, 1e-9)
        e1 = jnp.maximum(e1 * inv_m, 1e-9)
        e2 = jnp.maximum(e2 * inv_m, 1e-9)
    a0 = 0.1 * (e1 * e2) ** 2
    a1 = 0.6 * (e0 * e2) ** 2
    a2 = 0.3 * (e0 * e1) ** 2
    num = a0 * p0 + a1 * p1 + a2 * p2
    den = a0 + a1 + a2
    if _os.environ.get("BREEZE_TPU_WENO_RCP"):
        # experimental (trace-time knob): final convex combination via
        # approx reciprocal + one Newton step (~6e-5 rel) instead of the
        # full-precision divide
        y = pl.reciprocal(den, approx=True)
        y = y * (2.0 - den * y)
        return num * y
    return num / den


def _weno_sel(cell, sign, normalize: bool = True):
    """Stencil-select upwind WENO5: ``cell(o)`` is the cell at offset ``o``
    from the interface's LEFT cell; ``sign`` selects the upwind branch."""
    up = sign >= 0
    return _weno5(lambda o: jnp.where(up, cell(o), cell(1 - o)), normalize)


def momentum_divs(bz: int, by: int, nx: int, inv_dx: float, inv_dy: float,
                  ru, rv, rw, u, v, w, invdzc, invdzf):
    """The nine fused WENO5 momentum reconstructions + divergences on one
    (z, y) block: windows are ``(bz+2H, by+2HY, nx)``; returns
    ``(du, dv, dw)`` block-sized.  Shared by the momentum kernels here and
    the fused tendency kernel (``tendency.py``)."""

    # periodic x shift: xs(a, o)[..., i] = a[..., (i+o) mod nx]
    def xs(a, o):
        return pltpu.roll(a, (-o) % nx, 2) if o % nx else a

    # block-sized window slices at (z, y) offsets from the interior
    def s(a, zo, yo):                      # (bz, by, nx)
        return a[H + zo: H + zo + bz, HY + yo: HY + yo + by, :]

    def sy(a, zo, y0):                     # (bz, by+1, nx) — y faces/centers
        return a[H + zo: H + zo + bz, HY + y0: HY + y0 + by + 1, :]

    def sz(a, z0, yo):                     # (bz+1, by, nx) — z faces/centers
        return a[H + z0: H + z0 + bz + 1, HY + yo: HY + yo + by, :]

    dify = lambda F: F[:, 1:, :] - F[:, :-1, :]
    difz = lambda F: F[1:, :, :] - F[:-1, :, :]

    # velocities are bounded (≲ sound speed), so the reconstructions can
    # skip the overflow-guard weight normalization (see _weno5)
    _wsel = lambda cell, sign: _weno_sel(cell, sign, normalize=False)

    # ============ x momentum: u at (zc, yc, xf) ====================
    rus, us = s(ru, 0, 0), s(u, 0, 0)
    mf = 0.5 * (rus + xs(rus, 1))          # mass flux at x-centers ("fc")
    F = mf * _wsel(lambda o: xs(us, o), mf)
    du = (F - xs(F, -1)) * inv_dx          # div at x-faces

    rvc = sy(rv, 0, 0)                     # ρv at (yf, xf) corners
    mf = 0.5 * (rvc + xs(rvc, -1))
    F = mf * _wsel(lambda o: sy(u, 0, o - 1), mf)
    du = du + dify(F) * inv_dy

    rwc = sz(rw, 0, 0)                     # ρw at (zf, xf)
    mf = 0.5 * (rwc + xs(rwc, -1))
    F = mf * _wsel(lambda o: sz(u, o - 1, 0), mf)
    du = du + difz(F) * invdzc

    # ============ y momentum: v at (zc, yf, xc) ====================
    mf = 0.5 * (s(ru, 0, 0) + s(ru, 0, -1))   # ρu at (yf, xf) corners
    vs = s(v, 0, 0)
    F = mf * _wsel(lambda o: xs(vs, o - 1), mf)
    dv = (xs(F, 1) - F) * inv_dx           # div at x-centers

    mf = 0.5 * (sy(rv, 0, -1) + sy(rv, 0, 0))  # mass flux at y-centers
    F = mf * _wsel(lambda o: sy(v, 0, o - 1), mf)
    dv = dv + dify(F) * inv_dy             # div at y-faces

    mf = 0.5 * (sz(rw, 0, 0) + sz(rw, 0, -1))  # ρw at (zf, yf)
    F = mf * _wsel(lambda o: sz(v, o - 1, 0), mf)
    dv = dv + difz(F) * invdzc

    # ============ z momentum: w at (zf, yc, xc) ====================
    mf = 0.5 * (s(ru, 0, 0) + s(ru, -1, 0))    # ρu at (zf, xf)
    ws = s(w, 0, 0)
    F = mf * _wsel(lambda o: xs(ws, o - 1), mf)
    dw = (xs(F, 1) - F) * inv_dx

    mf = 0.5 * (sy(rv, 0, 0) + sy(rv, -1, 0))  # ρv at (zf, yf)
    F = mf * _wsel(lambda o: sy(w, 0, o - 1), mf)
    dw = dw + dify(F) * inv_dy

    # mass flux at z-centers; div at z-faces — the bottom row k=0
    # references below-wall data (overwritten by the wall condition,
    # same contract as the jnp path)
    mf = 0.5 * (sz(rw, -1, 0) + sz(rw, 0, 0))
    F = mf * _wsel(lambda o: sz(w, o - 1, 0), mf)
    dw = dw + difz(F) * invdzf
    return du, dv, dw


def _make_kernel(bz: int, by: int, nx: int, inv_dx: float, inv_dy: float,
                 with_cols: bool = False, n_zblocks: int = 0,
                 n_yblocks: int = 0):
    wz, wy = bz + 2 * H, by + 2 * HY

    def body(i, j, ru, rv, rw, u, v, w, invdzc, invdzf,
             du_ref, dv_ref, dw_ref):
        du, dv, dw = momentum_divs(bz, by, nx, inv_dx, inv_dy,
                                   ru, rv, rw, u, v, w, invdzc, invdzf)
        du_ref[:] = du
        dv_ref[:] = dv
        dw_ref[:] = dw

    if with_cols:
        # ρu = ρᵣ(z)·u with z-only reference columns: DMA only the three
        # velocity fields and form the momenta in VMEM — halves the
        # kernel's HBM reads and skips materializing ρu/ρv/ρw in HBM.
        def kernel(u_hbm, v_hbm, w_hbm, colc_ref, colf_ref, invdzc_hbm,
                   invdzf_hbm, du_ref, dv_ref, dw_ref,
                   u_w, v_w, w_w, invdzc_w, invdzf_w, sems):
            from .advection import prefetch_windows
            i = pl.program_id(0)
            j = pl.program_id(1)
            srcs = (u_hbm, v_hbm, w_hbm)
            dsts = (u_w, v_w, w_w)
            pltpu.make_async_copy(invdzc_hbm.at[pl.ds(i * bz, bz)],
                                  invdzc_w, sems.at[0, 3]).start()
            pltpu.make_async_copy(invdzf_hbm.at[pl.ds(i * bz, bz)],
                                  invdzf_w, sems.at[0, 4]).start()
            slot = prefetch_windows(srcs, dsts, sems, i, j, bz, by, wz, wy,
                                    n_zblocks, n_yblocks)
            pltpu.make_async_copy(invdzc_hbm.at[pl.ds(i * bz, bz)],
                                  invdzc_w, sems.at[0, 3]).wait()
            pltpu.make_async_copy(invdzf_hbm.at[pl.ds(i * bz, bz)],
                                  invdzf_w, sems.at[0, 4]).wait()
            u, v, w = u_w[slot], v_w[slot], w_w[slot]
            colc = colc_ref[pl.ds(i * bz, wz), :, :]      # (wz, 1, nx)
            colf = colf_ref[pl.ds(i * bz, wz), :, :]
            ru = u * colc
            rv = v * colc
            rw = w * colf
            body(i, j, ru, rv, rw, u, v, w,
                 invdzc_w[:], invdzf_w[:],
                 du_ref, dv_ref, dw_ref)
    else:
        def kernel(ru_hbm, rv_hbm, rw_hbm, u_hbm, v_hbm, w_hbm,
                   invdzc_hbm, invdzf_hbm, du_ref, dv_ref, dw_ref,
                   ru_w, rv_w, rw_w, u_w, v_w, w_w, invdzc_w, invdzf_w,
                   sems):
            from .advection import prefetch_windows
            i = pl.program_id(0)
            j = pl.program_id(1)
            srcs = (ru_hbm, rv_hbm, rw_hbm, u_hbm, v_hbm, w_hbm)
            dsts = (ru_w, rv_w, rw_w, u_w, v_w, w_w)
            pltpu.make_async_copy(invdzc_hbm.at[pl.ds(i * bz, bz)],
                                  invdzc_w, sems.at[0, 6]).start()
            pltpu.make_async_copy(invdzf_hbm.at[pl.ds(i * bz, bz)],
                                  invdzf_w, sems.at[0, 7]).start()
            slot = prefetch_windows(srcs, dsts, sems, i, j, bz, by, wz, wy,
                                    n_zblocks, n_yblocks)
            pltpu.make_async_copy(invdzc_hbm.at[pl.ds(i * bz, bz)],
                                  invdzc_w, sems.at[0, 6]).wait()
            pltpu.make_async_copy(invdzf_hbm.at[pl.ds(i * bz, bz)],
                                  invdzf_w, sems.at[0, 7]).wait()
            body(i, j, ru_w[slot], rv_w[slot], rw_w[slot], u_w[slot],
                 v_w[slot], w_w[slot], invdzc_w[:], invdzf_w[:],
                 du_ref, dv_ref, dw_ref)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "inv_dx", "inv_dy", "nz", "ny", "nx", "bz", "by", "interpret"))
def _run(ru_pad, rv_pad, rw_pad, u_pad, v_pad, w_pad, invdzc, invdzf,
         inv_dx, inv_dy, nz, ny, nx, bz, by, interpret=False):
    kernel = _make_kernel(bz, by, nx, inv_dx, inv_dy,
                          n_zblocks=nz // bz, n_yblocks=ny // by)
    wz, wy = bz + 2 * H, by + 2 * HY
    grid = (nz // bz, ny // by)
    win = lambda: pltpu.VMEM((2, wz, wy, nx), jnp.float32)
    col = lambda: pltpu.VMEM((bz, 1, nx), jnp.float32)
    out = jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 8,
        out_specs=[pl.BlockSpec((bz, by, nx), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[out, out, out],
        scratch_shapes=[win() for _ in range(6)] + [col(), col()]
        + [pltpu.SemaphoreType.DMA((2, 8))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ru_pad, rv_pad, rw_pad, u_pad, v_pad, w_pad, invdzc, invdzf)


@functools.partial(jax.jit, static_argnames=(
    "inv_dx", "inv_dy", "nz", "ny", "nx", "bz", "by", "interpret"))
def _run_cols(u_pad, v_pad, w_pad, colc, colf, invdzc, invdzf,
              inv_dx, inv_dy, nz, ny, nx, bz, by, interpret=False):
    kernel = _make_kernel(bz, by, nx, inv_dx, inv_dy, with_cols=True,
                          n_zblocks=nz // bz, n_yblocks=ny // by)
    wz, wy = bz + 2 * H, by + 2 * HY
    grid = (nz // bz, ny // by)
    win = lambda: pltpu.VMEM((2, wz, wy, nx), jnp.float32)
    col = lambda: pltpu.VMEM((bz, 1, nx), jnp.float32)
    out = jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec((bz, by, nx), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)] * 3,
        out_shape=[out, out, out],
        scratch_shapes=[win() for _ in range(3)] + [col(), col()]
        + [pltpu.SemaphoreType.DMA((2, 5))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(u_pad, v_pad, w_pad, colc, colf, invdzc, invdzf)


def _inv_dz_cols(grid, nx=None):
    """Lane-replicated (1/Δz_c, 1/Δz_f) columns from STATIC metadata
    (jit-safe; ``(nz, 1, nx)`` — see :func:`.advection.bcast_col`)."""
    from .advection import bcast_col

    nx = grid.nx if nx is None else nx
    invdzc = bcast_col(1.0 / jnp.asarray(grid.dz_c_meta, jnp.float32), nx)
    invdzf = bcast_col(
        1.0 / jnp.asarray(grid.dz_f_meta[: grid.nz], jnp.float32), nx)
    return invdzc, invdzf


def _pick_block(n, candidates):
    for c in candidates:
        if n % c == 0:
            return c
    return None


def supported(grid, scheme) -> bool:
    from ..advection import WENO
    from ..grid import Topology

    return (isinstance(scheme, WENO) and scheme.order == 5
            and not scheme.bounds_preserving
            and grid.x_topology == Topology.PERIODIC
            and grid.y_topology == Topology.PERIODIC
            and not grid.is_latlon
            and grid.dtype == jnp.float32
            and grid.halo >= H
            and grid.nx >= 128 and grid.ny >= 8 and grid.nz >= 8
            and _pick_block(grid.nz, (8, 16, 4)) is not None
            and _pick_block(grid.ny, (32, 16, 8, 64)) is not None)


def momentum_div_pallas(grid, ru_pad_zy, rv_pad_zy, rw_pad_zy,
                        u_pad_zy, v_pad_zy, w_pad_zy, interpret=False):
    """Fused ∇·(ρU⊗u); inputs pre-padded by H=3 in z and HY=4 in y (not x).

    Returns ``(du, dv, dw)`` with the same sign convention as
    :func:`breeze_tpu.advection.momentum_flux_divergence`.
    """
    nz, ny, nx = grid.shape
    bz = _pick_block(nz, (8, 16, 4))
    by = _pick_block(ny, (32, 16, 8, 64))
    invdzc, invdzf = _inv_dz_cols(grid)
    return _run(ru_pad_zy, rv_pad_zy, rw_pad_zy, u_pad_zy, v_pad_zy, w_pad_zy,
                invdzc, invdzf,
                float(1.0 / grid.dx), float(1.0 / grid.dy),
                nz, ny, nx, bz, by,
                interpret=interpret or _force_interpret())


def momentum_div_pallas_cols(grid, u_pad_zy, v_pad_zy, w_pad_zy,
                             colc, colf, interpret=False):
    """Fused ∇·(ρU⊗u) for ρu = ρᵣ(z)·u with z-only reference columns.

    ``colc``/``colf`` are the z-halo-padded (nz+2H, 1, 1) reference-density
    columns at centers/faces (``model._padded_reference_columns``).  The
    momenta are formed in VMEM — 3 field reads instead of 6, and no
    materialized ρu/ρv/ρw in HBM (the anelastic hot path).
    """
    from .advection import bcast_col

    nz, ny, nx = grid.shape
    bz = _pick_block(nz, (8, 16, 4))
    by = _pick_block(ny, (32, 16, 8, 64))
    invdzc, invdzf = _inv_dz_cols(grid)
    return _run_cols(u_pad_zy, v_pad_zy, w_pad_zy,
                     bcast_col(colc, nx), bcast_col(colf, nx),
                     invdzc, invdzf,
                     float(1.0 / grid.dx), float(1.0 / grid.dy),
                     nz, ny, nx, bz, by,
                     interpret=interpret or _force_interpret())
