"""Fused Pallas kernels for the anelastic pressure projection.

``model.pressure_projection`` wraps the Poisson solve with a divergence
(δ = ∇·ρu) and a gradient correction (ρu ← ρu − Δt ρᵣ∇φ); the jnp path
pays four halo pads (full-field concats) plus separately materialized
stencil results around the MXU transform.  These two kernels compute each
side in ONE VMEM pass:

- **K_div**: (ρu, ρv, ρw) → ∇·(ρu) with the implicit-zero top wall flux;
- **K_grad**: (φ, ρu, ρv, ρw) → corrected momenta, with the reference
  density columns applied at each component's location and the bottom
  wall face pinned.

Grid over (z, y) blocks, x lane-resident (periodic rolls); the y halo is
one row (overlapping DMA windows); z needs one row above (div) / below
(grad).  Scope: Cartesian periodic x/y, bounded z, f32 (stretched Δz
supported through the spacing columns).  The Poisson transform itself
stays on the MXU (matmul-DFT) — XLA already runs it at matmul speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_div(bz, by, nx, inv_dx, inv_dy):
    wz = bz + 1      # +1 z row ABOVE (rw[k+1]; zero at the domain top)
    wy = by + 8      # +1 y row ABOVE (rv[y+1]; periodic wrap) + 7 slack
    #                  rows so the DMA window sublane count is 8-aligned
    #                  (Mosaic: slice sizes along dim 1 must be 8-aligned)

    def kernel(ru_hbm, rv_hbm, rw_hbm, invdz_hbm, out_ref,
               ru_w, rv_w, rw_w, invdz_w, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        srcs = (ru_hbm, rv_hbm, rw_hbm)
        dsts = (ru_w, rv_w, rw_w)
        for n, (src, dst) in enumerate(zip(srcs, dsts)):
            pltpu.make_async_copy(
                src.at[pl.ds(i * bz, wz), pl.ds(j * by, wy), :],
                dst, sems.at[n]).start()
        pltpu.make_async_copy(invdz_hbm.at[pl.ds(i * bz, bz)], invdz_w,
                              sems.at[3]).start()
        for n, (src, dst) in enumerate(zip(srcs, dsts)):
            pltpu.make_async_copy(
                src.at[pl.ds(i * bz, wz), pl.ds(j * by, wy), :],
                dst, sems.at[n]).wait()
        pltpu.make_async_copy(invdz_hbm.at[pl.ds(i * bz, bz)], invdz_w,
                              sems.at[3]).wait()

        def xs(a, o):
            return pltpu.roll(a, (-o) % nx, 2) if o % nx else a

        ru = ru_w[:bz, :by, :]
        dx_part = (xs(ru, 1) - ru) * inv_dx
        rv = rv_w[:]
        dy_part = (rv[:bz, 1:by + 1, :] - rv[:bz, :by, :]) * inv_dy
        rw = rw_w[:]
        dz_part = (rw[1:, :by, :] - rw[:-1, :by, :]) * invdz_w[:]
        out_ref[:] = dx_part + dy_part + dz_part

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "bz", "by", "nz", "ny", "nx", "inv_dx", "inv_dy", "interpret"))
def _run_div(ru, rv, rw, inv_dz_col, bz, by, nz, ny, nx, inv_dx, inv_dy,
             interpret=False):
    # +1 zero z row on ρw (top wall flux), +8 periodic y rows (1 used + 7
    # slack for the 8-aligned DMA window)
    rw_p = jnp.concatenate([rw, jnp.zeros_like(rw[:1])], axis=0)
    ru_p = jnp.concatenate([ru, ru[-1:]], axis=0)      # row unused
    rv_p = jnp.concatenate([rv, rv[-1:]], axis=0)
    ru_p = jnp.concatenate([ru_p, ru_p[:, :8, :]], axis=1)
    rv_p = jnp.concatenate([rv_p, rv_p[:, :8, :]], axis=1)
    rw_p = jnp.concatenate([rw_p, rw_p[:, :8, :]], axis=1)
    kernel = _make_div(bz, by, nx, inv_dx, inv_dy)
    wz, wy = bz + 1, by + 8
    grid = (nz // bz, ny // by)
    win = lambda: pltpu.VMEM((wz, wy, nx), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec((bz, by, nx), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        scratch_shapes=[win(), win(), win(),
                        pltpu.VMEM((bz, 1, nx), jnp.float32),
                        pltpu.SemaphoreType.DMA((4,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(ru_p, rv_p, rw_p, inv_dz_col)


def _make_grad(bz, by, nx, inv_dx, inv_dy):
    wz = bz + 1      # +1 z row BELOW (φ[k−1] for ∂zφ at faces)
    wy = by + 8      # +1 y row BELOW (φ[y−1]) + 7 slack rows (8-aligned
    #                  DMA window; block rows sit at 8..by+7)

    def kernel(phi_hbm, ru_hbm, rv_hbm, rw_hbm, rhoc_hbm, rhof_hbm,
               invdzf_hbm, dt_ref, ru_o, rv_o, rw_o,
               phi_w, ru_w, rv_w, rw_w, rhoc_w, rhof_w, invdzf_w, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        pltpu.make_async_copy(
            phi_hbm.at[pl.ds(i * bz, wz), pl.ds(j * by, wy), :],
            phi_w, sems.at[0]).start()
        srcs = (ru_hbm, rv_hbm, rw_hbm)
        dsts = (ru_w, rv_w, rw_w)
        for n, (src, dst) in enumerate(zip(srcs, dsts)):
            pltpu.make_async_copy(
                src.at[pl.ds(i * bz, bz), pl.ds(j * by, by), :],
                dst, sems.at[1 + n]).start()
        for n, col in ((4, rhoc_hbm), (5, rhof_hbm), (6, invdzf_hbm)):
            pltpu.make_async_copy(col.at[pl.ds(i * bz, bz)],
                                  (rhoc_w, rhof_w, invdzf_w)[n - 4],
                                  sems.at[n]).start()
        pltpu.make_async_copy(
            phi_hbm.at[pl.ds(i * bz, wz), pl.ds(j * by, wy), :],
            phi_w, sems.at[0]).wait()
        for n, (src, dst) in enumerate(zip(srcs, dsts)):
            pltpu.make_async_copy(
                src.at[pl.ds(i * bz, bz), pl.ds(j * by, by), :],
                dst, sems.at[1 + n]).wait()
        for n in (4, 5, 6):
            pltpu.make_async_copy(
                (rhoc_hbm, rhof_hbm, invdzf_hbm)[n - 4].at[pl.ds(i * bz, bz)],
                (rhoc_w, rhof_w, invdzf_w)[n - 4], sems.at[n]).wait()

        def xs(a, o):
            return pltpu.roll(a, (-o) % nx, 2) if o % nx else a

        dt = dt_ref[0]
        # window: z rows [i·bz−1 .. i·bz+bz−1], y rows [j·by−8 .. j·by+by−1]
        phi = phi_w[:]
        phi_c = phi[1:, 8:, :]                       # block cells
        rhoc = rhoc_w[:]
        rhof = rhof_w[:]
        ru_o[:] = ru_w[:] - dt * rhoc * (phi_c - xs(phi_c, -1)) * inv_dx
        rv_o[:] = rv_w[:] - dt * rhoc * (phi_c - phi[1:, 7:by + 7, :]) * inv_dy
        dzphi = (phi_c - phi[:bz, 8:, :]) * invdzf_w[:]
        rw_new = rw_w[:] - dt * rhof * dzphi
        # bottom wall: face row 0 of block i=0 pinned to zero
        @pl.when(i == 0)
        def _():
            rw_o[:] = jnp.concatenate(
                [jnp.zeros_like(rw_new[:1]), rw_new[1:]], axis=0)

        @pl.when(i != 0)
        def _():
            rw_o[:] = rw_new

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "bz", "by", "nz", "ny", "nx", "inv_dx", "inv_dy", "interpret"))
def _run_grad(phi, ru, rv, rw, rho_c_col, rho_f_col, inv_dz_f_col, dt,
              bz, by, nz, ny, nx, inv_dx, inv_dy, interpret=False):
    # +1 z row BELOW (mirror — ∂zφ at the wall face is overwritten) and
    # +8 periodic y rows BELOW on φ (1 used + 7 slack for the 8-aligned
    # DMA window).  dt rides in SMEM so per-stage αΔt values (and traced
    # dt) share ONE compiled kernel.
    phi_p = jnp.concatenate([phi[:1], phi], axis=0)
    phi_p = jnp.concatenate([phi_p[:, -8:, :], phi_p], axis=1)
    kernel = _make_grad(bz, by, nx, inv_dx, inv_dy)
    wz, wy = bz + 1, by + 8
    grid = (nz // bz, ny // by)
    out = jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32)
    outspec = pl.BlockSpec((bz, by, nx), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    win_b = lambda: pltpu.VMEM((bz, by, nx), jnp.float32)
    col = lambda: pltpu.VMEM((bz, 1, nx), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 7
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[outspec] * 3,
        out_shape=[out] * 3,
        scratch_shapes=[pltpu.VMEM((wz, wy, nx), jnp.float32),
                        win_b(), win_b(), win_b(), col(), col(), col(),
                        pltpu.SemaphoreType.DMA((7,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(phi_p, ru, rv, rw, rho_c_col, rho_f_col, inv_dz_f_col,
      jnp.asarray(dt, jnp.float32).reshape(1))


def _pick(n, candidates):
    for c in candidates:
        if n % c == 0:
            return c
    return None


def supported(grid) -> bool:
    from ..grid import Topology

    return (not grid.is_latlon
            and grid.x_topology == Topology.PERIODIC
            and grid.y_topology == Topology.PERIODIC
            and grid.z_topology == Topology.BOUNDED
            and grid.dtype == jnp.float32
            and grid.nx >= 128 and grid.ny >= 8 and grid.nz >= 8
            and _pick(grid.nz, (16, 8, 4)) is not None
            and _pick(grid.ny, (16, 8)) is not None)


def divergence_pallas(grid, ru, rv, rw, interpret=False):
    """∇·(ρu) at centers — fused replacement for the pad + ``so.div_c``
    pair in ``pressure_projection`` (implicit-zero top wall flux)."""
    from .advection import bcast_col, force_interpret

    nz, ny, nx = grid.shape
    bz = _pick(nz, (16, 8, 4))
    by = _pick(ny, (16, 8))
    # dz_c_meta: static spacing tuple (grid.dz_c is a tracer under jit)
    inv_dz = bcast_col(1.0 / jnp.asarray(grid.dz_c_meta, jnp.float32), nx)
    return _run_div(ru, rv, rw, inv_dz, bz=bz, by=by, nz=nz, ny=ny, nx=nx,
                    inv_dx=float(1.0 / grid.dx), inv_dy=float(1.0 / grid.dy),
                    interpret=interpret or force_interpret())


def gradient_correct_pallas(grid, phi, ru, rv, rw, rho_c_col, rho_f_col, dt,
                            interpret=False):
    """ρu ← ρu − Δt ρᵣ∇φ with the bottom wall face pinned — fused
    replacement for the pad + three gradient ops + wall enforcement."""
    from .advection import bcast_col, force_interpret

    nz, ny, nx = grid.shape
    bz = _pick(nz, (16, 8, 4))
    by = _pick(ny, (16, 8))
    inv_dz_f = bcast_col(
        1.0 / jnp.asarray(grid.dz_f_meta, jnp.float32)[:nz], nx)
    rc = bcast_col(jnp.broadcast_to(rho_c_col.reshape(-1), (nz,)), nx)
    rf = bcast_col(jnp.broadcast_to(rho_f_col.reshape(-1)[:nz], (nz,)), nx)
    return _run_grad(phi, ru, rv, rw, rc, rf, inv_dz_f, dt,
                     bz=bz, by=by, nz=nz, ny=ny, nx=nx,
                     inv_dx=float(1.0 / grid.dx),
                     inv_dy=float(1.0 / grid.dy),
                     interpret=interpret or force_interpret())
