"""Columnar Pallas kernels: per-column sequential passes done in one VMEM
visit.

The negative-moisture vertical borrowing (reference
``negative_moisture_correction.jl:244-286``, ``vertical_borrow!``) is a
top→bottom sequential recurrence per column.  The jnp path expresses it in
closed form via ``cumsum``/``cummax`` (log-depth, but every stage is a
full-field HBM pass — measured 6.9 ms/step at 256³ on v5e).  Here the
whole column sits in VMEM and the recurrence runs as a register loop over
z: HBM traffic is exactly one read + one write of the field (~0.17 ms at
256³ roofline).

These kernels are purely columnar — no horizontal stencils, no whole-axis
rolls — so they stay valid under ANY horizontal shard_map decomposition
(z is never sharded; design invariant).  They dispatch on the LOCAL array
shape, not the global grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_fix_negative(nz: int, by: int, nx: int, n_blocks: int):
    def kernel(mq_hbm, dz_hbm, out_ref, mq_w, dz_w, sems):
        j = pl.program_id(0)
        # cross-grid-step prefetch (see tendency._make_kernel): start the
        # next block's window DMA into the alternate slot before computing
        slot = jax.lax.rem(j, jnp.int32(2))

        def start(jy, sl):
            pltpu.make_async_copy(
                mq_hbm.at[:, pl.ds(jy * by, by), :], mq_w.at[sl],
                sems.at[sl]).start()

        @pl.when(j == 0)
        def _():
            pltpu.make_async_copy(dz_hbm, dz_w, sems.at[2]).start()
            start(0, 0)

        @pl.when(j + 1 < n_blocks)
        def _():
            start(j + 1, 1 - slot)

        pltpu.make_async_copy(
            mq_hbm.at[:, pl.ds(j * by, by), :], mq_w.at[slot],
            sems.at[slot]).wait()

        @pl.when(j == 0)
        def _():
            pltpu.make_async_copy(dz_hbm, dz_w, sems.at[2]).wait()

        # column mass-per-area m = ρq·Δz (conserves ∫ρq dz on stretched
        # grids).
        m = mq_w[slot] * dz_w[:]

        # The top→bottom deficit-push recurrence
        #     newⱼ = mⱼ + carry,  out = max(new, 0),  carry = min(new, 0)
        # in its closed form (see physics.microphysics.fix_negative_
        # moisture), expressed with SUFFIX scans so no z-reversal is
        # needed: the scan-order prefix sum S equals the level-order
        # suffix sum SSⱼ = Σ_{i≥j} mᵢ, and the scan prefix-max becomes
        # the suffix max of SS.  Log-depth shifted adds/maxes over the
        # VMEM-resident block — all STATIC slices (a sequential z loop
        # with dynamic ref indexing measured 4.6 ms/step at 256³; this
        # form is pure vectorized VPU work).
        zeros = jnp.zeros_like(m)
        SS = m
        d = 1
        while d < nz:
            SS = SS + jnp.concatenate([SS[d:], zeros[:d]], axis=0)
            d *= 2
        NEG = jnp.float32(-3.0e38)
        MM = SS
        d = 1
        while d < nz:
            shifted = jnp.concatenate(
                [MM[d:], jnp.full((d, by, nx), NEG, jnp.float32)], axis=0)
            MM = jnp.maximum(MM, shifted)
            d *= 2
        # C[j] = max(0, MM[j+1]) (0 at the top level — nothing above)
        C = jnp.maximum(jnp.concatenate([MM[1:], zeros[:1]], axis=0), 0.0)
        new = SS - C                    # valid for levels 1..nz-1
        out_upper = jnp.maximum(new[1:], 0.0)
        carry = jnp.minimum(new[1:2], 0.0)   # deficit reaching the bottom

        # bottom: absorb the carry, then borrow min(needed, available)
        # from level 1; a residual negative (column integral < 0) stays.
        m0 = m[:1] + carry
        lvl1 = out_upper[:1]
        avail = jnp.maximum(lvl1, 0.0)
        take = jnp.where(m0 < 0.0, jnp.minimum(-m0, avail), 0.0)
        bottom = m0 + take
        lvl1 = lvl1 - take

        # back to ρq units: one (nz,1,nx) reciprocal, broadcast multiply
        inv = 1.0 / dz_w[:]
        out_ref[:] = jnp.concatenate(
            [bottom, lvl1, out_upper[1:]], axis=0) * inv

    return kernel


@functools.partial(jax.jit, static_argnames=("nz", "by", "ny", "nx",
                                             "interpret"))
def _run_fix_negative(rho_q, dz_col, nz, by, ny, nx, interpret=False):
    kernel = _make_fix_negative(nz, by, nx, ny // by)
    return pl.pallas_call(
        kernel,
        grid=(ny // by,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec((nz, by, nx), lambda j: (0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, nz, by, nx), jnp.float32),
                        pltpu.VMEM((nz, 1, nx), jnp.float32),
                        pltpu.SemaphoreType.DMA((3,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(rho_q, dz_col)


def fix_negative_supported(shape, dtype) -> bool:
    if len(shape) != 3:
        return False
    nz, ny, nx = shape
    return (dtype == jnp.float32 and nz >= 2 and nx % 128 == 0
            and ny % 8 == 0)


def columnar_enabled() -> bool:
    """Columnar kernels need no halos or whole-axis rolls, so unlike the
    stencil kernels they stay on under ANY horizontal shard_map
    decomposition (z is never sharded)."""
    import os

    from .advection import _DISABLE_DEPTH, enabled, force_interpret
    if enabled():
        return True
    if os.environ.get("BREEZE_TPU_DISABLE_PALLAS") or _DISABLE_DEPTH:
        return False
    from ..parallel.halo import _current_axes
    axes = set(_current_axes())
    if not axes or not axes <= {1, 2}:
        return False
    return force_interpret() or jax.default_backend() in ("tpu", "axon")


def fix_negative_moisture_pallas(rho_q, dz_col, interpret=False):
    """Single-VMEM-pass Δz-weighted vertical borrowing (see
    ``physics.microphysics.fix_negative_moisture`` for semantics).

    ``dz_col``: (nz, 1, 1) thickness column (or None for uniform — the
    weights cancel; a ones column keeps one kernel).
    """
    from .advection import bcast_col, force_interpret

    nz, ny, nx = rho_q.shape
    by = 8
    if dz_col is None:
        dzb = jnp.ones((nz, 1, nx), jnp.float32)
    else:
        dzb = bcast_col(jnp.asarray(dz_col, jnp.float32).reshape(-1), nx)
    return _run_fix_negative(rho_q, dzb, nz=nz, by=by, ny=ny, nx=nx,
                             interpret=interpret or force_interpret())
