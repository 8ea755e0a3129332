"""Fused Pallas WENO5 tracer flux-divergence kernel.

The hot kernel of the framework (SURVEY.md §7 hard-part 3): computes
G = −∇·(ρ u c) for a scalar in ONE pass, reading each input field once and
keeping every WENO intermediate (both upwind branches, smoothness
indicators, candidate polynomials, interface fluxes) in VMEM — the XLA jnp
path materializes many of those intermediates in HBM (measured ≈7×
copy-traffic per reconstruction direction).

Domain decomposition: grid over (z, y) blocks; x stays fully lane-resident
(periodic wrap via ``pltpu.roll``).  Inputs are pre-padded in z and y by
the halo (host-side concat — cheap, amortized across the three directions)
so every block reads a contiguous (bz+2h, by+2h, nx) window via manual
async DMA; output blocks are standard non-overlapping tiles.

Restrictions (fall back to the jnp path otherwise):
- periodic x and y, bounded/periodic z handled by the host-side pad
- uniform vertical spacing
- WENO5 (halo 3), float32
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H = 3   # WENO5 halo (z)
HY = 4  # y-halo: one extra row so the VMEM window sublane count is 8-aligned


def bcast_col(col, nx):
    """Lane-replicated ``(n, 1, nx)`` form of a z-column.

    Mosaic rejects memref slices of lane-width 1 ("Slice shape along
    dimension 1 must be aligned to tiling (128)"), so per-level spacing /
    density columns are streamed replicated across the lane dimension and
    broadcast against ``(bz, by, nx)`` blocks on the sublane axis.  The
    extra HBM traffic is ``nx`` floats per z-row per block — noise next to
    the field windows."""
    col = jnp.asarray(col, jnp.float32).reshape(-1, 1, 1)
    return jnp.broadcast_to(col, (col.shape[0], 1, nx))


def _weno5_plus(g):
    """Left-biased WENO5 given cell getter g(o) (o=0 upwind cell)."""
    qm2, qm1, q0, q1, q2 = g(-2), g(-1), g(0), g(1), g(2)
    p0 = (2.0 * qm2 - 7.0 * qm1 + 11.0 * q0) * (1.0 / 6.0)
    p1 = (-qm1 + 5.0 * q0 + 2.0 * q1) * (1.0 / 6.0)
    p2 = (2.0 * q0 + 5.0 * q1 - q2) * (1.0 / 6.0)
    b0 = (13.0 / 12.0) * (qm2 - 2.0 * qm1 + q0) ** 2 + 0.25 * (qm2 - 4.0 * qm1 + 3.0 * q0) ** 2
    b1 = (13.0 / 12.0) * (qm1 - 2.0 * q0 + q1) ** 2 + 0.25 * (qm1 - q1) ** 2
    b2 = (13.0 / 12.0) * (q0 - 2.0 * q1 + q2) ** 2 + 0.25 * (3.0 * q0 - 4.0 * q1 + q2) ** 2
    eps = 1e-6
    # Common-denominator weights, max-normalized so the pair products stay
    # in f32 range for large-magnitude fields (β ~ 1e16 for number
    # concentrations); two divides instead of four, ratios identical to the
    # classic 0.1/(b+eps)^2 (see advection._weno5).
    e0 = b0 + eps
    e1 = b1 + eps
    e2 = b2 + eps
    # approximate reciprocal (~2^-7): the normalization scale cancels
    # EXACTLY in the final convex-combination ratio (all three ratios
    # carry the same factor, so the a_i scale uniformly) — only the 1e-9
    # floor sees the approximation, far below weight relevance.  Saves
    # the full-precision Newton refinement on this VPU-bound kernel.
    inv_m = pl.reciprocal(jnp.maximum(e0, jnp.maximum(e1, e2)), approx=True)
    # floor the normalized ratios: keeps the pair products out of the f32
    # denormal-flush range (ratios < 1e-9 mean that stencil is >=1e9x
    # rougher -- its weight split is already decided)
    r0 = jnp.maximum(e0 * inv_m, 1e-9)
    r1 = jnp.maximum(e1 * inv_m, 1e-9)
    r2 = jnp.maximum(e2 * inv_m, 1e-9)
    a0 = 0.1 * (r1 * r2) ** 2
    a1 = 0.6 * (r0 * r2) ** 2
    a2 = 0.3 * (r0 * r1) ** 2
    return (a0 * p0 + a1 * p1 + a2 * p2) / (a0 + a1 + a2)


def _weno_face(cell, sign, bounds: bool = False):
    """Upwind WENO5 interface value; ``cell(o)`` = cell at offset o from the
    interface's LEFT cell; ``sign`` = advecting velocity at the interface.

    Stencil-select: pick the upwind cells with 5 selects and evaluate the
    WENO formula ONCE — half the arithmetic of compute-both-branches.
    ``bounds``: clip the interface value to the adjacent-cell range
    (bounds-preserving WENO, matching ``advection.reconstruct``)."""
    up = sign >= 0
    out = _weno5_plus(lambda o: jnp.where(up, cell(o), cell(1 - o)))
    if bounds:
        qL, qR = cell(0), cell(1)
        out = jnp.clip(out, jnp.minimum(qL, qR), jnp.maximum(qL, qR))
    return out


def prefetch_windows(srcs, wins, sems, i, j, bz, by, wz, wy,
                     n_zblocks, n_yblocks):
    """Cross-grid-step double-buffered window DMA shared by the stencil
    kernels: the TPU grid is a sequential loop with scratch persisting
    across steps, so each instance starts the NEXT instance's overlapping
    window transfers into the alternate buffer slot before computing —
    hiding the serialized window DMA behind compute (worth ~2 ms/stage on
    the 256³ tendency kernel).  ``wins`` are ``(2, wz, wy, nx)`` scratch
    refs; ``sems`` is ``DMA((2, >= len(srcs)))``.  Returns the slot whose
    windows are valid for this instance.
    """
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
        start_all(ni, nstep - ni * n_yblocks, 1 - slot)

    for n, (src, dst) in enumerate(zip(srcs, wins)):
        pltpu.make_async_copy(
            src.at[pl.ds(i * bz, wz), pl.ds(j * by, wy), :],
            dst.at[slot], sems.at[slot, n]).wait()
    return slot


def _make_kernel(bz: int, by: int, nx: int, inv_dx: float, inv_dy: float,
                 bounds: bool = False, n_zblocks: int = 0,
                 n_yblocks: int = 0):
    wz, wy = bz + 2 * H, by + 2 * HY

    def kernel(c_hbm, u_hbm, v_hbm, w_hbm, rho_hbm, invdz_hbm, out_ref,
               c_w, u_w, v_w, w_w, rho_w, invdz_w, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)

        srcs = (c_hbm, u_hbm, v_hbm, w_hbm, rho_hbm)
        dsts = (c_w, u_w, v_w, w_w, rho_w)
        pltpu.make_async_copy(invdz_hbm.at[pl.ds(i * bz, bz)], invdz_w,
                              sems.at[0, 5]).start()
        slot = prefetch_windows(srcs, dsts, sems, i, j, bz, by, wz, wy,
                                n_zblocks, n_yblocks)
        pltpu.make_async_copy(invdz_hbm.at[pl.ds(i * bz, bz)], invdz_w,
                              sems.at[0, 5]).wait()

        c = c_w[slot]
        u = u_w[slot]
        v = v_w[slot]
        w = w_w[slot]
        rho = rho_w[slot]

        # ---------- x direction (periodic: lane rolls) ----------------
        def xs(a, o):
            # roll semantics: out[i] = a[(i - s) mod n]; we want a[(i+o) mod n]
            return pltpu.roll(a, (-o) % nx, 2) if o else a

        # mass flux at x-face i: 0.5(ρ[i-1]+ρ[i]) u[i]
        mfx = 0.5 * (rho + xs(rho, -1)) * u
        cx = _weno_face(lambda o: xs(c, o - 1), mfx, bounds)
        Fx = mfx * cx
        div = (xs(Fx, 1) - Fx) * inv_dx          # at centers (all rows)
        acc = div[H:H + bz, HY:HY + by, :]

        # ---------- y direction (sublane static slices) ---------------
        # interior rows sit at window rows HY..HY+by; faces jy = HY..HY+by;
        # yc(a,o)[:, m, :] = row HY-1+o+m = cell (jy-1)+o for face jy=HY+m.
        def yc(a, o):
            return a[:, HY - 1 + o: HY + o + by, :]

        mfy = 0.5 * (yc(rho, 0) + yc(rho, 1))
        vy = v[:, HY: HY + by + 1, :]           # v at faces HY..HY+by
        mfy = mfy * vy
        cy = _weno_face(lambda o: yc(c, o), mfy, bounds)
        Fy = mfy * cy
        acc = acc + (Fy[:, 1:, :] - Fy[:, :-1, :])[H:H + bz, :, :] * inv_dy

        # ---------- z direction --------------------------------------
        def zc(a, o):
            return a[H - 1 + o: H + o + bz, :, :]

        mfz = 0.5 * (zc(rho, 0) + zc(rho, 1))
        wz_ = w[H: H + bz + 1, :, :]
        mfz = mfz * wz_
        cz = _weno_face(lambda o: zc(c, o), mfz, bounds)
        Fz = mfz * cz
        acc = acc + ((Fz[1:, :, :] - Fz[:-1, :, :])[:, HY:HY + by, :]
                     * invdz_w[:])

        out_ref[:] = -acc

    return kernel


@functools.partial(jax.jit, static_argnames=("inv_dx", "inv_dy", "nz", "ny", "nx", "bz", "by", "bounds", "interpret"))
def _run(c_pad, u_pad, v_pad, w_pad, rho_pad, inv_dz_col, inv_dx, inv_dy,
         nz, ny, nx, bz, by, bounds=False, interpret=False):
    kernel = _make_kernel(bz, by, nx, inv_dx, inv_dy, bounds,
                          n_zblocks=nz // bz, n_yblocks=ny // by)
    wz, wy = bz + 2 * H, by + 2 * HY
    grid = (nz // bz, ny // by)

    win = lambda: pltpu.VMEM((2, wz, wy, nx), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=pl.BlockSpec((bz, by, nx), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32),
        scratch_shapes=[win(), win(), win(), win(), win(),
                        pltpu.VMEM((bz, 1, nx), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, 6))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(c_pad, u_pad, v_pad, w_pad, rho_pad, inv_dz_col)


def _pick_block(n, candidates):
    for c in candidates:
        if n % c == 0:
            return c
    return None


def supported(grid, scheme) -> bool:
    from ..advection import WENO
    from ..grid import Topology

    return (isinstance(scheme, WENO) and scheme.order == 5
            and grid.x_topology == Topology.PERIODIC
            and grid.y_topology == Topology.PERIODIC
            and grid.dtype == jnp.float32
            and grid.halo >= H
            and grid.nx >= 128 and grid.ny >= 8 and grid.nz >= 8
            and _pick_block(grid.nz, (8, 16, 4)) is not None
            and _pick_block(grid.ny, (32, 16, 8, 64)) is not None)


def div_rho_u_c_pallas(grid, c_pad_zy, u_pad_zy, v_pad_zy, w_pad_zy,
                       rho_pad_zy, bounds=False, interpret=False):
    """Fused −∇·(ρuc); inputs pre-padded by H=3 in z and HY=4 in y (not x).

    ``bounds``: bounds-preserving clip (WENO(5, bounds_preserving=True))."""
    nz, ny, nx = grid.shape
    bz = _pick_block(nz, (8, 16, 4))
    by = _pick_block(ny, (32, 16, 8, 64))
    # Δz column from STATIC metadata (grid.dz_c may be a tracer under an
    # outer jit; dz_c_meta is the concrete tuple)
    inv_dz_col = bcast_col(1.0 / jnp.asarray(grid.dz_c_meta, jnp.float32), nx)
    return _run(c_pad_zy, u_pad_zy, v_pad_zy, w_pad_zy, rho_pad_zy,
                inv_dz_col,
                float(1.0 / grid.dx), float(1.0 / grid.dy),
                nz, ny, nx, bz, by, bounds=bounds,
                interpret=interpret or force_interpret())


def pad_zy(a, grid, loc):
    """Host-side pre-pad for the kernel: z by H=3, y by HY=4."""
    from .. import fields as fl

    out = fl.pad(a, grid, loc, halo=H, axes=(0,))
    return fl.pad(out, grid, loc, halo=HY, axes=(1,))


# ---------------------------------------------------------------------------
# x-prepadded (sharded) kernel mode
# ---------------------------------------------------------------------------
# Under shard_map with the x axis mesh-sharded, the in-kernel lane rolls wrap
# the LOCAL shard — wrong at shard edges.  The x-prepadded variant feeds the
# SAME kernels arrays padded by HX=128 lanes per side (shard-aware ``fl.pad``
# exchanges the halos via ppermute) and runs them with nx → nx+2·HX: the
# modular rolls then only wrap ≥125 lanes away from any lane the final
# [HX:HX+nx] output slice keeps, so the kernel body is unchanged.  HX must be
# a multiple of 128 (lane-aligned DMA windows and output slices); the cost is
# (nx+2HX)/nx more VPU/DMA work per shard — still far ahead of the jnp
# fallback the sharded step otherwise regresses to (VERDICT r2 item 2;
# reference equivalence: MPI decomposition never changes kernel code,
# ``src/Breeze.jl:208``).

HX = 128


def pad_x(a, grid, loc):
    """Shard-aware x pre-pad by HX (ppermute exchange under shard_map)."""
    from .. import fields as fl

    return fl.pad(a, grid, loc, halo=HX, axes=(2,))


def xpad_supported(grid) -> bool:
    """Local-shard grid constraints for the x-prepadded kernel mode."""
    from ..grid import Topology

    return (grid.x_topology == Topology.PERIODIC
            and grid.nx % 128 == 0 and grid.nx >= 128)


def sharded_kernel_mode(grid):
    """x-prepad width for the sharded kernel mode, or ``None`` when the
    kernels cannot run in the current shard_map context.

    - ``None``: fall back to jnp (not in a sharded context / disabled /
      local shard outside the envelope).
    - ``0``: y-only decomposition — the y halo pads (``pad_zy``) already
      route through ppermute via the shard-aware ``fl.pad`` and the kernel
      body has no whole-axis y op, so the DENSE kernels run unchanged.
    - ``HX``: the x axis is mesh-sharded — run the x-prepadded variant
      (module comment above).

    Covers 1-D x, 1-D y, and 2-D ``Partition(px, py)`` decompositions
    (reference: MPI decomposition never changes kernel code,
    ``src/Breeze.jl:208``).  ``BREEZE_TPU_DISABLE_PALLAS_XPAD=1`` opts out.
    """
    import os

    from ..parallel.halo import _current_axes
    axes = set(_current_axes())
    if not axes or not axes <= {1, 2}:
        return None
    if (os.environ.get("BREEZE_TPU_DISABLE_PALLAS")
            or os.environ.get("BREEZE_TPU_DISABLE_PALLAS_XPAD")
            or _DISABLE_DEPTH):
        return None
    if not (force_interpret()
            or jax.default_backend() in ("tpu", "axon")):
        return None
    if 2 in axes:
        return HX if xpad_supported(grid) else None
    return 0


def xpad_active() -> bool:
    """True inside a shard_map context where the x axis (2) is mesh-sharded
    (1-D x or 2-D Partition) and the x-prepadded kernel variants should run
    (TPU or interpret mode; ``BREEZE_TPU_DISABLE_PALLAS_XPAD=1`` opts
    out)."""
    import os

    from ..parallel.halo import _current_axes
    axes = set(_current_axes())
    if 2 not in axes or not axes <= {1, 2}:
        return False
    if (os.environ.get("BREEZE_TPU_DISABLE_PALLAS")
            or os.environ.get("BREEZE_TPU_DISABLE_PALLAS_XPAD")
            or _DISABLE_DEPTH):
        return False
    if force_interpret():
        return True
    return jax.default_backend() in ("tpu", "axon")


import contextlib

_DISABLE_DEPTH = 0


@contextlib.contextmanager
def disabled():
    """Context manager forcing the jnp fallback (e.g. while tracing a
    GSPMD multi-device step, where ``pallas_call`` has no partitioning
    rules)."""
    global _DISABLE_DEPTH
    _DISABLE_DEPTH += 1
    try:
        yield
    finally:
        _DISABLE_DEPTH -= 1


def force_interpret() -> bool:
    """CI hook: ``BREEZE_TPU_PALLAS_INTERPRET=1`` makes ``enabled()`` true
    on any backend and runs every kernel in interpret mode — lets the
    CPU test suite exercise the exact production wiring."""
    import os

    return bool(os.environ.get("BREEZE_TPU_PALLAS_INTERPRET"))


def enabled() -> bool:
    """Pallas kernels are the DEFAULT on TPU backends (verified compiled +
    bitwise-equal on v5e through the axon tunnel); set
    ``BREEZE_TPU_DISABLE_PALLAS=1`` to force the jnp fallback."""
    import os

    if os.environ.get("BREEZE_TPU_DISABLE_PALLAS") or _DISABLE_DEPTH:
        return False
    # Under shard_map the kernels' whole-axis assumptions break: the
    # in-kernel periodic x rolls (and the acoustic/projection kernels' own
    # wrap pads) act on the LOCAL shard, not the global axis.  fl.pad
    # reroutes through ppermute, but the lane-resident x wrap cannot —
    # fall back to the shard-aware jnp path inside sharded contexts.
    from ..parallel.halo import _current_axes
    if _current_axes():
        return False
    if force_interpret():
        return True
    return jax.default_backend() in ("tpu", "axon")


def available(grid, scheme) -> bool:
    return enabled() and supported(grid, scheme)
