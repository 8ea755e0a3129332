"""Flux-form advection schemes: Centered, UpwindBiased, WENO.

TPU-native equivalent of the reference's Oceananigans advection substrate
(``Centered``, ``UpwindBiased``, ``WENO(order=5)``; reference
``src/Breeze.jl:209``, ``src/Advection.jl``).  Reconstruction is expressed
as shifted-window arithmetic over halo-padded arrays; XLA fuses the entire
flux-divergence computation into one loop.  Both upwind branches are computed
and selected with ``jnp.where`` — on the VPU this is cheaper than divergent
control flow, and the Pallas WENO kernel can specialize later.

Interface/staggering conventions follow :mod:`breeze_tpu.ops`.  All flux and
reconstruction arrays are **interior-sized** (``n`` entries along the flux
axis, lane/sublane aligned — the earlier ``n+1`` layout paid a large
misalignment tax):

- target ``"cf"``: reconstruct a center-located quantity at faces
  ``0..n-1`` (each face ``i`` separates cells ``i-1`` and ``i``); the
  missing face ``n`` is recovered by the divergence helper via ``roll``
  (periodic) or an implicit zero (bounded wall).
- target ``"fc"``: reconstruct a face-located quantity at centers
  ``0..n-1`` (center ``i`` sits between faces ``i`` and ``i+1``).

The caller forms ``flux = massflux * reconstructed`` and applies
``_div_cf`` / ``_div_fc`` (roll-based wraparound or shift-in-zero walls) to
land on the natural divergence location.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .grid import Grid, Topology as _Topo
from .ops import StencilOps


@dataclasses.dataclass(frozen=True)
class Centered:
    order: int = 2

    @property
    def required_halo(self):
        return self.order // 2


@dataclasses.dataclass(frozen=True)
class UpwindBiased:
    order: int = 3

    @property
    def required_halo(self):
        return (self.order + 1) // 2


@dataclasses.dataclass(frozen=True)
class WENO:
    """WENO reconstruction; ``bounds_preserving`` clips each interface value
    to the hull of its adjacent cells (TPU analogue of the reference's
    bounds-preserving WENO route, ``src/Advection.jl:42-47``): under the CFL
    this keeps tracers within their initial bounds (no new extrema), at the
    cost of locally reducing to low order at clipped interfaces."""

    order: int = 5
    epsilon: float = 1e-6
    bounds_preserving: bool = False

    @property
    def required_halo(self):
        return (self.order + 1) // 2


@dataclasses.dataclass(frozen=True)
class FluxFormAdvection:
    """Per-direction advection schemes (reference ``FluxFormAdvection``,
    re-exported at ``src/Breeze.jl:209`` from Oceananigans): e.g. WENO(5)
    horizontally with Centered(2) vertically.  Each flux direction's
    interface reconstruction uses its own scheme; :func:`reconstruct`
    resolves the per-axis scheme at the call site.  Falls back to the jnp
    path (the fused Pallas kernels cover the uniform-WENO5 canonical
    config only)."""

    x: object = dataclasses.field(default_factory=lambda: WENO(5))
    y: object = dataclasses.field(default_factory=lambda: WENO(5))
    z: object = dataclasses.field(default_factory=lambda: WENO(5))

    @property
    def required_halo(self):
        return max(self.x.required_halo, self.y.required_halo,
                   self.z.required_halo)

    @property
    def bounds_preserving(self):
        return any(getattr(sch, "bounds_preserving", False)
                   for sch in (self.x, self.y, self.z))

    def for_axis(self, axis: int):
        """Array layout is (z, y, x): axis 0 → z, 1 → y, 2 → x."""
        return (self.z, self.y, self.x)[axis]


@dataclasses.dataclass(frozen=True)
class AdaptiveImplicitVerticalAdvection:
    """Adaptive explicit/implicit vertical-advection split (AIVA).

    TPU analogue of reference ``implicit_vertical_advection.jl:78-230``
    (Oceananigans ``AdaptiveImplicitVerticalAdvection``): wherever the local
    vertical advective CFL α = |w̄|Δt/Δz exceeds ``cfl``, the explicit
    vertical flux is scaled by s = cfl/α and the remainder velocity
    w̄ⁱ = w̄(1 − s) is applied as a first-order-upwind IMPLICIT tridiagonal
    step — removing the vertical advective Δt limit (stretched-grid LES,
    deep convective updrafts).  ``scheme`` is the underlying reconstruction
    used for the explicit fluxes.
    """

    scheme: object
    cfl: float = 0.7

    @property
    def required_halo(self):
        return self.scheme.required_halo

    @property
    def order(self):
        return getattr(self.scheme, "order", 2)


# ---------------------------------------------------------------------------
# Window helpers
# ---------------------------------------------------------------------------

def _interior_except(a: jax.Array, axis: int, h: int, shape) -> jax.Array:
    """Restrict the two non-flux axes to the interior window.

    Size-1 (broadcast/column) axes are left untouched — this lets z-profile
    reference columns flow through the flux machinery without
    materialization."""
    idx = []
    for ax in range(3):
        if ax == axis or a.shape[ax] == 1:
            idx.append(slice(None))
        else:
            idx.append(slice(h, h + shape[ax]))
    return a[tuple(idx)]


def _slide(b: jax.Array, axis: int, h: int, n_out: int, off: int) -> jax.Array:
    """Slice ``n_out`` entries along ``axis`` starting at padded index h+off.

    A size-1 (broadcast) axis returns unchanged."""
    if b.shape[axis] == 1:
        return b
    return jax.lax.slice_in_dim(b, h + off, h + off + n_out, axis=axis)


class _Windows:
    """Bind (array, axis, halo, n_out, base) so stencil formulas read naturally.

    ``g(o)`` returns the window of the cell at relative offset ``o`` from the
    *left/upwind* cell of each interface, for a given sweep direction.
    """

    def __init__(self, b, axis, h, n_out, left0):
        self.b, self.axis, self.h, self.n_out, self.left0 = b, axis, h, n_out, left0

    def pos(self, o):
        """Cell at absolute offset left0 + o (positive-velocity orientation)."""
        return _slide(self.b, self.axis, self.h, self.n_out, self.left0 + o)

    def neg(self, o):
        """Mirror image: offset o on the upwind side for negative velocity."""
        return _slide(self.b, self.axis, self.h, self.n_out, self.left0 + 1 - o)


# ---------------------------------------------------------------------------
# Pointwise stencil formulas in terms of g(o); o=0 is the upwind cell,
# o=1 the downwind cell, o=-1 further upwind, etc.
# ---------------------------------------------------------------------------

def _centered2(g):
    return 0.5 * (g(0) + g(1))


def _centered4(g):
    return (7.0 * (g(0) + g(1)) - (g(-1) + g(2))) / 12.0


def _upwind1(g):
    return g(0)


def _upwind3(g):
    return (-g(-1) + 5.0 * g(0) + 2.0 * g(1)) / 6.0


def _upwind5(g):
    return (2.0 * g(-2) - 13.0 * g(-1) + 47.0 * g(0) + 27.0 * g(1) - 3.0 * g(2)) / 60.0


def _weno5(g, eps):
    """Classic WENO-JS fifth order (Jiang & Shu 1996)."""
    qm2, qm1, q0, q1, q2 = g(-2), g(-1), g(0), g(1), g(2)

    p0 = (2.0 * qm2 - 7.0 * qm1 + 11.0 * q0) / 6.0
    p1 = (-qm1 + 5.0 * q0 + 2.0 * q1) / 6.0
    p2 = (2.0 * q0 + 5.0 * q1 - q2) / 6.0

    b0 = (13.0 / 12.0) * (qm2 - 2.0 * qm1 + q0) ** 2 + 0.25 * (qm2 - 4.0 * qm1 + 3.0 * q0) ** 2
    b1 = (13.0 / 12.0) * (qm1 - 2.0 * q0 + q1) ** 2 + 0.25 * (qm1 - q1) ** 2
    b2 = (13.0 / 12.0) * (q0 - 2.0 * q1 + q2) ** 2 + 0.25 * (3.0 * q0 - 4.0 * q1 + q2) ** 2

    # Common-denominator weights: aᵢ ∝ dᵢ/(bᵢ+ε)² with the Πⱼ(bⱼ+ε)²
    # factor cancelled — two divides instead of four (divides dominate the
    # VPU cost of the weight stage on TPU); ratios are mathematically
    # identical to the classic form.  The βs are first normalized by their
    # max so the pair products cannot overflow f32 (large-magnitude fields
    # like number concentrations reach β ~ 1e16, whose raw pair products
    # hit 1e64 → inf → NaN).
    e0 = b0 + eps
    e1 = b1 + eps
    e2 = b2 + eps
    inv_m = 1.0 / jnp.maximum(e0, jnp.maximum(e1, e2))
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


_WENO9_D = (1.0 / 126.0, 10.0 / 63.0, 10.0 / 21.0, 20.0 / 63.0, 5.0 / 126.0)


def _weno9_candidates(q):
    """Candidate polynomials + smoothness indicators for WENO9 (Balsara & Shu 2000)."""
    qm4, qm3, qm2, qm1, q0, q1, q2, q3, q4 = q
    p0 = (12.0 * qm4 - 63.0 * qm3 + 137.0 * qm2 - 163.0 * qm1 + 137.0 * q0) / 60.0
    p1 = (-3.0 * qm3 + 17.0 * qm2 - 43.0 * qm1 + 77.0 * q0 + 12.0 * q1) / 60.0
    p2 = (2.0 * qm2 - 13.0 * qm1 + 47.0 * q0 + 27.0 * q1 - 3.0 * q2) / 60.0
    p3 = (-3.0 * qm1 + 27.0 * q0 + 47.0 * q1 - 13.0 * q2 + 2.0 * q3) / 60.0
    p4 = (12.0 * q0 + 77.0 * q1 - 43.0 * q2 + 17.0 * q3 - 3.0 * q4) / 60.0

    def beta(a, b, c, d, e):
        # Smoothness indicator of the 5-point sub-stencil (Balsara & Shu 2000, eq. 2.17)
        return (a * (22658.0 * a - 208501.0 * b + 364863.0 * c - 288007.0 * d + 86329.0 * e)
                + b * (482963.0 * b - 1704396.0 * c + 1358458.0 * d - 411487.0 * e)
                + c * (1521393.0 * c - 2462076.0 * d + 758823.0 * e)
                + d * (1020563.0 * d - 649501.0 * e)
                + e * (107918.0 * e)) / 10080.0

    b0 = beta(qm4, qm3, qm2, qm1, q0)
    b1 = beta(qm3, qm2, qm1, q0, q1)
    b2 = beta(qm2, qm1, q0, q1, q2)
    b3 = beta(qm1, q0, q1, q2, q3)
    b4 = beta(q0, q1, q2, q3, q4)
    return (p0, p1, p2, p3, p4), (b0, b1, b2, b3, b4)


def _weno9(g, eps):
    q = tuple(g(o) for o in range(-4, 5))
    ps, bs = _weno9_candidates(q)
    alphas = [d / (b + eps) ** 2 for d, b in zip(_WENO9_D, bs)]
    s = sum(alphas)
    return sum(a * p for a, p in zip(alphas, ps)) / s


def _biased_formula(scheme):
    if isinstance(scheme, Centered):
        return {2: _centered2, 4: _centered4}[scheme.order], True
    if isinstance(scheme, UpwindBiased):
        return {1: _upwind1, 3: _upwind3, 5: _upwind5}[scheme.order], False
    if isinstance(scheme, WENO):
        if scheme.order == 5:
            return (lambda g: _weno5(g, scheme.epsilon)), False
        if scheme.order == 9:
            return (lambda g: _weno9(g, scheme.epsilon)), False
        raise ValueError(f"WENO order {scheme.order} not supported")
    raise TypeError(f"unknown advection scheme {scheme!r}")


def reconstruct(scheme, q_pad: jax.Array, upwind_sign: jax.Array | None,
                axis: int, h: int, shape, target: str) -> jax.Array:
    """Reconstruct interface values of ``q`` along ``axis``.

    ``upwind_sign`` is an array at the interface locations (same shape as the
    output) whose sign selects the upwind branch; pass ``None`` for purely
    centered schemes.  See module docstring for the output layout.
    """
    if isinstance(scheme, AdaptiveImplicitVerticalAdvection):
        # Paths without AIVA support (compressible, terrain, kinematic) fall
        # back to the inner scheme, fully explicit.
        scheme = scheme.scheme
    if isinstance(scheme, FluxFormAdvection):
        scheme = scheme.for_axis(axis)
    n = shape[axis]
    n_out = n
    # "cf": output m is face m, between cells m-1 (left) and m (right).
    # "fc": output m is center m, between faces m (left) and m+1 (right).
    left0 = -1 if target == "cf" else 0
    b = _interior_except(q_pad, axis, h, shape)
    w = _Windows(b, axis, h, n_out, left0)

    formula, symmetric = _biased_formula(scheme)
    if symmetric:
        return formula(w.pos)
    assert upwind_sign is not None, "upwind schemes need an advecting velocity"

    # Stencil-select upwinding: pick the upwind cell for each offset with a
    # cheap select, then evaluate the biased formula ONCE — half the
    # reconstruction arithmetic and intermediates of the compute-both-
    # branches approach (the VPU win that makes jnp-level WENO competitive).
    up = upwind_sign >= 0

    def g(o):
        return jnp.where(up, w.pos(o), w.neg(o))

    out = formula(g)
    if isinstance(scheme, WENO) and scheme.bounds_preserving:
        qL, qR = w.pos(0), w.pos(1)
        out = jnp.clip(out, jnp.minimum(qL, qR), jnp.maximum(qL, qR))
    return out


# ---------------------------------------------------------------------------
# Interface mass fluxes & flux divergences
#
# All flux arrays are INTERIOR-SIZED (n per axis, lane/sublane aligned — the
# earlier n+1 layout paid a large misalignment tax on every intermediate).
# Divergences wrap via jnp.roll on periodic axes; on the bounded z axis the
# top-wall flux is an implicit zero (shift-in-zero).
# ---------------------------------------------------------------------------

def _iface_cf(a_pad, axis, h, shape):
    """Center→face interpolation at faces 0..n-1 along ``axis``."""
    b = _interior_except(a_pad, axis, h, shape)
    n = shape[axis]
    return 0.5 * (_slide(b, axis, h, n, -1) + _slide(b, axis, h, n, 0))


def _iface_fc(a_pad, axis, h, shape):
    """Face→center interpolation at centers 0..n-1 along ``axis``."""
    b = _interior_except(a_pad, axis, h, shape)
    n = shape[axis]
    return 0.5 * (_slide(b, axis, h, n, 0) + _slide(b, axis, h, n, 1))


def _iview(a_pad, axis, h, shape):
    """Interior view (entries 0..n-1) with other axes restricted too."""
    b = _interior_except(a_pad, axis, h, shape)
    return _slide(b, axis, h, shape[axis], 0)


def _wrap_roll(F, shift, axis):
    """Periodic wrap roll, shard-aware under shard_map (ppermute slab)."""
    from .parallel.halo import wrap_roll
    return wrap_roll(F, shift, axis)


def _shift_in_zero(F, axis, from_top: bool):
    zshape = list(F.shape)
    zshape[axis] = 1
    zero = jnp.zeros(zshape, F.dtype)
    n = F.shape[axis]
    if from_top:   # next(i) = F(i+1), F(n) = 0
        body = jax.lax.slice_in_dim(F, 1, n, axis=axis)
        return jnp.concatenate([body, zero], axis=axis)
    body = jax.lax.slice_in_dim(F, 0, n - 1, axis=axis)
    return jnp.concatenate([zero, body], axis=axis)


def _div_cf(F, axis, spacing, periodic: bool):
    """Face-flux → center divergence: (F(i+1) − F(i))/Δ.

    Periodic: F(n) ≡ F(0) (roll).  Bounded: F(n) = 0 (wall flux vanishes —
    valid because wall-normal mass flux is zero there)."""
    nxt = _wrap_roll(F, -1, axis) if periodic else _shift_in_zero(F, axis, True)
    return (nxt - F) / spacing


def _ydiv_cf(so, F, periodic: bool):
    """y-face flux → center divergence with spherical cos-weighting."""
    g = so.grid
    if g.is_latlon:
        assert not periodic, "lat-lon y is bounded"
        ny = g.ny
        cosf = g.coslat_f[None, :, None]           # (1, ny+1, 1)
        Fw = F * cosf[:, :ny]
        # upper face of row ny-1 is the wall (zero flux); interior upper
        # faces carry their own cos weight
        return (_shift_top_weighted(F, cosf, ny) - Fw) / (g.dy * so.cosc_row)
    return _div_cf(F, 1, g.dy, periodic)


def _shift_top_weighted(F, cosf, ny):
    """Upper-face flux rows: F[j+1]·cosφ_f[j+1]; wall row gets zero."""
    body = F[:, 1:, :] * cosf[:, 1:ny]
    zero = jnp.zeros_like(F[:, :1, :])
    return jnp.concatenate([body, zero], axis=1)


def _ydiv_fc(so, Fc, periodic: bool):
    """y-center flux → y-face divergence with spherical cos-weighting."""
    g = so.grid
    if g.is_latlon:
        Fw = Fc * so.cosc_row
        prv = _wrap_roll(Fw, 1, 1) if periodic else _shift_in_zero(Fw, 1, False)
        return (Fw - prv) / (g.dy * so.cosf_row)
    return _div_fc(Fc, 1, g.dy, periodic)


def _div_fc(F, axis, spacing, periodic: bool):
    """Center-flux → face divergence: (F(i) − F(i−1))/Δ.

    Bounded: the i=0 row references the below-wall flux; it is garbage there
    and must be overwritten by the wall condition (impenetrability)."""
    prv = _wrap_roll(F, 1, axis) if periodic else _shift_in_zero(F, axis, False)
    return (F - prv) / spacing


def div_rho_u_c(so: StencilOps, scheme, rho_pad, u_pad, v_pad, w_pad, c_pad,
                z_flux_scale=None, z_spacing=None, face_fractions=None):
    """∇·(ρ u c) at cell centers — the density-weighted tracer flux divergence.

    TPU analogue of reference ``div_ρUc`` (``src/Advection.jl:30-37``):
    ``ℑ(ρ)`` at the face times the advective tracer flux, differenced.
    ``c`` is the *specific* (per-mass) quantity.  ``z_flux_scale``
    (interior z-face shape) multiplies the vertical flux — the AIVA
    explicit-flux CFL scaling (``implicit_vertical_advection.jl``).

    Partial cells (:class:`~breeze_tpu.dynamics.immersed.PartialCellBottom`):
    ``z_spacing`` overrides the z-divergence cell thickness (3-D), and
    ``face_fractions = (fx, fy, fc)`` applies the exact area-weighted form —
    horizontal fluxes × open face fraction, divergence ÷ open cell fraction
    — keeping Σ (ρc)·V conservative over shortened bottom cells.
    """
    g, h, shape = so.grid, so.h, so.shape
    topo = g.topologies()
    per = [t == _Topo.PERIODIC for t in topo]
    fx = fy = None
    fc = 1.0
    if face_fractions is not None:
        fx, fy, fc = face_fractions

    mfx = _iface_cf(rho_pad, 2, h, shape) * _iview(u_pad, 2, h, shape)
    cx = reconstruct(scheme, c_pad, mfx, 2, h, shape, "cf")
    Fx = mfx * cx if fx is None else mfx * cx * fx
    out = _div_cf(Fx, 2, fc, per[2]) * so.inv_dx

    mfy = _iface_cf(rho_pad, 1, h, shape) * _iview(v_pad, 1, h, shape)
    cy = reconstruct(scheme, c_pad, mfy, 1, h, shape, "cf")
    Fy = mfy * cy if fy is None else mfy * cy * fy
    ydiv = _ydiv_cf(so, Fy, per[1])
    out = out + (ydiv if fy is None else ydiv / fc)

    mfz = _iface_cf(rho_pad, 0, h, shape) * _iview(w_pad, 0, h, shape)
    cz = reconstruct(scheme, c_pad, mfz, 0, h, shape, "cf")
    Fz = mfz * cz
    if z_flux_scale is not None:
        Fz = Fz * z_flux_scale
    dzc = g.dz_c_col if z_spacing is None else z_spacing
    out = out + _div_cf(Fz, 0, dzc, per[0])
    return out


def momentum_flux_divergence(so: StencilOps, scheme,
                             rho_u_pad, rho_v_pad, rho_w_pad,
                             u_pad, v_pad, w_pad,
                             z_scales=None, z_spacings=None):
    """Flux-form ∇·(ρU ⊗ u) for all three momentum components.

    TPU analogue of reference ``div_𝐯u/v/w`` usage in
    ``dynamics_kernel_functions.jl:54-62``: the advecting flux is the
    *momentum* (ρu, ρv, ρw); the advected quantity is the *velocity*.
    Advecting fluxes are interpolated to the advected component's interface
    locations with second-order averages; the advected velocity is
    reconstructed with ``scheme``.

    Returns ``(div_u, div_v, div_w)`` at the (x-face, y-face, z-face)
    momentum locations respectively.  ``z_scales`` is an optional
    ``(s_u, s_v, s_w)`` triple of AIVA explicit-flux scalings for the
    vertical flux of each component (``implicit_vertical_advection.jl``):
    s_u/s_v at the (zf, xf)/(zf, yf) flux locations, s_w at z-centers.
    """
    s_u = s_v = s_w = None
    if z_scales is not None:
        s_u, s_v, s_w = z_scales
    g, h, shape = so.grid, so.h, so.shape
    dzc, dzf = g.dz_c_col, g.dz_f_col
    # Partial-cell overrides (3-D thickness at the u/v locations; the
    # w-face spacing keeps the grid value — ρw is pinned at the wall).
    dzc_u = dzc_v = dzc
    if z_spacings is not None:
        dzc_u, dzc_v, dzf = (s if s is not None else d
                             for s, d in zip(z_spacings, (dzc, dzc, dzf)))
    per = [t == _Topo.PERIODIC for t in g.topologies()]

    # ---- x momentum: u at (zc, yc, xf) ------------------------------
    mf = _iface_fc(rho_u_pad, 2, h, shape)           # at centers
    q = reconstruct(scheme, u_pad, mf, 2, h, shape, "fc")
    du = _div_fc(mf * q, 2, 1.0, per[2]) * so.inv_dx
    mf = _iview(_pad_interp_cf_x(rho_v_pad), 1, h, shape)   # (yf, xf) corners
    q = reconstruct(scheme, u_pad, mf, 1, h, shape, "cf")
    du = du + _ydiv_cf(so, mf * q, per[1])
    mf = _iview(_pad_interp_cf_x(rho_w_pad), 0, h, shape)   # (zf, xf)
    q = reconstruct(scheme, u_pad, mf, 0, h, shape, "cf")
    Fzu = mf * q
    if s_u is not None:
        Fzu = Fzu * s_u
    du = du + _div_cf(Fzu, 0, dzc_u, per[0])

    # ---- y momentum: v at (zc, yf, xc) ------------------------------
    mf = _iview(_pad_interp_cf_y(rho_u_pad), 2, h, shape)
    q = reconstruct(scheme, v_pad, mf, 2, h, shape, "cf")
    dv = _div_cf(mf * q, 2, 1.0, per[2]) * so.inv_dx_yface
    mf = _iface_fc(rho_v_pad, 1, h, shape)
    q = reconstruct(scheme, v_pad, mf, 1, h, shape, "fc")
    dv = dv + _ydiv_fc(so, mf * q, per[1])
    mf = _iview(_pad_interp_cf_y(rho_w_pad), 0, h, shape)
    q = reconstruct(scheme, v_pad, mf, 0, h, shape, "cf")
    Fzv = mf * q
    if s_v is not None:
        Fzv = Fzv * s_v
    dv = dv + _div_cf(Fzv, 0, dzc_v, per[0])

    # ---- z momentum: w at (zf, yc, xc) ------------------------------
    mf = _iview(_pad_interp_cf_z(rho_u_pad), 2, h, shape)
    q = reconstruct(scheme, w_pad, mf, 2, h, shape, "cf")
    dw = _div_cf(mf * q, 2, 1.0, per[2]) * so.inv_dx
    mf = _iview(_pad_interp_cf_z(rho_v_pad), 1, h, shape)
    q = reconstruct(scheme, w_pad, mf, 1, h, shape, "cf")
    dw = dw + _ydiv_cf(so, mf * q, per[1])
    mf = _iface_fc(rho_w_pad, 0, h, shape)
    q = reconstruct(scheme, w_pad, mf, 0, h, shape, "fc")
    Fzw = mf * q
    if s_w is not None:
        Fzw = Fzw * s_w
    # Bounded z: the face-0 row of _div_fc references below-wall data; the
    # wall condition (ρw = 0, enforced by the stepper) overwrites it.
    dw = dw + _div_fc(Fzw, 0, dzf, per[0])

    return du, dv, dw


# Padded-in/padded-out 1-shift interpolations used to move an advecting flux
# onto a corner location while *keeping the other axes padded* (the subsequent
# interface window consumes the padding along the flux axis).
def _pad_interp_cf_x(a_pad):
    return 0.5 * (a_pad + jnp.roll(a_pad, 1, axis=2))


def _pad_interp_cf_y(a_pad):
    return 0.5 * (a_pad + jnp.roll(a_pad, 1, axis=1))


def _pad_interp_cf_z(a_pad):
    return 0.5 * (a_pad + jnp.roll(a_pad, 1, axis=0))
