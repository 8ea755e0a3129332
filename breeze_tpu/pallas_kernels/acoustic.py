"""Fused Pallas kernels for the compressible acoustic substep.

The split-explicit fast loop (``dynamics/compressible.py::
acoustic_substep_loop``, reference ``acoustic_substepping.jl:1365-1551``)
runs steps A-E over five carried perturbation fields 6-18 times per outer
step; the jnp path materializes ~2-3x the fields' own HBM traffic per
substep (halo pads, predictors, divergence intermediates, the two Thomas
sweeps).  Here one substep = TWO fused kernels:

- **K1 (horizontal)**: step A (perturbation PGF + forward-Euler ρu′, ρv′)
  and step B (updated horizontal divergences → the ρ′★/(ρθ)′★
  predictors).  Grid over (z, y) blocks; x lane-resident (periodic
  rolls); one y halo row each side via overlapping DMA windows; one extra
  z row above for the ∂z terms.
- **K2 (vertical)**: step C (Crank-Nicolson tridiagonal for ρw′ — the
  coefficients are rebuilt in VMEM from C^L/θ^L each substep, cheaper
  than streaming three 3-D coefficient fields), step D (recovery), and
  step E (Klemp thermal divergence damping, which needs the freshly
  recovered (ρθ)′ at halo rows — the column solve runs redundantly one
  row beyond the block so the damping stencil stays block-local).  Grid
  over y blocks with the full column in VMEM.

Index conventions (array layout (z, y, x), interior-sized fields, faces
stored 0..N-1 = lower edges):
- window y rows ``0..by+1`` ↔ global centers ``j·by−1 .. j·by+by``
  (periodic wrap rows added host-side);
- a y-face between window-center rows ``m`` and ``m+1`` is global face
  ``j·by+m``; output faces are ``m = 0..by−1`` → window face index m,
  i.e. rv output row m ↔ window row m+1 of center-located fields.

Scope (jnp fallback otherwise): flat terrain, Cartesian periodic x/y,
bounded z (uniform or stretched Δz), no upper sponge, damping ∈ {None,
ThermalDivergenceDamping}, float32 working precision, no open-boundary
relaxation.  Numerics identical to the jnp loop (interpret-verified in
``tests/test_pallas_kernels.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# K1: horizontal momentum update + predictors
# ---------------------------------------------------------------------------

def _make_k1(bz: int, by: int, nx: int, inv_dx: float, inv_dy: float,
             dtau: float, omega: float, store_dt=jnp.float32):
    wz = bz + 1          # one extra z row ABOVE the block (∂z shifts)
    wy = by + 8          # one y halo row each side + 6 slack rows so the
    #                      DMA window sublane count is 8-aligned (Mosaic);
    #                      the kernel only uses rows 0..by+1
    ly = by + 2          # logical window rows (global j·by−1 .. j·by+by)
    f32 = jnp.float32

    def kernel(ru_hbm, rv_hbm, rw_hbm, rho_hbm, rt_hbm, cl_hbm, th_hbm,
               thzf_hbm, gru_hbm, grv_hbm, grho_hbm, grt_hbm, invdzc_hbm,
               pgf_ref,
               ru_o, rv_o, rhos_o, rts_o,
               ru_w, rv_w, rw_w, rho_w, rt_w, cl_w, th_w, thzf_w,
               gru_w, grv_w, grho_w, grt_w, invdzc_w, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)

        srcs = (ru_hbm, rv_hbm, rw_hbm, rho_hbm, rt_hbm, cl_hbm, th_hbm,
                thzf_hbm, gru_hbm, grv_hbm, grho_hbm, grt_hbm)
        dsts = (ru_w, rv_w, rw_w, rho_w, rt_w, cl_w, th_w, thzf_w,
                gru_w, grv_w, grho_w, grt_w)
        for n, (src, dst) in enumerate(zip(srcs, dsts)):
            pltpu.make_async_copy(
                src.at[pl.ds(i * bz, wz), pl.ds(j * by, wy), :],
                dst, sems.at[n]).start()
        pltpu.make_async_copy(invdzc_hbm.at[pl.ds(i * bz, bz)], invdzc_w,
                              sems.at[12]).start()
        for n, (src, dst) in enumerate(zip(srcs, dsts)):
            pltpu.make_async_copy(
                src.at[pl.ds(i * bz, wz), pl.ds(j * by, wy), :],
                dst, sems.at[n]).wait()
        pltpu.make_async_copy(invdzc_hbm.at[pl.ds(i * bz, bz)], invdzc_w,
                              sems.at[12]).wait()

        pgf = pgf_ref[0]

        def xs(a, o):
            return pltpu.roll(a, (-o) % nx, 2) if o % nx else a

        # logical-window views (rows 0..by+1; the DMA slack rows are unused)
        lv = lambda r: r[:, :ly, :]
        # carried perturbations may be stored reduced-precision; upcast
        # for the arithmetic (the jnp loop's substep_floattype semantics)
        ru_p = lv(ru_w).astype(f32)
        rv_p = lv(rv_w).astype(f32)
        rw_p = lv(rw_w).astype(f32)
        rho_p = lv(rho_w).astype(f32)
        rt_p = lv(rt_w).astype(f32)
        gru = lv(gru_w)
        grv = lv(grv_w)
        grho = lv(grho_w)
        grt = lv(grt_w)

        # ---- step A on all window rows (halo rows feed step B) ---------
        pp = lv(cl_w) * rt_p                          # p' = C^L (ρθ)'
        dpdx = (pp - xs(pp, -1)) * inv_dx             # at x-faces, all rows
        ru_new = ru_p + dtau * (gru - pgf * dpdx)
        # y-faces m = 0..by (global j·by+m): pp rows m, m+1
        dpdy = (pp[:, 1:, :] - pp[:, :-1, :]) * inv_dy
        rv_new = (rv_p[:, 1:, :]
                  + dtau * (grv[:, 1:, :] - pgf * dpdy))

        # ---- step B on block-interior rows (window rows 1..by) ---------
        div_h = ((xs(ru_new, 1) - ru_new)[:bz, 1:1 + by, :] * inv_dx
                 + (rv_new[:, 1:, :] - rv_new[:, :-1, :])[:bz, :, :]
                 * inv_dy)

        th = lv(th_w)
        fx = 0.5 * (th + xs(th, -1)) * ru_new
        fy = 0.5 * (th[:, 1:, :] + th[:, :-1, :]) * rv_new
        div_ht = ((xs(fx, 1) - fx)[:bz, 1:1 + by, :] * inv_dx
                  + (fy[:, 1:, :] - fy[:, :-1, :])[:bz, :, :] * inv_dy)

        # dz_fc_div with the +1 z row (next block's first row; zero at the
        # domain top — padded host-side)
        rw = rw_p
        thf = lv(thzf_w)
        inv_dzc = invdzc_w[:]                       # (bz, 1, nx)
        dzdiv = (rw[1:, :, :] - rw[:-1, :, :]) * inv_dzc
        dzdiv_t = (thf[1:, :, :] * rw[1:, :, :]
                   - thf[:-1, :, :] * rw[:-1, :, :]) * inv_dzc

        ci = lambda a: a[:bz, 1:1 + by, :]            # center-interior view
        ru_o[:] = ci(ru_new)
        rv_o[:] = rv_new[:bz, :by, :]                 # faces m = 0..by-1
        rhos_o[:] = (ci(rho_p) + dtau * (ci(grho) - div_h)
                     - dtau * (1.0 - omega) * ci_z(dzdiv, by))
        rts_o[:] = (ci(rt_p) + dtau * (ci(grt) - div_ht)
                    - dtau * (1.0 - omega) * ci_z(dzdiv_t, by))

    return kernel


def ci_z(a, by):
    """Interior y rows of a z-differenced (bz, wy, nx) array."""
    return a[:, 1:1 + by, :]


@functools.partial(jax.jit, static_argnames=(
    "bz", "by", "nz", "ny", "nx", "inv_dx", "inv_dy", "dtau",
    "omega", "store", "interpret"))
def _run_k1(ru, rv, rw, rho, rt, cl, th, thzf, gru, grv, grho, grt,
            inv_dzc_col, pgf,
            bz, by, nz, ny, nx, inv_dx, inv_dy, dtau, omega,
            store="float32", interpret=False):
    """Inputs are interior (nz, ny, nx); this pads +1 top z row (zero for
    ρw, repeat otherwise — the repeat rows only multiply the zero ρw) and
    periodic y rows: 1 below + 7 above (1 used + 6 slack so the DMA
    window sublane count by+8 is 8-aligned)."""
    def padzy(a, zero_top):
        top = jnp.zeros_like(a[:1]) if zero_top else a[-1:]
        a = jnp.concatenate([a, top], axis=0)
        return jnp.concatenate([a[:, -1:, :], a, a[:, :7, :]], axis=1)

    args = [padzy(ru, False), padzy(rv, False), padzy(rw, True),
            padzy(rho, False), padzy(rt, False), padzy(cl, False),
            padzy(th, False), padzy(thzf, False), padzy(gru, False),
            padzy(grv, False), padzy(grho, False), padzy(grt, False)]
    store_dt = jnp.dtype(store)
    kernel = _make_k1(bz, by, nx, inv_dx, inv_dy, dtau, omega,
                      store_dt=store_dt)
    wz, wy = bz + 1, by + 8
    grid = (nz // bz, ny // by)
    win = lambda dt=jnp.float32: pltpu.VMEM((wz, wy, nx), dt)
    out = jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32)
    outspec = pl.BlockSpec((bz, by, nx), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    # the five carried windows hold the (possibly reduced) storage dtype
    carry_wins = [win(store_dt) for _ in range(5)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 13
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[outspec] * 4,
        out_shape=[out] * 4,
        scratch_shapes=carry_wins + [win() for _ in range(7)]
        + [pltpu.VMEM((bz, 1, nx), jnp.float32),
           pltpu.SemaphoreType.DMA((13,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args, inv_dzc_col, jnp.asarray(pgf, jnp.float32).reshape(1))


# ---------------------------------------------------------------------------
# K2: column CN solve + recovery + thermal divergence damping
# ---------------------------------------------------------------------------

def _make_k2(by: int, nz: int, nx: int, dx: float, dy: float,
             dtau: float, omega: float, g_acc: float,
             damp_coef: float, store_dt=jnp.float32):
    wy = by + 8          # DMA window (8-aligned sublane count; Mosaic)
    ly = by + 2          # logical rows used (global j·by−1 .. j·by+by)
    od2 = omega * omega * dtau * dtau
    f32 = jnp.float32

    def kernel(rhos_hbm, rts_hbm, rw_hbm, rhop_hbm, rtp_hbm, grw_hbm,
               cl_hbm, th_hbm, thzf_hbm, ru_hbm, rv_hbm, invdzc_hbm,
               invdzf_hbm,
               ru_o, rv_o, rw_o, rho_o, rt_o,
               rhos_w, rts_w, rw_w, rhop_w, rtp_w, grw_w, cl_w, th_w,
               thzf_w, ru_w, rv_w, invdzc_w, invdzf_w, cp_s, dp_s,
               aco_s, bco_s, cco_s, rhs_s, sems):
        j = pl.program_id(0)

        srcs = (rhos_hbm, rts_hbm, rw_hbm, rhop_hbm, rtp_hbm, grw_hbm,
                cl_hbm, th_hbm, thzf_hbm, ru_hbm, rv_hbm)
        dsts = (rhos_w, rts_w, rw_w, rhop_w, rtp_w, grw_w, cl_w, th_w,
                thzf_w, ru_w, rv_w)
        for n, (src, dst) in enumerate(zip(srcs, dsts)):
            pltpu.make_async_copy(
                src.at[:, pl.ds(j * by, wy), :], dst, sems.at[n]).start()
        pltpu.make_async_copy(invdzc_hbm, invdzc_w, sems.at[11]).start()
        pltpu.make_async_copy(invdzf_hbm, invdzf_w, sems.at[12]).start()
        for n, (src, dst) in enumerate(zip(srcs, dsts)):
            pltpu.make_async_copy(
                src.at[:, pl.ds(j * by, wy), :], dst, sems.at[n]).wait()
        pltpu.make_async_copy(invdzc_hbm, invdzc_w, sems.at[11]).wait()
        pltpu.make_async_copy(invdzf_hbm, invdzf_w, sems.at[12]).wait()

        def xs(a, o):
            return pltpu.roll(a, (-o) % nx, 2) if o % nx else a

        # z-shift helpers; ζ-INVARIANT factors (z-extent 1, e.g. the
        # LinearDecay Jacobians) pass through below() unchanged — their
        # shifted value IS the value
        below = lambda a: (a if a.shape[0] == 1
                           else jnp.concatenate([a[:1], a[:-1]], axis=0))
        above0 = lambda a: jnp.concatenate(
            [a[1:], jnp.zeros_like(a[:1])], axis=0)

        lv = lambda r: r[:, :ly, :]   # logical rows; DMA slack unused
        cl = lv(cl_w)
        thf = lv(thzf_w)
        rhos = lv(rhos_w)
        rts = lv(rts_w)
        rw_p = lv(rw_w).astype(f32)
        rho_p = lv(rhop_w).astype(f32)
        rt_p = lv(rtp_w).astype(f32)
        grw = lv(grw_w)

        # ---- CN tridiagonal coefficients (stretched Δz via the spacing
        # columns; flat terrain) ------------------------------------------
        inv_dzc = invdzc_w[:]                       # 1/Δz_c[k], (nz, 1, nx)
        inv_dzc_b = jnp.concatenate([inv_dzc[:1], inv_dzc[:-1]], axis=0)
        inv_dzf = invdzf_w[:]                       # 1/Δz_f[k]
        C_b = below(cl)
        thf_a = jnp.concatenate([thf[1:], thf[-1:]], axis=0)
        a_co = (0.5 * g_acc * od2 * inv_dzc_b
                - od2 * inv_dzf * C_b * below(thf) * inv_dzc_b)
        b_co = (1.0 - 0.5 * g_acc * od2 * (inv_dzc_b - inv_dzc)
                + od2 * inv_dzf * thf * (cl * inv_dzc + C_b * inv_dzc_b))
        c_co = (-0.5 * g_acc * od2 * inv_dzc
                - od2 * inv_dzf * cl * thf_a * inv_dzc)

        # ---- RHS --------------------------------------------------------
        rho_star_zf = 0.5 * (rhos + below(rhos))
        rho_tau_zf = 0.5 * (rho_p + below(rho_p))
        Crt_tau = cl * rt_p
        Crt_star = cl * rts
        dz_Crt_tau = (Crt_tau - below(Crt_tau)) * inv_dzf
        dz_Crt_star = (Crt_star - below(Crt_star)) * inv_dzf
        d = (rw_p + dtau * grw
             - g_acc * dtau * ((1.0 - omega) * rho_tau_zf
                               + omega * rho_star_zf)
             - dtau * ((1.0 - omega) * dz_Crt_tau + omega * dz_Crt_star))

        # ---- Thomas solve along z (Dirichlet bottom row folded in) ------
        # Coefficients/RHS are staged through VMEM scratch: Mosaic cannot
        # lower lax.dynamic_slice on register VALUES (a_co[k] with a traced
        # loop k), but dynamic-k Ref loads are fine.
        aco_s[:] = a_co
        bco_s[:] = b_co
        cco_s[:] = c_co
        rhs_s[:] = d
        # row 0: a=c=0, b=1, d=0  →  cp[0]=0, dp[0]=0
        cp_s[0] = jnp.zeros((ly, nx), jnp.float32)
        dp_s[0] = jnp.zeros((ly, nx), jnp.float32)

        def fwd(k, _):
            a_k = aco_s[k]
            denom = bco_s[k] - a_k * cp_s[k - 1]
            cp_s[k] = cco_s[k] / denom
            dp_s[k] = (rhs_s[k] - a_k * dp_s[k - 1]) / denom
            return 0

        jax.lax.fori_loop(1, nz, fwd, 0, unroll=False)

        def bwd(m, _):
            k = nz - 2 - m
            dp_s[k] = dp_s[k] - cp_s[k] * dp_s[k + 1]
            return 0

        jax.lax.fori_loop(0, nz - 1, bwd, 0, unroll=False)
        rw_new = dp_s[:]

        # ---- recovery ----------------------------------------------------
        rho_new = rhos - omega * dtau * (above0(rw_new) - rw_new) * inv_dzc
        thw = thf * rw_new
        rt_new = rts - omega * dtau * (above0(thw) - thw) * inv_dzc

        # ---- thermal divergence damping (block-local halo) ---------------
        ru_new = lv(ru_w)
        rv_out = rv_w[:, 1:1 + by, :]
        if damp_coef:
            D = (rt_new - rt_p) / lv(th_w)
            fac_x = damp_coef * dx / dtau
            fac_y = damp_coef * dy / dtau
            ru_new = ru_new - fac_x * (D - xs(D, -1))
            # y-face m (output row m ↔ window face j·by+m): D rows m, m+1
            rv_out = rv_out - fac_y * (D[:, 1:1 + by, :] - D[:, :by, :])

        ru_o[:] = ru_new[:, 1:1 + by, :].astype(store_dt)
        rv_o[:] = rv_out.astype(store_dt)
        rw_o[:] = rw_new[:, 1:1 + by, :].astype(store_dt)
        rho_o[:] = rho_new[:, 1:1 + by, :].astype(store_dt)
        rt_o[:] = rt_new[:, 1:1 + by, :].astype(store_dt)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "by", "nz", "ny", "nx", "dx", "dy", "dtau", "omega", "g_acc",
    "damp_coef", "store", "interpret"))
def _run_k2(rhos, rts, rw_p, rho_p, rt_p, grw, cl, th, thzf, ru_new, rv_new,
            inv_dzc_col, inv_dzf_col,
            by, nz, ny, nx, dx, dy, dtau, omega, g_acc, damp_coef,
            store="float32", interpret=False):
    def pady(a):
        # 1 periodic row below + 7 above (1 used + 6 slack: the DMA window
        # sublane count by+8 must be 8-aligned on Mosaic)
        return jnp.concatenate([a[:, -1:, :], a, a[:, :7, :]], axis=1)

    args = [pady(x) for x in (rhos, rts, rw_p, rho_p, rt_p, grw, cl, th,
                              thzf, ru_new, rv_new)]
    args += [inv_dzc_col, inv_dzf_col]
    store_dt = jnp.dtype(store)
    kernel = _make_k2(by, nz, nx, dx, dy, dtau, omega, g_acc, damp_coef,
                      store_dt=store_dt)
    wy, ly = by + 8, by + 2
    grid = (ny // by,)
    win = lambda dt=jnp.float32: pltpu.VMEM((nz, wy, nx), dt)
    lwin = lambda: pltpu.VMEM((nz, ly, nx), jnp.float32)
    out = jax.ShapeDtypeStruct((nz, ny, nx), store_dt)
    outspec = pl.BlockSpec((nz, by, nx), lambda j: (0, j, 0),
                           memory_space=pltpu.VMEM)
    # carried inputs (rw', rho', rt') arrive in the storage dtype
    wins = ([win(), win(), win(store_dt), win(store_dt), win(store_dt)]
            + [win() for _ in range(6)])
    col = lambda: pltpu.VMEM((nz, 1, nx), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 13,
        out_specs=[outspec] * 5,
        out_shape=[out] * 5,
        scratch_shapes=wins + [col(), col()]
        + [lwin(), lwin(), lwin(), lwin(), lwin(), lwin(),
           pltpu.SemaphoreType.DMA((13,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# K3: MULTI-substep fused kernel (halo-deep pipelining)
# ---------------------------------------------------------------------------
#
# The K1/K2 pair re-reads every carry + linearization + slow-tendency field
# from HBM each substep (~59 field transits/substep) — measured a wash vs
# the jnp loop on v5e because BOTH are HBM-bound.  K3 keeps everything
# resident in VMEM for ``n_inner`` consecutive substeps: the y window
# carries ``n_inner`` halo rows per side (stencil radius 1/substep — the
# classic halo-deep scheme: validity creeps inward one row per substep),
# all substeps run on the full window, and only the central ``by`` rows
# are written back.  HBM traffic: (13 reads · wy/by + 8 writes)/n_inner
# ≈ 8-9 transits/substep at by=8, n_inner=4 — ~7× less than K1+K2.

def _ceil8(n):
    return ((n + 7) // 8) * 8


def _make_k3(by: int, nz: int, nx: int, n_inner: int, dx: float, dy: float,
             dtau: float, omega: float, g_acc: float, damp_coef: float,
             store_dt=jnp.float32, has_sponge: bool = False,
             n_yblocks: int = 0, prefetch: bool = False,
             damp_mode: str = "thermal", has_crho: bool = False,
             has_terrain: bool = False):
    # y halo accounting: centers lose 1 row/side per substep; rv (y-face)
    # loses ONE EXTRA bottom row per substep when divergence damping is on
    # (thermal: the correction reads D[m−1], and D inherits the centers'
    # validity; direct: δ[m−1] needs ru/rv one row further down — the same
    # +1 bottom, and its ys_p top need is absorbed by the standard top
    # creep, ly = by+2k+1 in both modes) — asymmetric halo, or face 0 of
    # every block goes stale (caught as a block-period error pattern on
    # device).  ``has_crho``: ρe-formulation p′ = C_L(ρe)′ + C_ρρ′
    # coupling — one extra field window + unit-face-weight tridiag terms.
    # ``has_terrain``: σ-coordinate fast system — 8 metric windows
    # (1/J_c, 1/J_f, J_xf, J_yf, sx_c_zf, sy_c_zf, sx_cf, sy_cf), the
    # slope-corrected PGF, Jacobian-weighted divergences, the contravariant
    # ρw̃′ = ρw′ − S′ split with the kinematic-bottom Dirichlet row, and
    # invJ factors through the CN column solve — mirroring the jnp loop's
    # terrain branches term-by-term (dynamics/compressible.py); no extra
    # halo rows (the S′ stencils creep exactly like the center updates).
    h = n_inner + (1 if damp_coef else 0)   # bottom halo rows
    ht = n_inner                            # top halo rows
    ly = by + h + ht               # logical rows (center j·by−h .. +by+ht−1)
    wy = _ceil8(ly)                # DMA window rows (Mosaic sublane alignment)
    od2 = omega * omega * dtau * dtau
    f32 = jnp.float32

    def kernel(*refs):
        # signature (crho/sponge only when enabled):
        #   13 field inputs, [crho], invdzc, invdzf, [sponge],
        #   pgf_ref (SMEM), 8 outputs, 13 windows, [crho_w], invdzc_w,
        #   invdzf_w, [sponge_w], cp, dp, aco, bco, cco, rhs scratch, sems
        n_terr = 8 if has_terrain else 0
        nf = 13 + (1 if has_crho else 0) + n_terr
        n_in = nf + 3 + (1 if has_sponge else 0)
        (ru_hbm, rv_hbm, rw_hbm, rho_hbm, rt_hbm,
         cl_hbm, th_hbm, thzf_hbm,
         gru_hbm, grv_hbm, grw_hbm, grho_hbm, grt_hbm) = refs[:13]
        k = 13
        crho_hbm = refs[k] if has_crho else None
        if has_crho:
            k += 1
        terr_hbm = refs[k:k + n_terr]
        k += n_terr
        invdzc_hbm, invdzf_hbm = refs[k], refs[k + 1]
        k += 2
        sponge_hbm = refs[k] if has_sponge else None
        pgf_ref = refs[n_in - 1]
        (ru_o, rv_o, rw_o, rho_o, rt_o, sru_o, srv_o, srw_o) = \
            refs[n_in:n_in + 8]
        (ru_w, rv_w, rw_w, rho_w, rt_w, cl_w, th_w, thzf_w,
         gru_w, grv_w, grw_w, grho_w, grt_w) = refs[n_in + 8:n_in + 21]
        k = n_in + 21
        crho_w = refs[k] if has_crho else None
        if has_crho:
            k += 1
        terr_w = refs[k:k + n_terr]
        k += n_terr
        invdzc_w, invdzf_w = refs[k], refs[k + 1]
        k += 2
        sponge_w = refs[k] if has_sponge else None
        if has_sponge:
            k += 1
        (cp_s, dp_s, aco_s, bco_s, cco_s, rhs_s, sems) = refs[k:k + 7]

        j = pl.program_id(0)

        srcs = (ru_hbm, rv_hbm, rw_hbm, rho_hbm, rt_hbm, cl_hbm, th_hbm,
                thzf_hbm, gru_hbm, grv_hbm, grw_hbm, grho_hbm, grt_hbm) \
            + ((crho_hbm,) if has_crho else ()) + tuple(terr_hbm)
        dsts = (ru_w, rv_w, rw_w, rho_w, rt_w, cl_w, th_w, thzf_w,
                gru_w, grv_w, grw_w, grho_w, grt_w) \
            + ((crho_w,) if has_crho else ()) + tuple(terr_w)

        if prefetch:
            # Cross-block window prefetch (same double-buffer scheme as
            # advection.prefetch_windows, 1-D y grid): each instance starts
            # the NEXT y-block's 13 window DMAs into the alternate slot
            # before computing — hides the ~3× halo-amplified window reads
            # (13 fields × wy/by) behind the substep compute.  Only used
            # when the doubled windows fit VMEM (see _run_k3).
            slot = jax.lax.rem(j, jnp.int32(2))

            def start_all(jy, sl):
                for n, (src, dst) in enumerate(zip(srcs, dsts)):
                    pltpu.make_async_copy(
                        src.at[:, pl.ds(jy * by, wy), :], dst.at[sl],
                        sems.at[sl, n]).start()

            @pl.when(j == 0)
            def _():
                start_all(0, 0)

            @pl.when(j + 1 < n_yblocks)
            def _():
                start_all(j + 1, 1 - slot)
        else:
            slot = 0
            for n, (src, dst) in enumerate(zip(srcs, dsts)):
                pltpu.make_async_copy(
                    src.at[:, pl.ds(j * by, wy), :], dst.at[0],
                    sems.at[0, n]).start()
        pltpu.make_async_copy(invdzc_hbm, invdzc_w, sems.at[0, nf]).start()
        pltpu.make_async_copy(invdzf_hbm, invdzf_w,
                              sems.at[0, nf + 1]).start()
        if has_sponge:
            pltpu.make_async_copy(sponge_hbm, sponge_w,
                                  sems.at[0, nf + 2]).start()
        for n, (src, dst) in enumerate(zip(srcs, dsts)):
            pltpu.make_async_copy(
                src.at[:, pl.ds(j * by, wy), :], dst.at[slot],
                sems.at[slot, n]).wait()
        pltpu.make_async_copy(invdzc_hbm, invdzc_w, sems.at[0, nf]).wait()
        pltpu.make_async_copy(invdzf_hbm, invdzf_w,
                              sems.at[0, nf + 1]).wait()
        if has_sponge:
            pltpu.make_async_copy(sponge_hbm, sponge_w,
                                  sems.at[0, nf + 2]).wait()

        def xs(a, o):
            return pltpu.roll(a, (-o) % nx, 2) if o % nx else a

        def ys_m(a):                    # row m−1 (edge-duplicated: the
            return jnp.concatenate([a[:, :1, :], a[:, :-1, :]], axis=1)

        def ys_p(a):                    # row m+1   garbage stays in the
            return jnp.concatenate([a[:, 1:, :], a[:, -1:, :]], axis=1)
        #                               creeping halo rows by construction)

        # z-shift helpers; ζ-INVARIANT factors (z-extent 1, e.g. the
        # LinearDecay Jacobians) pass through below() unchanged — their
        # shifted value IS the value
        below = lambda a: (a if a.shape[0] == 1
                           else jnp.concatenate([a[:1], a[:-1]], axis=0))
        above0 = lambda a: jnp.concatenate(
            [a[1:], jnp.zeros_like(a[:1])], axis=0)

        above_dup = lambda a: jnp.concatenate([a[1:], a[-1:]], axis=0)

        lv = lambda r: r[slot][:, :ly, :]
        cl = lv(cl_w)
        th = lv(th_w)
        thf = lv(thzf_w)
        crho = lv(crho_w) if has_crho else None
        if has_terrain:
            (ij_c, ij_f, jxf, jyf, sxz, syz, sxc, syc) = [
                lv(w) for w in terr_w]
        gru = lv(gru_w)
        grv = lv(grv_w)
        grw = lv(grw_w)
        grho = lv(grho_w)
        grt = lv(grt_w)
        inv_dzc = invdzc_w[:]
        inv_dzf = invdzf_w[:]
        inv_dx = 1.0 / dx
        inv_dy = 1.0 / dy

        # ---- CN tridiagonal coefficients (substep-invariant) -------------
        inv_dzc_b = jnp.concatenate([inv_dzc[:1], inv_dzc[:-1]], axis=0)
        C_b = below(cl)
        thf_a = jnp.concatenate([thf[1:], thf[-1:]], axis=0)
        if has_terrain:
            # invJ factors through gravity (ρ-update center rows) and the
            # C·θ flux couplings (face 1/J × center 1/J) — jnp loop
            # coefficient build, term-by-term
            ijc_b = below(ij_c)
            a_co = (0.5 * g_acc * od2 * inv_dzc_b * ijc_b
                    - od2 * inv_dzf * C_b * below(thf) * inv_dzc_b
                    * ij_f * ijc_b)
            b_co = (1.0
                    - 0.5 * g_acc * od2 * (inv_dzc_b * ijc_b
                                           - inv_dzc * ij_c)
                    + od2 * inv_dzf * thf * (cl * inv_dzc * ij_c
                                             + C_b * inv_dzc_b * ijc_b)
                    * ij_f)
            c_co = (-0.5 * g_acc * od2 * inv_dzc * ij_c
                    - od2 * inv_dzf * cl * thf_a * inv_dzc * ij_f * ij_c)
        else:
            a_co = (0.5 * g_acc * od2 * inv_dzc_b
                    - od2 * inv_dzf * C_b * below(thf) * inv_dzc_b)
            b_co = (1.0 - 0.5 * g_acc * od2 * (inv_dzc_b - inv_dzc)
                    + od2 * inv_dzf * thf * (cl * inv_dzc + C_b * inv_dzc_b))
            c_co = (-0.5 * g_acc * od2 * inv_dzc
                    - od2 * inv_dzf * cl * thf_a * inv_dzc)
        if has_crho:
            # ρe formulation: p′ = C_L(ρe)′ + C_ρ ρ′ adds the same flux
            # structure with UNIT face weight (the ρ predictor's flux is
            # (ρw)′ itself) — C→C_ρ, χᶠ→1 term-by-term (jnp loop
            # compressible.py C_rho block)
            crho_b = below(crho)
            a_co = a_co - od2 * inv_dzf * crho_b * inv_dzc_b
            b_co = b_co + od2 * inv_dzf * (crho * inv_dzc
                                           + crho_b * inv_dzc_b)
            c_co = c_co - od2 * inv_dzf * crho * inv_dzc
        if has_sponge:
            # Implicit Rayleigh upper sponge: CN-weighted — the ωΔτ·r·ramp
            # part joins the diagonal, the (1−ω)Δτ part hits the RHS below
            # (jnp loop lines `b_coef += omega*|dtau|*sponge_col`).
            sponge = sponge_w[:]                    # (nz, 1, nx) z-face col
            b_co = b_co + (omega * dtau) * sponge
        aco_s[:] = a_co
        bco_s[:] = b_co
        cco_s[:] = c_co

        th_xf = 0.5 * (th + xs(th, -1))
        th_yf = 0.5 * (th + ys_m(th))

        ru_p = lv(ru_w).astype(f32)
        rv_p = lv(rv_w).astype(f32)
        rw_p = lv(rw_w).astype(f32)
        rho_p = lv(rho_w).astype(f32)
        rt_p = lv(rt_w).astype(f32)
        sum_ru = jnp.zeros_like(ru_p)
        sum_rv = jnp.zeros_like(ru_p)
        sum_rw = jnp.zeros_like(ru_p)

        for t in range(n_inner):           # static unroll: k ≤ 4
            pgf = pgf_ref[t]

            # ---- A: horizontal momenta -------------------------------
            pp = cl * rt_p
            if has_crho:
                pp = pp + crho * rho_p
            dpdx = (pp - xs(pp, -1)) * inv_dx
            dpdy = (pp - ys_m(pp)) * inv_dy
            if has_terrain:
                # slope-corrected perturbation PGF:
                # (∂x p′)_z = ∂x p′|_ζ − sx·(1/J)∂ζ p′
                dpz_f = (pp - below(pp)) * inv_dzf * ij_f
                dpz_c = 0.5 * (dpz_f + above_dup(dpz_f))
                dpdx = dpdx - sxc * 0.5 * (dpz_c + xs(dpz_c, -1))
                dpdy = dpdy - syc * 0.5 * (dpz_c + ys_m(dpz_c))
            ru_new = ru_p + dtau * (gru - pgf * dpdx)
            rv_new = rv_p + dtau * (grv - pgf * dpdy)

            # ---- B: predictors ---------------------------------------
            if has_terrain:
                jru = jxf * ru_new
                jrv = jyf * rv_new
                div_h = ((xs(jru, 1) - jru) * inv_dx
                         + (ys_p(jrv) - jrv) * inv_dy) * ij_c
                fx = th_xf * jru
                fy = th_yf * jrv
                div_ht = ((xs(fx, 1) - fx) * inv_dx
                          + (ys_p(fy) - fy) * inv_dy) * ij_c

                # contravariant split ρw̃′ = ρw′ − S′: S from 4-point
                # x/z- and y/z-averaged momenta times the z-face slopes
                def slope_part(ru_, rv_):
                    rub = below(ru_)
                    rvb = below(rv_)
                    ru_czf = 0.25 * (ru_ + xs(ru_, 1) + rub + xs(rub, 1))
                    rv_czf = 0.25 * (rv_ + ys_p(rv_) + rvb + ys_p(rvb))
                    return sxz * ru_czf + syz * rv_czf

                S_old = slope_part(ru_p, rv_p)
                S_new = slope_part(ru_new, rv_new)
                rwt_old = rw_p - S_old
                dz_w = (above0(rwt_old) - rwt_old) * inv_dzc
                dz_S = (above0(S_new) - S_new) * inv_dzc
                rho_star = (rho_p + dtau * (grho - div_h)
                            - dtau * ij_c * ((1.0 - omega) * dz_w
                                             - omega * dz_S))
                thw_p = thf * rwt_old
                thS = thf * S_new
                rt_star = (rt_p + dtau * (grt - div_ht)
                           - dtau * ij_c * (
                               (1.0 - omega) * (above0(thw_p) - thw_p)
                               * inv_dzc
                               - omega * (above0(thS) - thS) * inv_dzc))
            else:
                S_new = None
                div_h = ((xs(ru_new, 1) - ru_new) * inv_dx
                         + (ys_p(rv_new) - rv_new) * inv_dy)
                fx = th_xf * ru_new
                fy = th_yf * rv_new
                div_ht = ((xs(fx, 1) - fx) * inv_dx
                          + (ys_p(fy) - fy) * inv_dy)
                dzdiv = (above0(rw_p) - rw_p) * inv_dzc
                thw_p = thf * rw_p
                dzdiv_t = (above0(thw_p) - thw_p) * inv_dzc
                rho_star = (rho_p + dtau * (grho - div_h)
                            - dtau * (1.0 - omega) * dzdiv)
                rt_star = (rt_p + dtau * (grt - div_ht)
                           - dtau * (1.0 - omega) * dzdiv_t)

            # ---- C: CN column solve ----------------------------------
            rho_star_zf = 0.5 * (rho_star + below(rho_star))
            rho_tau_zf = 0.5 * (rho_p + below(rho_p))
            Crt_tau = cl * rt_p
            Crt_star = cl * rt_star
            if has_crho:
                Crt_tau = Crt_tau + crho * rho_p
                Crt_star = Crt_star + crho * rho_star
            dz_Crt_tau = (Crt_tau - below(Crt_tau)) * inv_dzf
            dz_Crt_star = (Crt_star - below(Crt_star)) * inv_dzf
            dzC = ((1.0 - omega) * dz_Crt_tau + omega * dz_Crt_star)
            if has_terrain:
                dzC = dzC * ij_f
            d = (rw_p + dtau * grw
                 - g_acc * dtau * ((1.0 - omega) * rho_tau_zf
                                   + omega * rho_star_zf)
                 - dtau * dzC)
            if has_sponge:
                # explicit CN half on the carried (ρw)′; the KDH08
                # full-field term is folded into grw by the driver
                d = d - ((1.0 - omega) * dtau) * sponge * rw_p
            rhs_s[:] = d
            cp_s[0] = jnp.zeros((ly, nx), f32)
            if has_terrain:
                # kinematic bottom: ρw̃′(0) = 0 ⇒ (ρw)′(0) = S′_new(0)
                # (Dirichlet row a=c=0, b=1)
                dp_s[0] = S_new[0]
            else:
                dp_s[0] = jnp.zeros((ly, nx), f32)

            def fwd(k, _):
                a_k = aco_s[k]
                denom = bco_s[k] - a_k * cp_s[k - 1]
                cp_s[k] = cco_s[k] / denom
                dp_s[k] = (rhs_s[k] - a_k * dp_s[k - 1]) / denom
                return 0

            jax.lax.fori_loop(1, nz, fwd, 0, unroll=False)

            def bwd(m, _):
                k = nz - 2 - m
                dp_s[k] = dp_s[k] - cp_s[k] * dp_s[k + 1]
                return 0

            jax.lax.fori_loop(0, nz - 1, bwd, 0, unroll=False)
            rw_new = dp_s[:]

            # ---- D: recovery -----------------------------------------
            ijr = ij_c if has_terrain else 1.0
            rho_new = rho_star - omega * dtau * ijr * (above0(rw_new)
                                                       - rw_new) * inv_dzc
            thw = thf * rw_new
            rt_new = (rt_star
                      - omega * dtau * ijr * (above0(thw) - thw) * inv_dzc)

            # ---- E: divergence damping (strategy dispatch) -----------
            if damp_coef and damp_mode == "thermal":
                D = (rt_new - rt_p) / th
                ru_new = ru_new - damp_coef * dx / dtau * (D - xs(D, -1))
                rv_new = rv_new - damp_coef * dy / dtau * (D - ys_m(D))
            elif damp_coef and damp_mode == "direct":
                # KSH18 eq. 36: δ from the UPDATED perturbation momenta —
                # no 1/Δτ (jnp loop DirectDivergenceDamping branch)
                fx2 = th_xf * ru_new
                fy2 = th_yf * rv_new
                delta = ((xs(fx2, 1) - fx2) * inv_dx
                         + (ys_p(fy2) - fy2) * inv_dy)
                ru_new = ru_new + damp_coef * dx * (delta - xs(delta, -1)) / th_xf
                rv_new = rv_new + damp_coef * dy * (delta - ys_m(delta)) / th_yf

            # bf16 carry semantics: round-trip through the storage dtype
            # between substeps, exactly as the jnp loop does
            if store_dt != f32:
                ru_new = ru_new.astype(store_dt).astype(f32)
                rv_new = rv_new.astype(store_dt).astype(f32)
                rw_new = rw_new.astype(store_dt).astype(f32)
                rho_new = rho_new.astype(store_dt).astype(f32)
                rt_new = rt_new.astype(store_dt).astype(f32)
            ru_p, rv_p, rw_p, rho_p, rt_p = (ru_new, rv_new, rw_new,
                                             rho_new, rt_new)
            sum_ru = sum_ru + ru_p
            sum_rv = sum_rv + rv_p
            sum_rw = sum_rw + rw_p

        ci = lambda a: a[:, h:h + by, :]
        ru_o[:] = ci(ru_p).astype(store_dt)
        rv_o[:] = ci(rv_p).astype(store_dt)
        rw_o[:] = ci(rw_p).astype(store_dt)
        rho_o[:] = ci(rho_p).astype(store_dt)
        rt_o[:] = ci(rt_p).astype(store_dt)
        sru_o[:] = ci(sum_ru)
        srv_o[:] = ci(sum_rv)
        srw_o[:] = ci(sum_rw)

    return kernel, ly, wy


@functools.partial(jax.jit, static_argnames=(
    "by", "nz", "ny", "nx", "n_inner", "dx", "dy", "dtau", "omega",
    "g_acc", "damp_coef", "store", "interpret", "damp_mode"))
def _run_k3(ru, rv, rw, rho, rt, cl, th, thzf, gru, grv, grw, grho, grt,
            inv_dzc_col, inv_dzf_col, pgf_flags,
            by, nz, ny, nx, n_inner, dx, dy, dtau, omega, g_acc, damp_coef,
            store="float32", interpret=False, sponge_col=None,
            damp_mode="thermal", crho=None, terrain_fields=None):
    import os as _os

    store_dt = jnp.dtype(store)
    has_sponge = sponge_col is not None
    has_crho = crho is not None
    has_terrain = terrain_fields is not None
    n_terr = 8 if has_terrain else 0
    h = n_inner + (1 if damp_coef else 0)
    ly_ = by + h + n_inner
    wy_ = _ceil8(ly_)
    # Cross-block window prefetch: double-buffer the 13 input windows when
    # the doubled footprint (+ tridiag scratch + pipelined output blocks)
    # fits comfortably in v5e's 128 MB VMEM; opt out via
    # BREEZE_TPU_K3_PREFETCH=0.
    win_b = nz * wy_ * nx
    win_single = win_b * (5 * store_dt.itemsize
                          + (8 + (1 if has_crho else 0) + n_terr) * 4)
    est = (2 * win_single                        # doubled windows
           # register-allocator spill-slot proxy: measured 66 MB at
           # n_inner=4/by=8/256²×128 ≈ 2× the single-buffer windows; the
           # spills scale with the unroll depth's live values
           + (n_inner * win_single) // 2
           + 6 * nz * ly_ * nx * 4               # tridiag scratch
           + 2 * nz * by * nx * (5 * store_dt.itemsize + 3 * 4))  # outputs
    pf_env = _os.environ.get("BREEZE_TPU_K3_PREFETCH", "")
    # Auto-enable ONLY for the hardware-verified family: k<=2 remainder
    # chunks (the v5e sweep showed k>=3 full-depth chunks either Mosaic-OOM
    # from register spills well above the est proxy, or measure as a wash —
    # docs/kernels.md).  BREEZE_TPU_K3_PREFETCH=1 still forces it for
    # sweeps.  Both knobs are read at TRACE time: toggling them mid-process
    # silently reuses the cached program.
    # ... and only for the hardware-verified family: 13-window thermal/
    # no-damp configs (the 14-window ρe + direct-damping config measured
    # 129.6/128 MB VMEM with k=2 prefetch — the spill proxy undercounts
    # its extra live values)
    prefetch = (pf_env == "1"
                or (pf_env != "0" and n_inner <= 2
                    and crho is None and not has_terrain
                    and damp_mode == "thermal"
                    and est < 120 * 1024 * 1024))
    kernel, ly, wy = _make_k3(by, nz, nx, n_inner, dx, dy, dtau, omega,
                              g_acc, damp_coef, store_dt=store_dt,
                              has_sponge=has_sponge,
                              n_yblocks=ny // by, prefetch=prefetch,
                              damp_mode=damp_mode, has_crho=has_crho,
                              has_terrain=has_terrain)
    above = wy - by - h            # top halo used + alignment slack

    def pady(a):
        # Periodic y pad: h rows below, `above` rows on top.  `above` can
        # exceed ny at small ny (wy is ceil-8 of by+h+ht, e.g. ny=8 with
        # the k=4 window needs 11 wrap rows) — tile full periods as needed
        # (a plain 3-piece concat under-pads there → OOB window DMA).
        parts = [a[:, ny - h:, :], a]
        rem = above
        while rem >= ny:
            parts.append(a)
            rem -= ny
        if rem:
            parts.append(a[:, :rem, :])
        return jnp.concatenate(parts, axis=1)

    args = [pady(x) for x in (ru, rv, rw, rho, rt, cl, th, thzf,
                              gru, grv, grw, grho, grt)]
    if has_crho:
        args.append(pady(crho))
    if has_terrain:
        args += [pady(t) for t in terrain_fields]
    args += [inv_dzc_col, inv_dzf_col]
    if has_sponge:
        args.append(sponge_col)
    grid = (ny // by,)
    nslots = 2 if prefetch else 1
    win = lambda dt=jnp.float32: pltpu.VMEM((nslots, nz, wy, nx), dt)
    lwin = lambda: pltpu.VMEM((nz, ly, nx), jnp.float32)
    out_c = jax.ShapeDtypeStruct((nz, ny, nx), store_dt)
    out_f = jax.ShapeDtypeStruct((nz, ny, nx), jnp.float32)
    outspec = pl.BlockSpec((nz, by, nx), lambda j: (0, j, 0),
                           memory_space=pltpu.VMEM)
    wins = ([win(store_dt) for _ in range(5)]
            + [win() for _ in range(8 + (1 if has_crho else 0))]
            + [pltpu.VMEM((nslots, t.shape[0], wy, nx), jnp.float32)
               for t in (terrain_fields or ())])
    col = lambda: pltpu.VMEM((nz, 1, nx), jnp.float32)
    n_sem = (13 + (1 if has_crho else 0) + n_terr + 2
             + (1 if has_sponge else 0))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(args)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[outspec] * 8,
        out_shape=[out_c] * 5 + [out_f] * 3,
        scratch_shapes=wins + [col(), col()]
        + ([col()] if has_sponge else [])
        + [lwin() for _ in range(6)]
        + [pltpu.SemaphoreType.DMA((nslots, n_sem))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(*args, jnp.asarray(pgf_flags, jnp.float32))


# ---------------------------------------------------------------------------
# Driver: full substep loop
# ---------------------------------------------------------------------------

def _pick(n, candidates):
    for c in candidates:
        if n % c == 0:
            return c
    return None


def supported(model) -> bool:
    """True when the fused substep kernels cover this configuration."""
    import os as _os

    from ..dynamics.compressible import (NoDivergenceDamping,
                                         ThermalDivergenceDamping)
    from ..grid import Topology

    from ..dynamics.compressible import DirectDivergenceDamping
    g = model.grid
    td = model.time_discretization
    strategy = td.damping_strategy()
    # UpperSponge (incl. the default damp_full KDH08 form), the ρe
    # (static-energy) formulation and DirectDivergenceDamping are all in
    # the K3 envelope (r5; diagonal + CN-explicit sponge terms, C_ρ
    # coupling window, δ-from-momenta damping — each in-kernel).  The
    # per-substep K1/K2 split path never grew that plumbing — it exists
    # for A/B measurement only — so those configs fall back to jnp there.
    split = bool(_os.environ.get("BREEZE_TPU_PALLAS_ACOUSTIC_SPLIT"))
    sponge_ok = td.sponge is None or not split
    form_ok = (model.formulation == "potential_temperature" or not split)
    damp_ok = (isinstance(strategy,
                          (NoDivergenceDamping, ThermalDivergenceDamping))
               or (isinstance(strategy, DirectDivergenceDamping)
                   and not split))
    # terrain (σ-coordinates): in the K3 envelope since r5 (8 metric
    # windows + slope PGF + contravariant split in-kernel); the K1/K2
    # split path never grew the plumbing.  LinearDecay's ζ-invariant
    # Jacobians ride z-extent-1 windows (k=2); SLEVE's ζ-DEPENDENT
    # Jacobians need full-z windows, which fit at k=1 (hardware-verified:
    # 25.0 vs jnp 41.1 ms per 6 substeps at 256²×128; k=2 full-z measured
    # 133.9/128 MB VMEM — the driver drops k_max accordingly).
    terr_ok = model.terrain is None or not split
    return (terr_ok
            and not g.is_latlon
            and g.x_topology == Topology.PERIODIC
            and g.y_topology == Topology.PERIODIC
            and g.z_topology == Topology.BOUNDED
            and g.dtype == jnp.float32
            and td.substep_floattype in (None, "bfloat16")
            and sponge_ok
            and form_ok
            and damp_ok
            and g.nx >= 128 and g.ny >= 8 and g.nz >= 8
            and _pick(g.nz, (16, 8, 4)) is not None
            and _pick(g.ny, (8,)) is not None)


def acoustic_substep_loop_pallas(model, caches, G, pert, dtau, n_tau: int,
                                 gate_first: bool, interpret: bool = False,
                                 rho_w_L=None):
    """Drop-in fused replacement for ``acoustic_substep_loop`` within the
    :func:`supported` envelope.  Same semantics: n_tau substeps of A-E with
    the substep-0 PGF gate, accumulating the time-summed momenta.

    Default: the MULTI-substep K3 kernel in chunks of up to 4 substeps
    (carries stay in VMEM across the chunk — the HBM-traffic amortization
    the per-substep K1/K2 pair cannot get).  ``BREEZE_TPU_PALLAS_ACOUSTIC_
    SPLIT=1`` restores the K1/K2-per-substep path.
    """
    import os as _os

    from ..dynamics.compressible import (DirectDivergenceDamping,
                                         Perturbations,
                                         ThermalDivergenceDamping)

    g = model.grid
    td = model.time_discretization
    omega = float(td.forward_weight)
    g_acc = float(model.constants.gravitational_acceleration)
    nz, ny, nx = g.shape
    strategy = td.damping_strategy()
    if isinstance(strategy, ThermalDivergenceDamping):
        damp, damp_mode = float(strategy.coefficient), "thermal"
    elif isinstance(strategy, DirectDivergenceDamping):
        damp, damp_mode = float(strategy.coefficient), "direct"
    else:
        damp, damp_mode = 0.0, "thermal"
    # ρe formulation: p′ = C_L(ρe)′ + C_ρρ′ — extra coupling window
    crho = None
    if getattr(caches, "C_rho", None) is not None:
        crho = jnp.broadcast_to(caches.C_rho,
                                (nz, ny, nx)).astype(jnp.float32)
    # terrain: the 8 metric factors, broadcast to full fields (SAME values
    # as the jnp loop via the shared helper)
    terrain_fields = None
    if model.terrain is not None:
        from ..dynamics.compressible import terrain_metric_fields

        def _norm(t):
            # keep the natural z-extent: LinearDecay Jacobians are
            # ζ-independent (leading dim 1) — their VMEM windows shrink
            # by nz× (the full-z broadcast Mosaic-OOMed at 133.9/128 MB)
            t = jnp.asarray(t, jnp.float32)
            if t.ndim == 2:
                t = t[None]
            zdim = t.shape[0]
            return jnp.broadcast_to(t, (zdim, ny, nx))

        terrain_fields = tuple(_norm(t)
                               for t in terrain_metric_fields(model.terrain))
    bz = _pick(nz, (16, 8, 4))
    by = _pick(ny, (8,))
    # block-sweep override (tools/ sweeps); must divide ny
    by_env = _os.environ.get("BREEZE_TPU_K3_BY")
    if by_env and ny % int(by_env) == 0:
        by = int(by_env)
    dtau = float(dtau)
    store = td.substep_floattype or "float32"
    store_dt = jnp.dtype(store)
    work_dt = g.dtype

    from .advection import bcast_col, force_interpret

    interpret = interpret or force_interpret()
    cl = caches.C_L.astype(jnp.float32)
    th = caches.theta_L.astype(jnp.float32)
    thzf = caches.theta_L_zf.astype(jnp.float32)
    # Static spacing metadata (g.dz_c/dz_f become tracers under an outer jit)
    inv_dzc = bcast_col(1.0 / jnp.asarray(g.dz_c_meta, jnp.float32), nx)
    inv_dzf = bcast_col(
        1.0 / jnp.asarray(g.dz_f_meta[:nz], jnp.float32), nx)

    # Upper Rayleigh sponge: the ramp column feeds the kernel (diagonal +
    # CN-explicit terms); the KDH08 full-field term |Δτ|·r·ramp·(ρw)ᴸ is a
    # substep-invariant RHS constant, so it folds into G.rho_w exactly
    # (d = … + Δτ·grw − spongeᶠᵘˡˡ ≡ Δτ·(grw − ramp·(ρw)ᴸ·r) for Δτ>0).
    sponge_col = None
    G_rho_w = G.rho_w
    sponge = getattr(td, "sponge", None)
    if sponge is not None:
        from ..dynamics.compressible import _ramp_profile
        z_face_col = jnp.asarray(g.z_f)[:nz, None, None].astype(jnp.float32)
        ramp = sponge.damping_rate * _ramp_profile(
            sponge.ramp, z_face_col, g.z0 + g.Lz, sponge.depth)
        sponge_col = jnp.broadcast_to(ramp, (nz, 1, nx))
        if getattr(sponge, "damp_full", False) and rho_w_L is not None:
            G_rho_w = G_rho_w - ramp * rho_w_L

    if not _os.environ.get("BREEZE_TPU_PALLAS_ACOUSTIC_SPLIT"):
        p = Perturbations(
            rho=pert.rho.astype(store_dt),
            rho_u=pert.rho_u.astype(store_dt),
            rho_v=pert.rho_v.astype(store_dt),
            rho_w=pert.rho_w.astype(store_dt),
            rho_theta=pert.rho_theta.astype(store_dt),
            sum_rho_u=pert.sum_rho_u, sum_rho_v=pert.sum_rho_v,
            sum_rho_w=pert.sum_rho_w)
        # Unroll depth: bf16 carries compile at k=4 on v5e; the f32
        # 4-substep program crashes the Mosaic compile at 256²x128
        # (program-size limit — k≤3 compiles and runs).  k=3 halves the
        # ceil-8 window slack (wy 16 vs 24 at by=8) and shrinks the
        # register-spill footprint enough for the cross-block window
        # prefetch to fit VMEM; override via BREEZE_TPU_K3_KMAX.
        k_max = 4 if store_dt == jnp.bfloat16 else 3
        if crho is not None and damp_mode == "direct":
            # ρe + DirectDivergenceDamping: the extra C_ρ window plus the
            # direct damping's extra live values exceed VMEM at k=3
            # (measured 129.6/128 MB on v5e) — one fewer substep per chunk
            # fits with room to spare
            k_max = min(k_max, 2)
        if terrain_fields is not None:
            # 21 windows + the S′/slope live values: k=2 fits VMEM for
            # ζ-invariant (z-extent-1) Jacobians; SLEVE's full-z metric
            # windows OOM at k=2 (133.9/128 MB) but fit at k=1 — both
            # hardware-verified (sweep via BREEZE_TPU_K3_KMAX)
            full_z = any(t.shape[0] > 1 for t in terrain_fields)
            k_max = min(k_max, 1 if full_z else 2)
        # Trace-time knob (cached programs ignore later changes); clamp to
        # [1, 4] — k<=0 would make the static while-loop below never
        # advance (trace-time hang), k>4 Mosaic-OOMs.
        k_env = _os.environ.get("BREEZE_TPU_K3_KMAX")
        if k_env:
            k_max = min(max(1, int(k_env)), 4)
        s = 0
        while s < n_tau:                       # static python loop
            k = min(k_max, n_tau - s)
            pgf_flags = tuple(
                0.0 if (s + t == 0 and gate_first) else 1.0
                for t in range(k))
            (ru2, rv2, rw2, rho2, rt2, sru, srv, srw) = _run_k3(
                p.rho_u, p.rho_v, p.rho_w, p.rho, p.rho_theta,
                cl, th, thzf, G.rho_u, G.rho_v, G_rho_w, G.rho,
                G.rho_theta, inv_dzc, inv_dzf, pgf_flags,
                by=by, nz=nz, ny=ny, nx=nx, n_inner=k,
                dx=float(g.dx), dy=float(g.dy), dtau=dtau, omega=omega,
                g_acc=g_acc, damp_coef=damp, store=store,
                interpret=interpret, sponge_col=sponge_col,
                damp_mode=damp_mode, crho=crho,
                terrain_fields=terrain_fields)
            p = Perturbations(
                rho=rho2, rho_u=ru2, rho_v=rv2, rho_w=rw2, rho_theta=rt2,
                sum_rho_u=p.sum_rho_u + sru.astype(work_dt),
                sum_rho_v=p.sum_rho_v + srv.astype(work_dt),
                sum_rho_w=p.sum_rho_w + srw.astype(work_dt))
            s += k
        return Perturbations(
            rho=p.rho.astype(work_dt), rho_u=p.rho_u.astype(work_dt),
            rho_v=p.rho_v.astype(work_dt), rho_w=p.rho_w.astype(work_dt),
            rho_theta=p.rho_theta.astype(work_dt),
            sum_rho_u=p.sum_rho_u, sum_rho_v=p.sum_rho_v,
            sum_rho_w=p.sum_rho_w)

    def body(i, p):
        pgf = jnp.where(jnp.logical_or(i > 0, not gate_first), 1.0, 0.0)
        ru_new, rv_new, rhos, rts = _run_k1(
            p.rho_u, p.rho_v, p.rho_w, p.rho, p.rho_theta,
            cl, th, thzf, G.rho_u, G.rho_v, G.rho, G.rho_theta,
            inv_dzc, pgf,
            bz=bz, by=by, nz=nz, ny=ny, nx=nx,
            inv_dx=float(1.0 / g.dx), inv_dy=float(1.0 / g.dy),
            dtau=dtau, omega=omega, store=store,
            interpret=interpret)
        ru2, rv2, rw_new, rho_new, rt_new = _run_k2(
            rhos, rts, p.rho_w, p.rho, p.rho_theta, G.rho_w, cl, th, thzf,
            ru_new, rv_new, inv_dzc, inv_dzf,
            by=by, nz=nz, ny=ny, nx=nx, dx=float(g.dx), dy=float(g.dy),
            dtau=dtau, omega=omega, g_acc=g_acc, damp_coef=damp,
            store=store, interpret=interpret)
        return Perturbations(
            rho=rho_new, rho_u=ru2, rho_v=rv2, rho_w=rw_new,
            rho_theta=rt_new,
            sum_rho_u=p.sum_rho_u + ru2.astype(work_dt),
            sum_rho_v=p.sum_rho_v + rv2.astype(work_dt),
            sum_rho_w=p.sum_rho_w + rw_new.astype(work_dt))

    if store_dt != work_dt:
        pert = Perturbations(
            rho=pert.rho.astype(store_dt),
            rho_u=pert.rho_u.astype(store_dt),
            rho_v=pert.rho_v.astype(store_dt),
            rho_w=pert.rho_w.astype(store_dt),
            rho_theta=pert.rho_theta.astype(store_dt),
            sum_rho_u=pert.sum_rho_u, sum_rho_v=pert.sum_rho_v,
            sum_rho_w=pert.sum_rho_w)
    out = jax.lax.fori_loop(0, n_tau, body, pert)
    if store_dt != work_dt:
        out = Perturbations(
            rho=out.rho.astype(work_dt), rho_u=out.rho_u.astype(work_dt),
            rho_v=out.rho_v.astype(work_dt), rho_w=out.rho_w.astype(work_dt),
            rho_theta=out.rho_theta.astype(work_dt),
            sum_rho_u=out.sum_rho_u, sum_rho_v=out.sum_rho_v,
            sum_rho_w=out.sum_rho_w)
    return out
