"""Clear-sky LW validation columns: AFGL-style standard atmospheres with
PUBLISHED line-by-line broadband targets.

The spectral band model (`breeze_tpu/physics/spectral_radiation.py`)
replaces the reference's RRTMGP correlated-k tables
(``ext/BreezeRRTMGPExt/clear_sky_radiative_transfer_model.jl:54-289``);
its band coefficients were tuned against broadband targets.  This module
provides the INDEPENDENT check the tuning can't see: three standard
atmospheres (tropical, mid-latitude summer, sub-arctic winter) built as
documented analytic approximations of the AFGL profiles, with outgoing-LW
and surface downwelling-LW targets from published line-by-line/RRTM
validation studies (Clough & Iacono 1995 JGR; Mlawer et al. 1997 JGR
table 3; Iacono et al. 2008 JGR — clear-sky broadband values quoted to
the nearest W/m² in those papers):

    atmosphere   OLR [W/m²]   surface DLR [W/m²]
    tropical        288.          392.
    mls             282.          345.
    saw             200.          163.

Tolerances are ±12 W/m² (≈4%): the budget is ±5 for the analytic-profile
approximation (vs the tabulated AFGL soundings) and ±7 for the band model
itself — a real RRTMGP-class scheme would hold ±2.  A failure beyond the
band means the band model drifted from external truth, not from its own
pins.

The column harness bypasses the dynamics: a grid + hydrostatic (p, ρ)
integrated from the prescribed T(z), and shim objects exposing exactly the
surfaces ``SpectralRadiation.lw_fluxes`` reads.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp
import numpy as np

# (name, OLR target, surface-DLR target)
LW_TARGETS = {
    "tropical": (288.0, 392.0),
    "mls": (282.0, 345.0),
    "saw": (200.0, 163.0),
}


def temperature_profile(name: str, z: np.ndarray) -> np.ndarray:
    """Piecewise-linear analytic approximations of the AFGL (1986)
    temperature soundings (anchor points read off the published tables)."""
    if name == "tropical":
        pts = [(0.0, 299.7), (17_000.0, 194.8), (25_000.0, 221.0),
               (50_000.0, 270.0)]
    elif name == "mls":
        pts = [(0.0, 294.2), (13_000.0, 215.7), (17_000.0, 215.7),
               (25_000.0, 222.0), (50_000.0, 276.0)]
    elif name == "saw":
        pts = [(0.0, 257.1), (1_000.0, 259.1), (9_000.0, 217.2),
               (25_000.0, 211.8), (50_000.0, 265.0)]
    else:
        raise ValueError(name)
    zs, Ts = zip(*pts)
    return np.interp(z, zs, Ts)


def vapor_profile(name: str, z: np.ndarray, rho: np.ndarray,
                  dz: float) -> np.ndarray:
    """Specific humidity with an exponential scale height, normalized to
    the AFGL column's precipitable water (TRO 41.1, MLS 29.3, SAW 4.2
    kg/m²), with a 3 ppmv stratospheric floor."""
    pw, hscale = {
        "tropical": (41.1, 2_200.0),
        "mls": (29.3, 2_300.0),
        "saw": (4.2, 1_800.0),
    }[name]
    shape = np.exp(-z / hscale)
    qv = shape / np.sum(rho * shape * dz) * pw
    return np.maximum(qv, 3e-6 * 0.622)


def hydrostatic_column(T: np.ndarray, z: np.ndarray, dz: float,
                       p0: float = 101_325.0, Rd: float = 287.04,
                       g: float = 9.81):
    """Discrete hydrostatic (p, ρ) on the T(z) column (layer midpoints)."""
    nz = len(z)
    p = np.zeros(nz)
    # integrate ln p with layer-mean scale heights
    lnp = np.log(p0) - g * (z[0]) / (Rd * T[0])
    p[0] = np.exp(lnp)
    for k in range(1, nz):
        Tm = 0.5 * (T[k] + T[k - 1])
        lnp -= g * dz / (Rd * Tm)
        p[k] = np.exp(lnp)
    rho = p / (Rd * T)
    return p, rho


@dataclasses.dataclass
class _Ref:
    rho_col: jnp.ndarray
    p_col: jnp.ndarray


@dataclasses.dataclass
class _Model:
    grid: object
    reference: _Ref
    constants: object


@dataclasses.dataclass
class _Aux:
    T: jnp.ndarray
    q: object


def lw_column_fluxes(name: str, nz: int = 200, ztop: float = 50_000.0,
                     radiation=None):
    """(OLR, surface DLR) for the named standard atmosphere [W/m²]."""
    import breeze_tpu as bz
    from breeze_tpu.physics.spectral_radiation import SpectralRadiation
    from breeze_tpu.thermo.constants import (MoistureMassFractions,
                                             ThermodynamicConstants)

    grid = bz.make_grid(size=(1, 1, nz), extent=(1.0, 1.0, ztop),
                        topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                        dtype=jnp.float64)
    z = np.asarray(grid.z_c)
    dz = ztop / nz
    T = temperature_profile(name, z)
    p, rho = hydrostatic_column(T, z, dz)
    qv = vapor_profile(name, z, rho, dz)

    col = lambda a: jnp.asarray(a)[:, None, None]
    model = _Model(grid=grid, reference=_Ref(rho_col=col(rho), p_col=col(p)),
                   constants=ThermodynamicConstants())
    zero = jnp.zeros((nz, 1, 1))
    aux = _Aux(T=col(T), q=MoistureMassFractions(col(qv), zero, zero))

    rad = radiation or SpectralRadiation(
        optics="clear", surface_temperature=float(T[0]))
    lw_up, lw_dn = rad.lw_fluxes(model, aux)
    olr = float(lw_up[-1, 0, 0])
    dlr = float(lw_dn[0, 0, 0])
    return olr, dlr


# ---------------------------------------------------------------------------
# Clear-sky SW: external anchor via Lacis & Hansen (1974)
# ---------------------------------------------------------------------------
#
# The SW band model is anchored against an INDEPENDENT published clear-sky
# parameterization: Lacis & Hansen (1974, J. Atmos. Sci. 31, 118-133),
# "A parameterization for the absorption of solar radiation in the Earth's
# atmosphere" — analytic fits to Yamamoto's LBL-class absorption curves,
# implemented here directly from the paper's formulas (water-vapor
# absorption eq. 17, ozone eqs. 8-10, Rayleigh reflection sec. 3c).  It is
# a different lineage from both our band coefficients and the reference's
# RRTMGP tables (``ext/BreezeRRTMGPExt/clear_sky_radiative_transfer_model
# .jl:54-289``), so agreement is evidence, not tuning.
#
# Tolerance budget (vs LH74, per column/geometry): ±8 W/m² for the LH74-
# vs-modern-LBL gap (LH74 predates the H2O continuum in the near IR and
# neglects near-IR Rayleigh; modern codes absorb ~3-6% more) and ±7 W/m²
# for our 4-band model + analytic profile approximations → **±15 W/m²**
# on surface downwelling, atmospheric absorption, and TOA-up fluxes.

#: fraction of the solar spectrum in the ozone/visible (λ < 0.9 µm) and
#: water-vapor (λ > 0.9 µm) regions (LH74 sec. 2-3)
_LH_FRAC_VIS = 0.647
_LH_FRAC_WV = 0.353


def _lh_A_ozone(x):
    """LH74 eqs. 8-10: ozone absorption (fraction of TOTAL solar flux) for
    path x [cm STP]: Chappuis (visible) + Hartley/Huggins (UV)."""
    a_vis = 0.02118 * x / (1.0 + 0.042 * x + 3.23e-4 * x ** 2)
    a_uv = (1.082 * x / (1.0 + 138.6 * x) ** 0.805
            + 0.0658 * x / (1.0 + (103.6 * x) ** 3))
    return a_vis + a_uv


def _lh_A_wv(y):
    """LH74 eq. 17: water-vapor absorption (fraction of TOTAL solar flux)
    for effective path y [cm of precipitable water]."""
    return 2.9 * y / ((1.0 + 141.5 * y) ** 0.635 + 5.925 * y)


def _column_paths(name: str, nz: int = 200, ztop: float = 50_000.0):
    """(w_eff [cm], u_o3 [cm STP]) for the named analytic column: the
    pressure/temperature-scaled precipitable water (LH74 eq. 21 scaling,
    (p/p0)(T0/T)^0.5) and the ozone column from the model's standard
    profile."""
    from breeze_tpu.physics.spectral_radiation import standard_ozone_profile

    z = (np.arange(nz) + 0.5) * (ztop / nz)
    dz = ztop / nz
    T = temperature_profile(name, z)
    p, rho = hydrostatic_column(T, z, dz)
    qv = vapor_profile(name, z, rho, dz)
    w_layers = rho * qv * dz                     # kg/m² per layer
    scale = (p / 101_325.0) * np.sqrt(273.0 / T)
    w_eff = float(np.sum(w_layers * scale)) / 10.0   # kg/m² → cm

    o3_vmr = np.asarray(standard_ozone_profile(jnp.asarray(z)))
    m_o3, m_air = 47.997e-3, 28.966e-3
    u_o3_mass = float(np.sum(o3_vmr * (m_o3 / m_air) * rho * dz))  # kg/m²
    u_o3 = u_o3_mass / 0.0214146                 # kg/m² → cm STP (1 cm = 1000 DU)
    return w_eff, u_o3


def lacis_hansen_sw(name: str, mu0: float, albedo: float,
                    S0: float = 1361.0):
    """LH74 clear-sky column: returns ``(toa_up, sfc_dn, atm_abs)`` [W/m²].

    Composite exactly as the paper assembles it: ozone absorption above a
    conservative Rayleigh layer in the visible region (with ground/air
    multiple reflections, diffuse Rayleigh reflectance 0.0685 and upward
    magnification 1.9), water-vapor absorption with no scattering in the
    near IR (upward diffuse magnification 5/3)."""
    w, u = _column_paths(name)
    M = 35.0 / math.sqrt(1224.0 * mu0 ** 2 + 1.0)
    F = S0 * mu0
    Rg = albedo

    # --- visible / ozone region (conservative Rayleigh scattering) ------
    x = M * u
    A_dn = _lh_A_ozone(x)
    Rr = 0.28 / (1.0 + 6.43 * mu0)          # direct-beam Rayleigh albedo
    Rr_dif = 0.0685                          # diffuse (from below)
    dn_vis = F * (_LH_FRAC_VIS - A_dn - Rr)  # reaching the ground (dir+dif)
    ground_vis = dn_vis * (1.0 - Rg) / (1.0 - Rr_dif * Rg)
    up_from_ground_vis = dn_vis * Rg * (1.0 - Rr_dif) / (1.0 - Rr_dif * Rg)
    # ozone absorption of the upwelling diffuse beam (magnification 1.9)
    x_up = x + 1.9 * u
    dA_up = (_lh_A_ozone(x_up) - A_dn) * (up_from_ground_vis / max(F, 1e-9))
    toa_up_vis = F * Rr + up_from_ground_vis - F * dA_up
    abs_vis = F * (A_dn + dA_up)

    # --- water-vapor region (no scattering) -----------------------------
    y = M * w
    A_wv_dn = _lh_A_wv(y)
    dn_wv = F * (_LH_FRAC_WV - A_wv_dn)
    ground_wv = dn_wv * (1.0 - Rg)
    y_up = y + (5.0 / 3.0) * w
    dA_wv_up = (_lh_A_wv(y_up) - A_wv_dn) * (dn_wv * Rg / max(F, 1e-9))
    toa_up_wv = dn_wv * Rg - F * dA_wv_up
    abs_wv = F * (A_wv_dn + dA_wv_up)

    toa_up = toa_up_vis + toa_up_wv
    sfc_dn = dn_vis + dn_wv
    atm_abs = abs_vis + abs_wv
    # energy closure check (conservative scattering): in = up + ground + abs
    resid = F - toa_up - (ground_vis + ground_wv) - atm_abs
    assert abs(resid) < 1e-6 * F, resid
    return toa_up, sfc_dn, atm_abs


def sw_column_fluxes(name: str, mu0: float, albedo: float, nz: int = 200,
                     ztop: float = 50_000.0, S0: float = 1361.0):
    """(toa_up, sfc_dn, atm_abs) [W/m²] from the band SW model on the
    named standard atmosphere."""
    import breeze_tpu as bz
    from breeze_tpu.physics.radiation import FixedCosineZenith
    from breeze_tpu.physics.spectral_radiation import (
        SpectralRadiation, SurfaceRadiativeProperties)
    from breeze_tpu.thermo.constants import (MoistureMassFractions,
                                             ThermodynamicConstants)

    grid = bz.make_grid(size=(1, 1, nz), extent=(1.0, 1.0, ztop),
                        topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                        dtype=jnp.float64)
    z = np.asarray(grid.z_c)
    dz = ztop / nz
    T = temperature_profile(name, z)
    p, rho = hydrostatic_column(T, z, dz)
    qv = vapor_profile(name, z, rho, dz)

    col = lambda a: jnp.asarray(a)[:, None, None]
    ref = _Ref(rho_col=col(rho), p_col=col(p))
    ref.p_c = jnp.asarray(p)        # sw_fluxes reads ref.p_c for Δp
    model = _Model(grid=grid, reference=ref,
                   constants=ThermodynamicConstants())
    zero = jnp.zeros((nz, 1, 1))
    aux = _Aux(T=col(T), q=MoistureMassFractions(col(qv), zero, zero))

    rad = SpectralRadiation(
        optics="clear", solar_constant=S0,
        solar_position=FixedCosineZenith(mu0),
        surface=SurfaceRadiativeProperties(direct_albedo=albedo,
                                           diffuse_albedo=albedo))
    sw_dn, sw_up = rad.sw_fluxes(model, aux, 0.0)
    toa_up = float(sw_up[-1, 0, 0])
    sfc_dn = float(sw_dn[0, 0, 0])
    sfc_net = sfc_dn - float(sw_up[0, 0, 0])
    atm_abs = S0 * mu0 - toa_up - sfc_net
    return toa_up, sfc_dn, atm_abs


#: SW comparison geometries: (μ0, surface albedo) — overhead-sun ocean and
#: the ICRCCM-style 60°-zenith, 0.2-albedo land case
SW_GEOMETRIES = ((1.0, 0.06), (0.5, 0.2))
SW_TOLERANCE = 15.0   # W/m² (budget in the module comment above)


def main():
    print(f"{'atmosphere':12s} {'OLR':>8s} {'target':>8s} "
          f"{'DLR_sfc':>8s} {'target':>8s}")
    for name, (olr_t, dlr_t) in LW_TARGETS.items():
        olr, dlr = lw_column_fluxes(name)
        print(f"{name:12s} {olr:8.1f} {olr_t:8.1f} {dlr:8.1f} {dlr_t:8.1f}")
    print()
    print(f"{'atmosphere':12s} {'mu0':>4s} {'alb':>5s} "
          f"{'TOAup':>7s} {'LH74':>7s} {'SFCdn':>7s} {'LH74':>7s} "
          f"{'ABS':>7s} {'LH74':>7s}")
    for name in LW_TARGETS:
        for mu0, alb in SW_GEOMETRIES:
            got = sw_column_fluxes(name, mu0, alb)
            ref = lacis_hansen_sw(name, mu0, alb)
            print(f"{name:12s} {mu0:4.1f} {alb:5.2f} "
                  f"{got[0]:7.1f} {ref[0]:7.1f} {got[1]:7.1f} {ref[1]:7.1f} "
                  f"{got[2]:7.1f} {ref[2]:7.1f}")


if __name__ == "__main__":
    main()
