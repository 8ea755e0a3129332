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


def main():
    print(f"{'atmosphere':12s} {'OLR':>8s} {'target':>8s} "
          f"{'DLR_sfc':>8s} {'target':>8s}")
    for name, (olr_t, dlr_t) in LW_TARGETS.items():
        olr, dlr = lw_column_fluxes(name)
        print(f"{name:12s} {olr:8.1f} {olr_t:8.1f} {dlr:8.1f} {dlr_t:8.1f}")


if __name__ == "__main__":
    main()
