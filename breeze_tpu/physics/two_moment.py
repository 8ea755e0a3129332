"""Two-moment warm-rain microphysics (Seifert & Beheng 2006 family).

TPU-native analogue of the reference's 2M extension
(``ext/BreezeCloudMicrophysicsExt/two_moment_microphysics.jl:132-283`` +
κ-Köhler activation ``cloud_microphysics_translations.jl:592``): prognostic
cloud/rain mass AND number concentrations, Twomey-type aerosol activation,
SB2006 autoconversion/accretion/self-collection shapes, ventilated rain
evaporation, and mean-mass terminal velocities.  Parameter-exact
CloudMicrophysics.jl parity is a planned refinement; the moments, process
couplings, and operator-split structure match the reference.

Prognostics: vapor (model moisture slot) + tracers
``rho_qcl, rho_qr`` (mass densities) and ``rho_ncl, rho_nr`` (number
densities, 1/m³ × ρ-weighting kept analogous for conservative transport).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..thermo.saturation import saturation_specific_humidity
from ..thermo.constants import MoistureMassFractions
from ..thermo.states import temperature_from_theta_li


@dataclasses.dataclass(frozen=True)
class TwoMomentMicrophysics:
    """SB2006-family warm 2M configuration."""

    # aerosol activation (Twomey): N_act = ccn_concentration * s^k (s in %)
    ccn_concentration: float = 100.0e6    # [1/m³]
    activation_exponent: float = 0.5
    activation_timescale: float = 10.0
    # condensation relaxation
    tau_cond: float = 10.0
    # SB2006 autoconversion
    kc_autoconversion: float = 9.44e9     # [m³/kg²/s]
    x_star: float = 2.6e-10               # separating droplet mass [kg]
    nu_cloud: float = 2.0                 # cloud gamma-shape parameter
    # accretion
    kr_accretion: float = 5.78            # [m³/kg/s]
    # rain self-collection
    k_selfcollection: float = 7.12        # [m³/kg/s]
    # rain evaporation
    tau_evap: float = 100.0
    # sedimentation: v(x̄) = a x̄^b mean-mass fall speed
    rain_v_coefficient: float = 159.0     # Stokes-ish a [m/s kg^-b]
    rain_v_exponent: float = 0.266
    max_terminal_velocity: float = 10.0
    substep_cfl: float = 0.8
    # droplet bounds
    min_droplet_mass: float = 4.2e-15     # ~1 µm radius
    max_droplet_mass: float = 2.6e-10
    min_rain_mass: float = 2.6e-10
    max_rain_mass: float = 5.0e-6

    prognostic_tracer_names = ("rho_qcl", "rho_qr", "rho_ncl", "rho_nr")
    liquid_tracer_names = ("rho_qcl", "rho_qr")
    ice_tracer_names = ()
    # reference two_moment_microphysics.jl:348-354
    correction_tracer_chain = ("rho_qr", "rho_qcl")
    correction_number_mass_pairs = (("rho_nr", "rho_qr"), ("rho_ncl", "rho_qcl"))
    correction_number_fields = ("rho_ncl", "rho_nr")

    def model_update(self, model, state, dt: float):
        return two_moment_update(self, model, state, float(dt))


def two_moment_update(scheme: TwoMomentMicrophysics, model, state, dt: float):
    g = model.grid
    c = model.constants
    ref = model.reference
    rho = jnp.broadcast_to(ref.rho_col, g.shape).astype(g.dtype)
    p = jnp.broadcast_to(ref.p_col, g.shape).astype(g.dtype)
    dz = g.dz_c_col
    rho_surf = ref.rho_c[0]

    qv = jnp.maximum(state.rho_qt / rho, 0.0)
    zeros = jnp.zeros_like(qv)
    qcl = jnp.maximum(state.tracers.get("rho_qcl", zeros) / rho, 0.0)
    qr = jnp.maximum(state.tracers.get("rho_qr", zeros) / rho, 0.0)
    ncl = jnp.maximum(state.tracers.get("rho_ncl", zeros) / rho, 0.0)  # [1/kg]
    nr = jnp.maximum(state.tracers.get("rho_nr", zeros) / rho, 0.0)
    theta = state.rho_theta / rho

    n_sub = max(1, math.ceil(dt * scheme.max_terminal_velocity
                             / (scheme.substep_cfl * g.dz_min)))
    dts = dt / n_sub

    def subcycle(m, carry):
        qv, qcl, qr, ncl, nr = carry

        q_mmf = MoistureMassFractions(qv, qcl + qr, jnp.zeros_like(qv))
        T = temperature_from_theta_li(theta, q_mmf, p, c, model.p_standard)
        qvs = saturation_specific_humidity(T, rho, c, 1.0)
        s_pct = jnp.maximum(0.0, (qv / qvs - 1.0)) * 100.0

        # --- activation (Twomey) ------------------------------------
        n_act = scheme.ccn_concentration / rho * jnp.minimum(
            s_pct ** scheme.activation_exponent, 1.0)   # per-mass [1/kg]
        act = jnp.maximum(0.0, n_act - ncl) / scheme.activation_timescale

        # --- condensation / evaporation of cloud --------------------
        cond = (qv - qvs) / scheme.tau_cond
        cond = jnp.where(cond > 0, cond, jnp.maximum(cond, -qcl / dts))
        # evaporation removes droplets proportionally
        evap_frac = jnp.where(qcl > 1e-12, jnp.maximum(-cond, 0.0) * dts / jnp.maximum(qcl, 1e-12), 0.0)
        dncl_evap = -ncl * jnp.minimum(evap_frac, 1.0) / dts

        # --- SB2006 autoconversion ----------------------------------
        x_cl = jnp.clip(jnp.where(ncl > 1e-3, qcl / jnp.maximum(ncl, 1e-3), 0.0),
                        scheme.min_droplet_mass, scheme.max_droplet_mass)
        nu = scheme.nu_cloud
        au = (scheme.kc_autoconversion / (20.0 * scheme.x_star)
              * (nu + 2.0) * (nu + 4.0) / (nu + 1.0) ** 2
              * qcl ** 2 * x_cl ** 2 * rho)
        au = jnp.minimum(au, qcl / dts)
        dnr_au = au / scheme.x_star
        dncl_au = -2.0 * au / jnp.maximum(x_cl, scheme.min_droplet_mass)

        # --- accretion ----------------------------------------------
        ac = scheme.kr_accretion * qcl * qr * rho
        ac = jnp.minimum(ac, jnp.maximum(qcl / dts - au, 0.0))
        dncl_ac = -ac / jnp.maximum(x_cl, scheme.min_droplet_mass)

        # --- rain self-collection -----------------------------------
        sc = scheme.k_selfcollection * nr * qr * rho

        # --- rain evaporation ---------------------------------------
        subsat = jnp.maximum(0.0, 1.0 - qv / qvs)
        evap_r = qr * subsat / scheme.tau_evap
        x_r = jnp.clip(jnp.where(nr > 1e-6, qr / jnp.maximum(nr, 1e-6), 0.0),
                       scheme.min_rain_mass, scheme.max_rain_mass)
        dnr_evap = -evap_r / jnp.maximum(x_r, scheme.min_rain_mass)

        # --- update -------------------------------------------------
        qv1 = jnp.maximum(qv - dts * cond + dts * evap_r, 0.0)
        qcl1 = jnp.maximum(qcl + dts * (cond - au - ac), 0.0)
        qr1 = jnp.maximum(qr + dts * (au + ac - evap_r), 0.0)
        ncl1 = jnp.maximum(ncl + dts * (act + dncl_evap + dncl_au + dncl_ac), 0.0)
        nr1 = jnp.maximum(nr + dts * (dnr_au - sc + dnr_evap), 0.0)

        # clamp orphaned numbers (no mass → no number; reference
        # negative_moisture_correction clamps orphaned concentrations)
        ncl1 = jnp.where(qcl1 > 1e-12, ncl1, 0.0)
        nr1 = jnp.where(qr1 > 1e-12, nr1, 0.0)

        # --- sedimentation of rain (mass and number) ----------------
        v_r = jnp.clip(scheme.rain_v_coefficient * x_r ** scheme.rain_v_exponent,
                       0.0, scheme.max_terminal_velocity) * jnp.sqrt(rho_surf / rho)

        def settle(q):
            flux = rho * q * v_r
            flux_above = jnp.concatenate([flux[1:], jnp.zeros_like(flux[:1])], 0)
            return jnp.maximum(q + dts * (flux_above - flux) / (rho * dz), 0.0)

        qr1 = settle(qr1)
        nr1 = settle(nr1)

        return qv1, qcl1, qr1, ncl1, nr1

    qv, qcl, qr, ncl, nr = jax.lax.fori_loop(
        0, n_sub, subcycle, (qv, qcl, qr, ncl, nr))

    tracers = dict(state.tracers)
    tracers["rho_qcl"] = rho * qcl
    tracers["rho_qr"] = rho * qr
    tracers["rho_ncl"] = rho * ncl
    tracers["rho_nr"] = rho * nr
    return state.replace(rho_qt=rho * qv, tracers=tracers)
