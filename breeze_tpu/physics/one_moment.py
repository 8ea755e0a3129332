"""One-moment 4-category bulk microphysics (cloud liquid / cloud ice / rain / snow).

TPU-native analogue of the reference's 1M extension
(``ext/BreezeCloudMicrophysicsExt/one_moment_microphysics.jl:118-160`` +
process translations ``cloud_microphysics_translations.jl:50-429``): the
reference wraps CloudMicrophysics.jl process rates; here the same process
set is implemented directly with standard one-moment closures
(Kessler/Lin-family rate forms, relaxation condensation, temperature-ramped
ice processes).  Exact CloudMicrophysics parameter parity is a planned
refinement — the categories, couplings, and operator-split structure match.

Prognostics: vapor (the model moisture slot) + tracers
``rho_qcl, rho_qci, rho_qr, rho_qs``.  Applied operator-split once per step,
vectorized over the whole grid with sedimentation as upwind z-shifts under a
fixed-count subcycle (same TPU pattern as :mod:`breeze_tpu.physics.kessler`).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..thermo.constants import MoistureMassFractions
from ..thermo.saturation import saturation_specific_humidity
from ..thermo.states import temperature_from_theta_li, theta_li_from_temperature


@dataclasses.dataclass(frozen=True)
class OneMomentMicrophysics:
    """1M bulk scheme configuration."""

    # condensation / deposition relaxation times [s]
    tau_cond: float = 10.0
    tau_dep: float = 10.0
    # autoconversion
    tau_acnv_liq: float = 1000.0
    q_liq_threshold: float = 5e-4
    tau_acnv_ice: float = 1000.0
    q_ice_threshold: float = 1e-4
    # accretion (Kessler-family)
    accretion_rate_rain: float = 2.2
    accretion_rate_snow: float = 0.5
    # melting / freezing
    tau_melt: float = 100.0
    freezing_temperature: float = 273.15
    homogeneous_freezing_temperature: float = 233.15
    # sedimentation (terminal velocity ~ a (rho q)^b)
    rain_w_coefficient: float = 36.34
    rain_w_exponent: float = 0.1364
    snow_w_coefficient: float = 6.0
    snow_w_exponent: float = 0.1
    substep_cfl: float = 0.8
    max_terminal_velocity: float = 12.0
    # rain evaporation relaxation
    tau_evap: float = 200.0

    prognostic_tracer_names = ("rho_qcl", "rho_qci", "rho_qr", "rho_qs")
    liquid_tracer_names = ("rho_qcl", "rho_qr")
    ice_tracer_names = ("rho_qci", "rho_qs")
    # heavy→light borrowing chain into vapor (reference
    # correction_moisture_fields, one_moment_microphysics.jl:535-536,
    # extended to the ice categories: precipitating before suspended)
    correction_tracer_chain = ("rho_qs", "rho_qr", "rho_qci", "rho_qcl")

    def model_update(self, model, state, dt: float):
        return one_moment_update(self, model, state, float(dt))


def _liquid_fraction(T, scheme):
    return jnp.clip((T - scheme.homogeneous_freezing_temperature)
                    / (scheme.freezing_temperature
                       - scheme.homogeneous_freezing_temperature), 0.0, 1.0)


def one_moment_update(scheme: OneMomentMicrophysics, model, state, dt: float):
    g = model.grid
    c = model.constants
    ref = model.reference
    rho = jnp.broadcast_to(ref.rho_col, g.shape).astype(g.dtype)
    p = jnp.broadcast_to(ref.p_col, g.shape).astype(g.dtype)
    dz = g.dz_c_col
    rho_surf = ref.rho_c[0]

    Ll = c.liquid.reference_latent_heat
    Li = c.ice.reference_latent_heat
    Lf = Li - Ll   # latent heat of fusion (reference-temperature values)

    qv = jnp.maximum(state.rho_qt / rho, 0.0)
    zeros = jnp.zeros_like(qv)
    qcl = jnp.maximum(state.tracers.get("rho_qcl", zeros) / rho, 0.0)
    qci = jnp.maximum(state.tracers.get("rho_qci", zeros) / rho, 0.0)
    qr = jnp.maximum(state.tracers.get("rho_qr", zeros) / rho, 0.0)
    qs = jnp.maximum(state.tracers.get("rho_qs", zeros) / rho, 0.0)
    theta = state.rho_theta / rho

    n_sub = max(1, math.ceil(dt * scheme.max_terminal_velocity
                             / (scheme.substep_cfl * g.dz_min)))
    dts = dt / n_sub

    def q_of(qv, qcl, qci):
        return MoistureMassFractions(qv, qcl, qci)

    def subcycle(m, carry):
        qv, qcl, qci, qr, qs, theta = carry

        T = temperature_from_theta_li(theta, q_of(qv, qcl + qr, qci + qs), p,
                                      c, model.p_standard)
        lam = _liquid_fraction(T, scheme)

        # --- condensation/evaporation of cloud liquid (relaxation) ---
        qvs_l = saturation_specific_humidity(T, rho, c, 1.0)
        cond = (qv - qvs_l) / scheme.tau_cond * lam
        cond = jnp.where(cond > 0, cond, jnp.maximum(cond, -qcl / dts))

        # --- deposition/sublimation of cloud ice ----------------------
        qvs_i = saturation_specific_humidity(T, rho, c, 0.0)
        dep = (qv - qvs_i) / scheme.tau_dep * (1.0 - lam)
        dep = jnp.where(dep > 0, dep, jnp.maximum(dep, -qci / dts))

        # --- autoconversion -------------------------------------------
        acnv_l = jnp.maximum(0.0, qcl - scheme.q_liq_threshold) / scheme.tau_acnv_liq
        acnv_i = jnp.maximum(0.0, qci - scheme.q_ice_threshold) / scheme.tau_acnv_ice

        # --- accretion ------------------------------------------------
        accr_r = scheme.accretion_rate_rain * qcl * jnp.maximum(qr, 0.0) ** 0.875
        accr_s = scheme.accretion_rate_snow * qci * jnp.maximum(qs, 0.0) ** 0.875

        # --- melting (T > Tf) and freezing of rain (T << Tf) ----------
        warm = T > scheme.freezing_temperature
        melt_s = jnp.where(warm, qs / scheme.tau_melt, 0.0)
        melt_i = jnp.where(warm, qci / scheme.tau_melt, 0.0)
        frz_r = jnp.where(T < scheme.homogeneous_freezing_temperature,
                          qr / scheme.tau_melt, 0.0)

        # --- rain evaporation in subsaturated air ---------------------
        subsat = jnp.maximum(0.0, qvs_l - qv) / jnp.maximum(qvs_l, 1e-10)
        evap_r = qr * subsat / scheme.tau_evap

        # --- tendencies (bounded by availability) ---------------------
        dqcl = cond - acnv_l - accr_r - jnp.where(warm, 0.0, 0.0)
        dqci = dep - acnv_i - accr_s - melt_i
        dqr = acnv_l + accr_r + melt_s + melt_i - evap_r - frz_r
        dqs = acnv_i + accr_s - melt_s + frz_r
        dqv = -cond - dep + evap_r

        qv1 = jnp.maximum(qv + dts * dqv, 0.0)
        qcl1 = jnp.maximum(qcl + dts * dqcl, 0.0)
        qci1 = jnp.maximum(qci + dts * dqci, 0.0)
        qr1 = jnp.maximum(qr + dts * dqr, 0.0)
        qs1 = jnp.maximum(qs + dts * dqs, 0.0)

        # --- sedimentation of rain and snow ---------------------------
        def settle(q, coeff, expo):
            W = coeff * jnp.maximum(rho * q * 1e-3, 0.0) ** expo * jnp.sqrt(rho_surf / rho)
            flux = rho * q * W
            flux_above = jnp.concatenate([flux[1:], jnp.zeros_like(flux[:1])], 0)
            return q + dts * (flux_above - flux) / (rho * dz)

        qr1 = jnp.maximum(settle(qr1, scheme.rain_w_coefficient,
                                 scheme.rain_w_exponent), 0.0)
        qs1 = jnp.maximum(settle(qs1, scheme.snow_w_coefficient,
                                 scheme.snow_w_exponent), 0.0)

        # θˡⁱ is invariant under every phase change by construction
        # (T = Πθˡⁱ + (ℒˡqˡ + ℒⁱqⁱ)/cᵖᵐ absorbs latent heating through the
        # composition change — including melting via ℒⁱ−ℒˡ); only the
        # moisture categories update here.
        return qv1, qcl1, qci1, qr1, qs1, theta

    qv, qcl, qci, qr, qs, theta = jax.lax.fori_loop(
        0, n_sub, subcycle, (qv, qcl, qci, qr, qs, theta))

    tracers = dict(state.tracers)
    tracers["rho_qcl"] = rho * qcl
    tracers["rho_qci"] = rho * qci
    tracers["rho_qr"] = rho * qr
    tracers["rho_qs"] = rho * qs
    return state.replace(rho_qt=rho * qv, rho_theta=rho * theta,
                         tracers=tracers)
