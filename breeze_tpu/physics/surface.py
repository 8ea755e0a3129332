"""Surface boundary fluxes: prescribed fluxes and bulk formulae.

TPU-native equivalent of reference ``src/BoundaryConditions/`` (BulkDrag
``bulk_drag.jl:5-181``, bulk sensible-heat/vapor fluxes
``bulk_scalar_fluxes.jl:8-302``) and of the flux-BC tendency pathway
(``compute_flux_bc_tendencies!``, ``update_atmosphere_model_state.jl:418-434``):
a surface flux F through the bottom wall becomes a tendency ``+F/Δz`` on the
wall-adjacent cell (sign: downward-positive input flux increases the cell).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PrescribedSurfaceFluxes:
    """Constant (or callable(time)) kinematic surface fluxes.

    - ``theta_flux``: w'θ' [K m/s]  (e.g. BOMEX: 8e-3)
    - ``qt_flux``:   w'qᵗ' [m/s]    (e.g. BOMEX: 5.2e-5)
    - ``momentum_drag_coefficient``: bulk Cd for u,v drag (None = free slip)
    - ``friction_velocity``: if set, drag uses u*² scaling instead of Cd|U|
    """

    theta_flux: float | Callable = 0.0
    qt_flux: float | Callable = 0.0
    momentum_drag_coefficient: float | None = None
    friction_velocity: float | None = None
    gustiness: float = 0.1


@dataclasses.dataclass(frozen=True)
class BulkSurfaceFluxes:
    """Bulk aerodynamic fluxes against prescribed surface values.

    F_θ = -Cθ |U| (θ₁ − θ_s),  F_q = -Cq |U| (q₁ − q_s(T_s)),
    τ = -Cd |U| u₁  (reference ``bulk_scalar_fluxes.jl:8-302``).

    ``stability_correction`` multiplies the neutral coefficients by a
    Louis (1979)-type function of the bulk Richardson number — the
    branch-free VPU analogue of the reference's fitted Monin–Obukhov
    stability functions (``polynomial_bulk_coefficient.jl:16-556``):
    enhanced exchange in unstable (convective) conditions, suppressed in
    stable stratification.
    """

    surface_temperature: float = 300.0
    surface_theta: float | None = None
    surface_qt: float | None = None      # None -> saturated at Ts
    drag_coefficient: float = 1.2e-3
    heat_transfer_coefficient: float = 1.2e-3
    vapor_transfer_coefficient: float = 1.2e-3
    gustiness: float = 0.1
    stability_correction: bool = False
    louis_b: float = 9.4
    louis_c_star: float = 7.4

    def stability_factor(self, Ri_b):
        """Louis (1979) f(Ri_b): >1 unstable, <1 stable, =1 neutral."""
        b = self.louis_b
        c = self.louis_c_star * self.drag_coefficient * b  # convective term
        unstable = 1.0 + b * jnp.abs(Ri_b) / (
            1.0 + c * jnp.sqrt(jnp.abs(Ri_b)))
        stable = 1.0 / (1.0 + 0.5 * b * jnp.maximum(Ri_b, 0.0)) ** 2
        return jnp.where(Ri_b < 0, unstable, stable)


def _value(v, t):
    return v(t) if callable(v) else v


def surface_flux_values(bf, model, state, aux, want_moisture: bool):
    """Kinematic surface fluxes through the bottom wall (shared by the
    anelastic and compressible paths).

    Returns ``(F_theta, F_qt, F_u, F_v)``: w'θ' [K m/s], w'qᵗ' [m/s], and
    the kinematic momentum fluxes −τₓ/ρ, −τᵧ/ρ [m²/s²] (``None`` entries
    mean no flux of that quantity).  Tendencies follow as ``+ρ₀F/Δz₀`` on
    the wall-adjacent cells (reference ``compute_flux_bc_tendencies!``,
    ``update_atmosphere_model_state.jl:418-434``).
    """
    g = model.grid
    ref = model.reference
    u1 = aux.u[0]
    v1 = aux.v[0]
    speed = jnp.sqrt(u1 * u1 + v1 * v1 + getattr(bf, "gustiness", 0.1) ** 2)

    if isinstance(bf, PrescribedSurfaceFluxes):
        th_flux = _value(bf.theta_flux, state.time)
        qt_flux = _value(bf.qt_flux, state.time) if want_moisture else None
        F_u = F_v = None
        if bf.friction_velocity is not None:
            ustar2 = bf.friction_velocity ** 2
            F_u = -ustar2 * u1 / speed
            F_v = -ustar2 * v1 / speed
        elif bf.momentum_drag_coefficient is not None:
            cd = bf.momentum_drag_coefficient
            F_u = -cd * speed * u1
            F_v = -cd * speed * v1
        return th_flux, qt_flux, F_u, F_v

    if isinstance(bf, BulkSurfaceFluxes):
        from ..thermo.saturation import saturation_specific_humidity
        from ..thermo.states import theta_li_from_temperature
        from ..thermo.constants import MoistureMassFractions

        c = model.constants
        theta1 = aux.theta[0]
        theta_s = bf.surface_theta
        if theta_s is None:
            q0 = MoistureMassFractions(0.0, 0.0, 0.0)
            theta_s = theta_li_from_temperature(
                jnp.asarray(bf.surface_temperature, g.dtype), q0,
                ref.surface_pressure, c, model.p_standard)

        stab = 1.0
        if bf.stability_correction:
            z1 = g.z_c[0]
            Ri_b = (c.gravitational_acceleration * z1 * (theta1 - theta_s)
                    / (jnp.maximum(theta1, 1.0) * speed ** 2))
            stab = bf.stability_factor(jnp.clip(Ri_b, -10.0, 10.0))

        th_flux = -bf.heat_transfer_coefficient * stab * speed * (theta1 - theta_s)

        qt_flux = None
        if want_moisture and aux.qt is not None:
            qt1 = aux.qt[0]
            q_s = bf.surface_qt
            if q_s is None:
                rho_surf = ref.surface_pressure / (c.Rd * bf.surface_temperature)
                q_s = saturation_specific_humidity(
                    jnp.asarray(bf.surface_temperature, g.dtype), rho_surf, c)
            qt_flux = -bf.vapor_transfer_coefficient * stab * speed * (qt1 - q_s)

        cd = bf.drag_coefficient * stab
        return th_flux, qt_flux, -cd * speed * u1, -cd * speed * v1

    raise TypeError(f"unknown boundary flux config {bf!r}")


def apply_boundary_flux_tendencies(model, state, aux, G):
    """Add surface-flux tendencies to the bottom-cell rows of G (anelastic)."""
    bf = model.boundary_fluxes
    g = model.grid
    dz0 = g.dz_c[0]
    rho0 = model.reference.rho_c[0]

    th_flux, qt_flux, F_u, F_v = surface_flux_values(
        bf, model, state, aux, want_moisture=G.rho_qt is not None)

    if th_flux is not None:
        G = G.replace(rho_theta=G.rho_theta.at[0].add(rho0 * th_flux / dz0))
    if qt_flux is not None and G.rho_qt is not None:
        G = G.replace(rho_qt=G.rho_qt.at[0].add(rho0 * qt_flux / dz0))
    if F_u is not None:
        G = G.replace(
            rho_u=G.rho_u.at[0].add(rho0 * F_u / dz0),
            rho_v=G.rho_v.at[0].add(rho0 * F_v / dz0))
    return G
