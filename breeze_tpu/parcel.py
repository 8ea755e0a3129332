"""0-D Lagrangian parcel model for microphysics prototyping.

TPU-native equivalent of reference ``src/ParcelModels/parcel_dynamics.jl``
(`ParcelState` :69, `ParcelDynamics` :137, prescribed/prognostic vertical
velocity :34-45): a single air parcel ascends through a hydrostatic
environment, conserving θˡⁱ and qᵗ while the embedded microphysics
partitions moisture; optional buoyancy-driven prognostic w.

The parcel trajectory integrates with ``lax.scan`` — many parcels batch
for free via vmap.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .physics.microphysics import SaturationAdjustment, saturation_adjust
from .thermo.constants import MoistureMassFractions, ThermodynamicConstants
from .thermo.reference import make_reference_state
from .thermo.states import temperature_from_theta_li


class ParcelState(NamedTuple):
    z: jax.Array
    w: jax.Array
    theta_li: jax.Array    # conserved under adiabatic + saturation adjustment
    qt: jax.Array
    T: jax.Array
    qv: jax.Array
    ql: jax.Array
    qi: jax.Array
    time: jax.Array


@dataclasses.dataclass(frozen=True)
class ParcelDynamics:
    """Parcel configuration.

    ``vertical_velocity``: a float/callable(t) for prescribed ascent, or
    ``"prognostic"`` for buoyancy-driven w (dw/dt = b).
    """

    constants: ThermodynamicConstants = dataclasses.field(
        default_factory=ThermodynamicConstants)
    microphysics: object = dataclasses.field(default_factory=SaturationAdjustment)
    vertical_velocity: object = 1.0
    surface_pressure: float = 101325.0
    environment_theta: float = 300.0
    p_standard: float = 1.0e5

    def environment_pressure(self, z):
        from .thermo.reference import adiabatic_hydrostatic_pressure

        return adiabatic_hydrostatic_pressure(
            z, self.surface_pressure, self.environment_theta, self.p_standard,
            self.constants)

    def initial_state(self, z=0.0, w=0.0, theta=300.0, qt=0.0) -> ParcelState:
        p = self.environment_pressure(jnp.asarray(z, jnp.float32))
        T, q = saturation_adjust(jnp.asarray(theta), jnp.asarray(qt), p,
                                 self.constants, self.microphysics, self.p_standard)
        return ParcelState(
            z=jnp.asarray(z, jnp.float32), w=jnp.asarray(w, jnp.float32),
            theta_li=jnp.asarray(theta, jnp.float32), qt=jnp.asarray(qt, jnp.float32),
            T=T.astype(jnp.float32), qv=q.vapor.astype(jnp.float32),
            ql=q.liquid.astype(jnp.float32), qi=q.ice.astype(jnp.float32),
            time=jnp.zeros((), jnp.float32))

    def step(self, s: ParcelState, dt) -> ParcelState:
        c = self.constants
        if self.vertical_velocity == "prognostic":
            # buoyancy vs the dry environment at the parcel's height
            p = self.environment_pressure(s.z)
            q_env = MoistureMassFractions(0.0, 0.0, 0.0)
            T_env = temperature_from_theta_li(
                jnp.asarray(self.environment_theta), q_env, p, c, self.p_standard)
            q = MoistureMassFractions(s.qv, s.ql, s.qi)
            Rm = c.mixture_gas_constant(q)
            b = c.gravitational_acceleration * (Rm * s.T / (c.Rd * T_env) - 1.0)
            w_new = s.w + dt * b
        else:
            w_new = jnp.asarray(
                self.vertical_velocity(s.time) if callable(self.vertical_velocity)
                else self.vertical_velocity, jnp.float32)

        z_new = s.z + dt * w_new
        p_new = self.environment_pressure(z_new)
        T, q = saturation_adjust(s.theta_li, s.qt, p_new, c,
                                 self.microphysics, self.p_standard)
        return ParcelState(
            z=z_new, w=w_new, theta_li=s.theta_li, qt=s.qt,
            T=T, qv=q.vapor, ql=q.liquid, qi=q.ice,
            time=s.time + dt)

    def integrate(self, s0: ParcelState, dt, n_steps: int):
        """Trajectory via lax.scan; returns (final, stacked trajectory)."""
        def body(s, _):
            s2 = self.step(s, dt)
            return s2, s2

        return jax.lax.scan(body, s0, None, length=n_steps)
