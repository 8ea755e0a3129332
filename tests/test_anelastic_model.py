"""End-to-end anelastic model tests: rest state, conservation, thermal bubble.

Mirrors the reference's physics-contract pattern
(``test/substepper_rest_state.jl``: one failure mode per test) and the
thermal-bubble integration test (``test/dynamics.jl:24``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import breeze_tpu as bz
from breeze_tpu.model import compute_tendencies, diagnose, initial_state, make_model
from breeze_tpu.timesteppers import ssp_rk3_step


def bubble_grid(n=32, dtype=jnp.float64, halo=3):
    # 2-D (x, z) slice: flat-ish y with 1 cell
    return bz.make_grid(size=(n, 1, n), extent=(20_000.0, 1.0, 10_000.0),
                        topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                        halo=halo, dtype=dtype)


def thermal_bubble_theta(amplitude=2.0, x0=10_000.0, z0=2_000.0, r0=2_000.0,
                         theta0=300.0):
    def theta(x, y, z):
        r = jnp.sqrt((x - x0) ** 2 + (z - z0) ** 2)
        return theta0 + amplitude * jnp.maximum(0.0, 1.0 - r / r0)
    return theta


class TestRestState:
    """Contract: a resting, balanced state stays exactly at rest (T3/T4)."""

    def test_tendencies_vanish_at_rest(self):
        g = bubble_grid(16)
        model = make_model(g, potential_temperature=300.0)
        state = initial_state(model)  # θ = θᵣ everywhere, u = 0
        G = compute_tendencies(model, state)
        np.testing.assert_allclose(np.asarray(G.rho_u), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(G.rho_w), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(G.rho_theta), 0.0, atol=1e-12)

    def test_rest_survives_many_steps(self):
        g = bubble_grid(16)
        model = make_model(g, potential_temperature=300.0)
        state = initial_state(model)
        for _ in range(10):
            state = ssp_rk3_step(model, state, 10.0)
        aux = diagnose(model, state)
        assert float(jnp.abs(aux.w).max()) < 1e-12
        assert float(jnp.abs(aux.u).max()) < 1e-12


class TestConservation:
    def test_rho_theta_conserved(self):
        """Flux-form advection + periodic/wall BCs conserve ∫ρθ dV exactly."""
        g = bubble_grid(32)
        model = make_model(g, advection=bz.Centered(2), potential_temperature=300.0)
        state = initial_state(model, theta=thermal_bubble_theta())
        dzc = np.asarray(g.dz_c)[:, None, None]
        total0 = float(jnp.sum(state.rho_theta * dzc))
        for _ in range(5):
            state = ssp_rk3_step(model, state, 5.0)
        total1 = float(jnp.sum(state.rho_theta * dzc))
        np.testing.assert_allclose(total1, total0, rtol=1e-13)

    def test_rho_theta_conserved_weno(self):
        g = bubble_grid(32, halo=3)
        model = make_model(g, advection=bz.WENO(5), potential_temperature=300.0)
        state = initial_state(model, theta=thermal_bubble_theta())
        dzc = np.asarray(g.dz_c)[:, None, None]
        total0 = float(jnp.sum(state.rho_theta * dzc))
        for _ in range(5):
            state = ssp_rk3_step(model, state, 5.0)
        total1 = float(jnp.sum(state.rho_theta * dzc))
        np.testing.assert_allclose(total1, total0, rtol=1e-13)


class TestThermalBubble:
    def test_bubble_rises(self):
        """A warm bubble develops positive w at its center and rises."""
        g = bubble_grid(32)
        model = make_model(g, advection=bz.WENO(5), potential_temperature=300.0)
        state = initial_state(model, theta=thermal_bubble_theta(amplitude=2.0))

        aux0 = diagnose(model, state)
        # initial buoyancy positive inside the bubble
        assert float(aux0.buoyancy_force.max()) > 0

        dt = 5.0
        for _ in range(20):
            state = ssp_rk3_step(model, state, dt)
        aux = diagnose(model, state)

        assert bool(jnp.all(jnp.isfinite(state.rho_theta)))
        w = np.asarray(aux.w)
        assert w.max() > 0.1, "bubble should accelerate upward"
        # center of mass of θ anomaly moved up
        theta_anom0 = np.asarray(diagnose(model, initial_state(
            model, theta=thermal_bubble_theta())).theta) - 300.0
        theta_anom = np.asarray(aux.theta) - 300.0
        z = np.asarray(g.z_c)[:, None, None]
        com0 = (theta_anom0 * z).sum() / theta_anom0.sum()
        com1 = (theta_anom * z).sum() / theta_anom.sum()
        assert com1 > com0 + 10.0

    def test_jit_step_matches_eager(self):
        g = bubble_grid(16, dtype=jnp.float32)
        model = make_model(g, advection=bz.WENO(5), potential_temperature=300.0)
        state = initial_state(model, theta=thermal_bubble_theta())
        s_eager = ssp_rk3_step(model, state, 2.0)
        s_jit = jax.jit(ssp_rk3_step)(model, state, 2.0)
        np.testing.assert_allclose(np.asarray(s_jit.rho_theta),
                                   np.asarray(s_eager.rho_theta), rtol=2e-6, atol=1e-4)


class TestMoistBubble:
    def test_cloudy_bubble_condenses(self):
        """Reference 'cloudy_thermal_bubble' capability: saturation adjustment
        produces liquid in a rising moist bubble."""
        g = bubble_grid(24)
        model = make_model(
            g, advection=bz.WENO(5), potential_temperature=300.0,
            microphysics=bz.SaturationAdjustment(equilibrium=bz.WarmPhaseEquilibrium()))

        def qt_init(x, y, z):
            r = jnp.sqrt((x - 10_000.0) ** 2 + (z - 2_000.0) ** 2)
            return 0.018 * jnp.maximum(0.0, 1.0 - r / 2_000.0) + 0.001

        state = initial_state(model, theta=thermal_bubble_theta(amplitude=2.0),
                              qt=qt_init)
        for _ in range(10):
            state = ssp_rk3_step(model, state, 5.0)
        aux = diagnose(model, state)
        assert bool(jnp.all(jnp.isfinite(state.rho_qt)))
        assert float(aux.q.liquid.max()) > 1e-5, "rising moist bubble should condense"

    def test_moisture_conserved(self):
        g = bubble_grid(24)
        model = make_model(
            g, advection=bz.Centered(2), potential_temperature=300.0,
            microphysics=bz.SaturationAdjustment(equilibrium=bz.WarmPhaseEquilibrium()))
        state = initial_state(model, theta=thermal_bubble_theta(),
                              qt=lambda x, y, z: 0.005 + 0.005 * jnp.exp(-z / 2000.0))
        dzc = np.asarray(g.dz_c)[:, None, None]
        total0 = float(jnp.sum(state.rho_qt * dzc))
        for _ in range(5):
            state = ssp_rk3_step(model, state, 5.0)
        total1 = float(jnp.sum(state.rho_qt * dzc))
        np.testing.assert_allclose(total1, total0, rtol=1e-12)


class TestSetExtensions:
    """set!-style name-priority initialization (reference
    set_atmosphere_model.jl: T-priority conversion +
    enforce_mass_conservation!)."""

    def _grid(self):
        return bz.make_grid(size=(8, 1, 32), extent=(800.0, 1.0, 8000.0),
                            topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                            dtype=jnp.float64)

    def test_temperature_priority_roundtrip(self):
        from breeze_tpu.model import diagnose
        model = make_model(self._grid(), potential_temperature=300.0)
        state = initial_state(model, T=lambda x, y, z: 280.0 + 0.0 * z)
        aux = diagnose(model, state)
        np.testing.assert_allclose(np.asarray(aux.T), 280.0, atol=1e-9)

    def test_enforce_mass_conservation_projects_initial_velocity(self):
        from breeze_tpu import fields as fl
        g = self._grid()
        model = make_model(g, potential_temperature=300.0)
        state = initial_state(
            model, u=lambda x, y, z: jnp.sin(2 * jnp.pi * x / 800.0))
        so = model.stencil_ops()
        div = so.div_c(fl.pad(state.rho_u, g, fl.CCF),
                       fl.pad(state.rho_v, g, fl.CFC),
                       fl.pad(state.rho_w, g, fl.FCC))
        assert float(jnp.abs(div).max()) < 1e-10

    def test_theta_and_T_mutually_exclusive(self):
        model = make_model(self._grid(), potential_temperature=300.0)
        with pytest.raises(ValueError):
            initial_state(model, theta=300.0, T=280.0)
