"""Static-energy formulation tests (prognostic ρe).

Mirrors the reference's formulation-equivalence expectations
(``src/StaticEnergyFormulations/``): both formulations represent the same
physics; a dry bubble evolves nearly identically under ρθ and ρe.
"""

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.model import diagnose, initial_state, make_model
from breeze_tpu.timesteppers import ssp_rk3_step


def grid2d(n=24):
    return bz.make_grid(size=(n, 1, n), extent=(10_000.0, 1.0, 5_000.0),
                        topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                        dtype=jnp.float64)


def bubble(x, y, z):
    r = jnp.sqrt((x - 5_000.0) ** 2 + (z - 1_000.0) ** 2)
    return 300.0 + 2.0 * jnp.maximum(0.0, 1.0 - r / 1_000.0)


class TestStaticEnergy:
    def test_rest_state_at_rest(self):
        g = grid2d(12)
        model = make_model(g, potential_temperature=300.0,
                          formulation="static_energy")
        state = initial_state(model)
        for _ in range(5):
            state = ssp_rk3_step(model, state, 5.0)
        aux = diagnose(model, state)
        assert float(jnp.abs(aux.w).max()) < 1e-10

    def test_diagnosed_temperature_consistent(self):
        g = grid2d(12)
        m_th = make_model(g, potential_temperature=300.0)
        m_se = make_model(g, potential_temperature=300.0,
                          formulation="static_energy")
        s_th = initial_state(m_th, theta=bubble)
        s_se = initial_state(m_se, theta=bubble)
        T_th = diagnose(m_th, s_th).T
        T_se = diagnose(m_se, s_se).T
        np.testing.assert_allclose(np.asarray(T_se), np.asarray(T_th), rtol=1e-10)

    def test_bubble_evolution_matches_theta_formulation(self):
        g = grid2d(24)
        m_th = make_model(g, advection=bz.WENO(5), potential_temperature=300.0)
        m_se = make_model(g, advection=bz.WENO(5), potential_temperature=300.0,
                          formulation="static_energy")
        s_th = initial_state(m_th, theta=bubble)
        s_se = initial_state(m_se, theta=bubble)
        for _ in range(10):
            s_th = ssp_rk3_step(m_th, s_th, 4.0)
            s_se = ssp_rk3_step(m_se, s_se, 4.0)
        w_th = np.asarray(diagnose(m_th, s_th).w)
        w_se = np.asarray(diagnose(m_se, s_se).w)
        # The two formulations differ at O(gz/cpT · perturbation) — loose
        # agreement on the velocity field after a short run
        scale = np.abs(w_th).max()
        assert scale > 0.01
        np.testing.assert_allclose(w_se / scale, w_th / scale, atol=0.1)

    def test_moist_static_energy_runs(self):
        g = grid2d(16)
        model = make_model(
            g, advection=bz.WENO(5), potential_temperature=300.0,
            formulation="static_energy",
            microphysics=bz.SaturationAdjustment(equilibrium=bz.WarmPhaseEquilibrium()))
        state = initial_state(model, theta=bubble,
                              qt=lambda x, y, z: 0.015 * jnp.exp(-z / 2000.0))
        for _ in range(5):
            state = ssp_rk3_step(model, state, 4.0)
        aux = diagnose(model, state)
        assert bool(jnp.all(jnp.isfinite(aux.T)))
        assert bool(jnp.all(jnp.isfinite(state.rho_theta)))
