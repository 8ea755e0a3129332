"""Thermodynamics unit tests.

Mirrors the reference's ``test/unit_tests.jl`` + ``test/reference_states.jl``
+ ``test/saturation_adjustment.jl`` patterns: closed-form contracts, inverse
consistency, hydrostatic balance of built profiles.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import breeze_tpu as bz
from breeze_tpu.physics.microphysics import SaturationAdjustment, saturation_adjust
from breeze_tpu.thermo import saturation as sat
from breeze_tpu.thermo import states
from breeze_tpu.thermo.constants import MoistureMassFractions, ThermodynamicConstants
from breeze_tpu.thermo.reference import make_reference_state


CONST = ThermodynamicConstants()


class TestConstants:
    def test_gas_constants(self):
        assert abs(CONST.Rd - 287.0) < 1.0
        assert abs(CONST.Rv - 461.5) < 1.0
        assert abs(CONST.epsilon_dv - 0.622) < 0.002

    def test_mixture_laws(self):
        q = MoistureMassFractions(0.01, 0.002, 1e-5)
        assert abs(q.total - 0.01201) < 1e-12
        Rm = CONST.mixture_gas_constant(q)
        assert Rm > CONST.Rd * (1 - q.total)
        cpm = CONST.mixture_heat_capacity(q)
        assert cpm > CONST.dry_air.heat_capacity

    def test_density_matches_reference_docs(self):
        # Reference doctest (vapor_saturation.jl:60-75): T=288, p=101325 dry
        q = MoistureMassFractions(0.0, 0.0, 0.0)
        rho = CONST.density(288.0, 101325.0, q)
        qvs = sat.saturation_specific_humidity(288.0, rho, CONST, sat.LIQUID_SURFACE)
        np.testing.assert_allclose(float(qvs), 0.010359995391195264, rtol=1e-6)

    def test_latent_heat_linear(self):
        T = 300.0
        L = CONST.liquid_latent_heat(T)
        expected = 2500800.0 + (1850.0 - 4181.0) * (300.0 - 273.15)
        np.testing.assert_allclose(float(L), expected)


class TestSaturation:
    def test_svp_at_triple_point(self):
        p = sat.clausius_clapeyron_svp(jnp.float64(273.16), CONST, sat.LIQUID_SURFACE)
        np.testing.assert_allclose(float(p), 611.657, rtol=1e-6)

    def test_ice_svp_below_liquid(self):
        T = jnp.float64(260.0)
        pl = sat.clausius_clapeyron_svp(T, CONST, sat.LIQUID_SURFACE)
        pi_ = sat.clausius_clapeyron_svp(T, CONST, sat.ICE_SURFACE)
        assert float(pi_) < float(pl)

    def test_flatau_close_to_cc(self):
        # Reference docs: agreement to within ~0.2% over 233-313 K (liquid)
        T = jnp.linspace(235.0, 310.0, 50)
        cc = sat.clausius_clapeyron_svp(T, CONST, sat.LIQUID_SURFACE)
        fl = sat.flatau_svp(T, CONST, sat.LIQUID_SURFACE)
        np.testing.assert_allclose(np.asarray(fl), np.asarray(cc), rtol=5e-3)

    def test_tetens_close_to_cc(self):
        T = jnp.linspace(250.0, 310.0, 30)
        cc = sat.clausius_clapeyron_svp(T, CONST, sat.LIQUID_SURFACE)
        tt = sat.tetens_svp(T, CONST, sat.LIQUID_SURFACE)
        np.testing.assert_allclose(np.asarray(tt), np.asarray(cc), rtol=2e-2)

    def test_mixed_phase_between(self):
        T = jnp.float64(260.0)
        pm = sat.clausius_clapeyron_svp(T, CONST, 0.5)
        pl = sat.clausius_clapeyron_svp(T, CONST, sat.LIQUID_SURFACE)
        pi_ = sat.clausius_clapeyron_svp(T, CONST, sat.ICE_SURFACE)
        assert float(pi_) < float(pm) < float(pl)

    def test_equilibrium_qvs_branches(self):
        T, p = jnp.float64(290.0), jnp.float64(9e4)
        # Unsaturated: tiny qt -> density-based branch
        q_unsat = sat.equilibrium_saturation_specific_humidity(T, p, 0.001, CONST)
        assert float(q_unsat) > 0
        # Just-saturated: qt slightly above qvs -> Pressel eq 37 branch,
        # continuous across the branch switch.
        qt_edge = float(q_unsat) * 1.001
        q_sat = sat.equilibrium_saturation_specific_humidity(T, p, qt_edge, CONST)
        # The two closed forms agree to O(pvs/p) at the branch point
        # (inherent to the reference's formulas too).
        np.testing.assert_allclose(float(q_sat), float(q_unsat), rtol=2e-2)


class TestStates:
    def test_theta_T_roundtrip(self):
        q = MoistureMassFractions(0.008, 0.001, 0.0)
        p = jnp.float64(8.5e4)
        theta = jnp.float64(300.0)
        T = states.temperature_from_theta_li(theta, q, p, CONST)
        theta_back = states.theta_li_from_temperature(T, q, p, CONST)
        np.testing.assert_allclose(float(theta_back), 300.0, rtol=1e-12)

    def test_dry_theta_equals_T_at_standard_pressure(self):
        q = MoistureMassFractions(0.0, 0.0, 0.0)
        T = states.temperature_from_theta_li(jnp.float64(288.0), q, jnp.float64(1e5), CONST)
        np.testing.assert_allclose(float(T), 288.0, rtol=1e-12)

    def test_static_energy_roundtrip(self):
        q = MoistureMassFractions(0.01, 0.002, 0.0)
        e = states.static_energy(jnp.float64(285.0), 1500.0, q, CONST)
        T = states.temperature_from_static_energy(e, 1500.0, q, CONST)
        np.testing.assert_allclose(float(T), 285.0, rtol=1e-12)


class TestReferenceState:
    def grid(self):
        return bz.make_grid(size=(1, 1, 160), x=(0, 1), y=(0, 1), z=(0, 12000.0),
                            topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                            dtype=jnp.float64)

    def test_adiabatic_lapse_rate(self):
        # T_r(z) = θ₀ − (g/cᵖ) z  (reference docs thermodynamics.md:243-249)
        g = self.grid()
        ref = make_reference_state(g, CONST, potential_temperature=288.0)
        z = np.asarray(g.z_c)
        T0 = 288.0 * (101325.0 / 1e5) ** (CONST.Rd / CONST.dry_air.heat_capacity)
        expected = T0 - CONST.gravitational_acceleration / CONST.dry_air.heat_capacity * z
        np.testing.assert_allclose(np.asarray(ref.T_c), expected, rtol=1e-10)

    def test_continuous_hydrostatic_balance(self):
        g = self.grid()
        ref = make_reference_state(g, CONST, potential_temperature=288.0)
        p = np.asarray(ref.p_c)
        rho = np.asarray(ref.rho_c)
        dz = float(g.dz_c[0])
        dpdz = (p[2:] - p[:-2]) / (2 * dz)
        rho_mid = rho[1:-1]
        np.testing.assert_allclose(dpdz, -CONST.gravitational_acceleration * rho_mid,
                                   rtol=2e-4)

    def test_discrete_hydrostatic_balance(self):
        # Rest-state contract T1 (reference test/substepper_rest_state.jl:1-27)
        g = self.grid()
        ref = make_reference_state(g, CONST, potential_temperature=288.0,
                                   discrete_hydrostatic_balance=True)
        p = np.asarray(ref.p_c)
        rho_f = np.asarray(ref.rho_f)
        dz_f = np.asarray(g.dz_f)
        res = (p[1:] - p[:-1]) / dz_f[1:-1] + CONST.gravitational_acceleration * rho_f[1:-1]
        np.testing.assert_allclose(res, 0.0, atol=1e-9)

    def test_theta_profile_function(self):
        g = self.grid()
        theta_fn = lambda z: 288.0 + 3e-3 * z
        ref = make_reference_state(g, CONST, potential_temperature=theta_fn)
        # Pressure decreases monotonically, density positive
        p = np.asarray(ref.p_c)
        assert np.all(np.diff(p) < 0)
        assert np.all(np.asarray(ref.rho_c) > 0)
        # Hydrostatic check
        rho = np.asarray(ref.rho_c)
        dz = float(g.dz_c[0])
        dpdz = (p[2:] - p[:-2]) / (2 * dz)
        np.testing.assert_allclose(dpdz, -CONST.gravitational_acceleration * rho[1:-1],
                                   rtol=2e-3)


class TestSaturationAdjustment:
    def test_unsaturated_no_condensate(self):
        scheme = SaturationAdjustment(equilibrium=sat.WarmPhaseEquilibrium())
        theta = jnp.full((4, 4, 4), 300.0)
        qt = jnp.full((4, 4, 4), 0.001)
        p = jnp.full((4, 4, 4), 1e5)
        T, q = saturation_adjust(theta, qt, p, CONST, scheme)
        np.testing.assert_allclose(np.asarray(q.liquid), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(q.vapor), 0.001, rtol=1e-10)

    def test_saturated_partitions_and_warms(self):
        scheme = SaturationAdjustment(equilibrium=sat.WarmPhaseEquilibrium())
        theta = jnp.full((2, 2, 2), 285.0)
        qt = jnp.full((2, 2, 2), 0.02)     # well above qsat at 285 K
        p = jnp.full((2, 2, 2), 1e5)
        T, q = saturation_adjust(theta, qt, p, CONST, scheme)
        ql = float(np.asarray(q.liquid)[0, 0, 0])
        assert ql > 1e-4, "supersaturated state must condense"
        # Latent heating: T exceeds the no-condensate temperature
        T_dry = states.temperature_from_theta_li(
            285.0, MoistureMassFractions.vapor_only(jnp.float64(0.02)), 1e5, CONST)
        assert float(np.asarray(T)[0, 0, 0]) > float(T_dry)
        # Residual closed: T = T(theta, q_eq(T))
        T_back = states.temperature_from_theta_li(285.0, MoistureMassFractions(
            q.vapor, q.liquid, q.ice), 1e5, CONST)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T_back), rtol=1e-6)

    def test_mixed_phase_makes_ice_when_cold(self):
        scheme = SaturationAdjustment(equilibrium=sat.MixedPhaseEquilibrium())
        theta = jnp.full((2, 2, 2), 250.0)
        qt = jnp.full((2, 2, 2), 0.01)
        p = jnp.full((2, 2, 2), 1e5)
        T, q = saturation_adjust(theta, qt, p, CONST, scheme)
        assert float(np.asarray(q.ice)[0, 0, 0]) > 0

    @pytest.mark.parametrize("equilibrium", [sat.WarmPhaseEquilibrium(),
                                             sat.MixedPhaseEquilibrium()])
    def test_newton_matches_secant(self, equilibrium):
        """Default Newton-3 agrees with a converged secant across
        LES-realistic states (supersaturations up to 1.3×qsat): p99 within
        the reference SecantSolver abstol=1e-4 K
        (saturation_adjustment.jl:50), worst case below f32 rounding of T
        (~2e-3 K ≈ 50 ulps at 300 K)."""
        from breeze_tpu.thermo.states import temperature_from_theta_li
        rng = np.random.default_rng(7)
        n = 8192
        theta = jnp.asarray(rng.uniform(270.0, 315.0, n))
        p = jnp.asarray(rng.uniform(5e4, 1.02e5, n))
        T0 = temperature_from_theta_li(
            theta, MoistureMassFractions.vapor_only(jnp.zeros(n)), p, CONST)
        pvs = sat.saturation_vapor_pressure(T0, CONST)
        qs_col = 0.622 * pvs / (p - pvs)
        qt = jnp.asarray(rng.uniform(0.3, 1.3, n)) * qs_col
        newton = SaturationAdjustment(equilibrium=equilibrium)
        secant = SaturationAdjustment(equilibrium=equilibrium,
                                      iterations=14, solver="secant")
        Tn, qn = saturation_adjust(theta, qt, p, CONST, newton)
        Ts, qs = saturation_adjust(theta, qt, p, CONST, secant)
        d = np.abs(np.asarray(Tn) - np.asarray(Ts))
        assert np.percentile(d, 99) < 1e-4, np.percentile(d, 99)
        assert d.max() < 2e-3, d.max()
        np.testing.assert_allclose(np.asarray(qn.liquid),
                                   np.asarray(qs.liquid), atol=2e-6)


class TestHydrostaticPressureDiagnostic:
    def test_matches_reference_column_at_rest(self):
        """At rest with the reference θ, the diagnosed hydrostatic pressure
        matches the reference pressure column (reference
        compute_hydrostatic_pressure.jl contract)."""
        import breeze_tpu as bz
        from breeze_tpu.diagnostics import hydrostatic_pressure
        from breeze_tpu.model import initial_state, make_model
        g = bz.make_grid(size=(4, 1, 64), extent=(400.0, 1.0, 10e3),
                         topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                         dtype=jnp.float64)
        model = make_model(g, potential_temperature=300.0)
        state = initial_state(model, theta=lambda x, y, z: 300.0 + 0.0 * z)
        p_h = np.asarray(hydrostatic_pressure(model, state))
        p_ref = np.asarray(model.reference.p_c)
        rel = np.abs(p_h[:, 0, 0] - p_ref) / p_ref
        assert rel.max() < 2e-3, rel.max()
        # monotonically decreasing with height
        assert (np.diff(p_h[:, 0, 0]) < 0).all()
