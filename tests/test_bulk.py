"""Standalone bulk-microphysics options: NonEquilibriumCloudFormation +
ConstantRateCondensateFormation (reference
``src/Microphysics/bulk_microphysics.jl:44-173``)."""

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.model import diagnose, initial_state, make_model
from breeze_tpu.physics.bulk import (ConstantRateCondensateFormation,
                                     NonEquilibriumCloudFormation)
from breeze_tpu.physics.microphysics import (SaturationAdjustment,
                                             saturation_adjust)
from breeze_tpu.timesteppers import ssp_rk3_step


def moist_grid(n=8, nz=16):
    return bz.make_grid(size=(n, 1, nz), extent=(4000.0, 1.0, 4000.0),
                        topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                        dtype=jnp.float64)


def model_state(scheme, qv0=0.02):
    g = moist_grid()
    model = make_model(g, advection=bz.WENO(5), potential_temperature=300.0,
                       microphysics=scheme)
    state = initial_state(model, theta=300.0,
                          qt=lambda x, y, z: qv0 * jnp.exp(-z / 2500.0))
    return g, model, state


class TestNonEquilibriumCloudFormation:
    def test_tracer_names_warm_and_mixed(self):
        warm = NonEquilibriumCloudFormation()
        assert warm.prognostic_tracer_names == ("rho_qcl",)
        assert warm.ice_tracer_names == ()
        mixed = NonEquilibriumCloudFormation(
            ice=ConstantRateCondensateFormation(0.05))
        assert mixed.prognostic_tracer_names == ("rho_qcl", "rho_qci")
        assert mixed.correction_tracer_chain == ("rho_qci", "rho_qcl")

    def test_supersaturation_relaxes_toward_adjustment(self):
        # Repeated tau-scale updates must converge on the saturation-adjusted
        # partition (the relaxation fixed point, bulk_microphysics.jl:115-131).
        scheme = NonEquilibriumCloudFormation(
            liquid=ConstantRateCondensateFormation(rate=0.1))
        g, model, state = model_state(scheme, qv0=0.03)
        qt0 = state.rho_qt + state.tracers["rho_qcl"]
        for _ in range(30):
            state = scheme.model_update(model, state, 10.0)
        # closed moisture budget through all the phase changes
        qt1 = state.rho_qt + state.tracers["rho_qcl"]
        np.testing.assert_allclose(np.asarray(qt1), np.asarray(qt0),
                                   rtol=1e-12)
        # converged partition: supersaturation fully removed wrt the
        # density-based qᵛ⁺ the relaxation targets (the reference 1M
        # saturation measure, vapor_saturation.jl:93-105) — the fixed
        # point of the MG2008 rate, distinct from the pressure-based
        # saturated branch saturation_adjust solves.
        from breeze_tpu.thermo.constants import MoistureMassFractions
        from breeze_tpu.thermo.saturation import saturation_specific_humidity
        from breeze_tpu.thermo.states import temperature_from_theta_li
        rho = model.reference.rho_col
        qv = state.rho_qt / rho
        qcl = state.tracers["rho_qcl"] / rho
        T = temperature_from_theta_li(
            state.rho_theta / rho,
            MoistureMassFractions(qv, qcl, jnp.zeros_like(qv)),
            model.reference.p_col, model.constants, model.p_standard)
        qvs = saturation_specific_humidity(T, rho, model.constants, 1.0)
        sat_excess = np.asarray(jnp.where(qcl > 1e-7, qv - qvs, 0.0))
        np.testing.assert_allclose(sat_excess, 0.0, atol=1e-7)
        assert float(qcl.max()) > 1e-4
        # and it lands within 15% of the pressure-based adjustment
        T2, q2 = saturation_adjust(state.rho_theta / rho, qt1 / rho,
                                   model.reference.p_col, model.constants,
                                   SaturationAdjustment())
        np.testing.assert_allclose(np.asarray(qcl), np.asarray(q2.liquid),
                                   rtol=0.15)

    def test_theta_li_invariant(self):
        scheme = NonEquilibriumCloudFormation()
        g, model, state = model_state(scheme, qv0=0.03)
        s1 = scheme.model_update(model, state, 100.0)
        np.testing.assert_allclose(np.asarray(s1.rho_theta),
                                   np.asarray(state.rho_theta), rtol=1e-13)

    def test_evaporation_limited_by_condensate(self):
        # subsaturated air with a little cloud: evaporation never drives
        # qcl negative, and vapor grows by exactly what evaporated
        scheme = NonEquilibriumCloudFormation()
        g, model, state = model_state(scheme, qv0=0.001)
        tr = dict(state.tracers)
        rho = model.reference.rho_col
        tr["rho_qcl"] = jnp.full(g.shape, 1e-5) * rho
        state = state.replace(tracers=tr)
        s1 = state
        for _ in range(25):   # each clamped update removes ~1/Γ (Γ≈4 at 300 K)
            s1 = scheme.model_update(model, s1, 1e4)
        assert float(s1.tracers["rho_qcl"].min()) >= 0.0
        np.testing.assert_allclose(
            np.asarray(s1.rho_qt + s1.tracers["rho_qcl"]),
            np.asarray(state.rho_qt + state.tracers["rho_qcl"]), rtol=1e-12)
        # the subsaturated column evaporates essentially all of it
        assert float((s1.tracers["rho_qcl"] / rho).max()) < 2e-7

    def test_mixed_phase_deposition_below_freezing(self):
        scheme = NonEquilibriumCloudFormation(
            ice=ConstantRateCondensateFormation(0.1))
        g = moist_grid()
        model = make_model(g, advection=bz.WENO(5),
                           potential_temperature=250.0, microphysics=scheme)
        state = initial_state(model, theta=250.0,
                              qt=jnp.full(g.shape, 0.004))

        def total(s):
            return (s.rho_qt + s.tracers["rho_qcl"]
                    + s.tracers["rho_qci"])

        qt0 = total(state)
        for _ in range(10):
            state = scheme.model_update(model, state, 10.0)
        assert float(state.tracers["rho_qci"].max()) > 0.0
        assert float(state.tracers["rho_qci"].min()) >= 0.0
        # mixed-phase moisture budget closed (cond + dep compete for the
        # same vapor; positive increments rescaled, never minted)
        np.testing.assert_allclose(np.asarray(total(state)),
                                   np.asarray(qt0), rtol=1e-12)

    def test_mixed_phase_overdraw_conserves(self):
        # Cold + moist + dt >> tau: condensation AND deposition both want
        # more vapor than exists.  Before the proportional rescale this
        # step CREATED ~90% of the column moisture.
        scheme = NonEquilibriumCloudFormation(
            liquid=ConstantRateCondensateFormation(0.1),
            ice=ConstantRateCondensateFormation(0.1))
        g = moist_grid()
        model = make_model(g, advection=bz.WENO(5),
                           potential_temperature=233.0, microphysics=scheme)
        state = initial_state(model, theta=233.0,
                              qt=jnp.full(g.shape, 0.003))
        qt0 = (state.rho_qt + state.tracers["rho_qcl"]
               + state.tracers["rho_qci"])
        s1 = scheme.model_update(model, state, 100.0)
        qt1 = (s1.rho_qt + s1.tracers["rho_qcl"] + s1.tracers["rho_qci"])
        np.testing.assert_allclose(np.asarray(qt1), np.asarray(qt0),
                                   rtol=1e-12)
        assert float(s1.rho_qt.min()) >= 0.0

    def test_negative_rho_qt_carried_through(self):
        # An advection undershoot (negative incoming rho_qt) must not be
        # erased by the update — repair belongs to the correction chain.
        scheme = NonEquilibriumCloudFormation()
        g, model, state = model_state(scheme, qv0=0.001)
        neg = state.rho_qt.at[0, 0, 0].set(-1e-6)
        state = state.replace(rho_qt=neg)
        qt0 = state.rho_qt + state.tracers["rho_qcl"]
        s1 = scheme.model_update(model, state, 10.0)
        qt1 = s1.rho_qt + s1.tracers["rho_qcl"]
        np.testing.assert_allclose(np.asarray(qt1), np.asarray(qt0),
                                   rtol=1e-12)
        assert float(s1.rho_qt[0, 0, 0]) < 0.0

    def test_zero_rate_is_inert_phase_indicator(self):
        # reference: condensate_formation_from_option(::Nothing) builds a
        # zero-rate instance; it must construct and do exactly nothing.
        scheme = NonEquilibriumCloudFormation(
            liquid=ConstantRateCondensateFormation(rate=0.0))
        assert scheme.liquid.tau_relax == float("inf")
        g, model, state = model_state(scheme, qv0=0.03)
        s1 = scheme.model_update(model, state, 100.0)
        np.testing.assert_allclose(np.asarray(s1.rho_qt),
                                   np.asarray(state.rho_qt), rtol=0)
        np.testing.assert_allclose(np.asarray(s1.tracers["rho_qcl"]),
                                   np.asarray(state.tracers["rho_qcl"]),
                                   rtol=0)

    def test_runs_inside_rk3_step(self):
        scheme = NonEquilibriumCloudFormation()
        g, model, state = model_state(scheme, qv0=0.02)
        s1 = ssp_rk3_step(model, state, 1.0)
        total0 = float((state.rho_qt + state.tracers["rho_qcl"]).sum())
        total1 = float((s1.rho_qt + s1.tracers["rho_qcl"]).sum())
        np.testing.assert_allclose(total1, total0, rtol=1e-10)
        assert np.isfinite(np.asarray(s1.rho_u)).all()

    def test_constant_rate_timescale_roundtrip(self):
        f = ConstantRateCondensateFormation(rate=0.02)
        np.testing.assert_allclose(f.tau_relax, 50.0)
