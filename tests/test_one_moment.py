"""1M bulk microphysics tests (reference test/cloud_microphysics_1M.jl pattern)."""

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.model import diagnose, initial_state, make_model
from breeze_tpu.physics.one_moment import OneMomentMicrophysics, one_moment_update
from breeze_tpu.timesteppers import ssp_rk3_step


def cold_grid(nz=24):
    return bz.make_grid(size=(8, 1, nz), extent=(4000.0, 1.0, 10_000.0),
                        topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                        dtype=jnp.float64)


class TestOneMoment:
    def make(self, theta0=300.0, qv0=0.02):
        g = cold_grid()
        model = make_model(g, advection=bz.WENO(5), potential_temperature=theta0,
                          microphysics=OneMomentMicrophysics())
        state = initial_state(model, qt=lambda x, y, z: qv0 * jnp.exp(-z / 2500.0))
        return g, model, state

    def test_warm_condensation_makes_liquid(self):
        g, model, state = self.make(qv0=0.025)
        for _ in range(5):
            state = one_moment_update(model.microphysics, model, state, 10.0)
        assert float(state.tracers["rho_qcl"].max()) > 1e-6
        # warm lower troposphere: no ice at the bottom
        assert float(state.tracers["rho_qci"][0].max()) < 1e-8

    def test_cold_aloft_makes_ice(self):
        g, model, state = self.make(qv0=0.02)
        aux = diagnose(model, state)
        assert float(aux.T[-1].min()) < 235.0, "top should be below homogeneous freezing"
        for _ in range(10):
            state = one_moment_update(model.microphysics, model, state, 10.0)
        qci_top = float(state.tracers["rho_qci"][-8:].max())
        assert qci_top > 1e-8, "cold upper levels should deposit ice"

    def test_autoconversion_produces_precip(self):
        g, model, state = self.make(qv0=0.03)
        for _ in range(30):
            state = one_moment_update(model.microphysics, model, state, 20.0)
        precip = float(state.tracers["rho_qr"].max() + state.tracers["rho_qs"].max())
        assert precip > 1e-7, "heavy condensate should convert to precipitation"

    def test_subsaturated_inert(self):
        # shallow warm domain: subsaturated everywhere (the deep-domain top
        # is cold enough that even tiny qv deposits ice — physical, but not
        # what this test probes)
        g = bz.make_grid(size=(8, 1, 12), extent=(4000.0, 1.0, 2000.0),
                         topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                         dtype=jnp.float64)
        model = make_model(g, potential_temperature=300.0,
                          microphysics=OneMomentMicrophysics())
        state = initial_state(model, qt=jnp.full(g.shape, 0.001))
        s1 = one_moment_update(model.microphysics, model, state, 10.0)
        np.testing.assert_allclose(np.asarray(s1.rho_qt), np.asarray(state.rho_qt),
                                   rtol=1e-10)
        assert float(s1.tracers["rho_qcl"].max()) == 0.0

    def test_full_step_integration(self):
        g, model, state = self.make(qv0=0.022)
        for _ in range(5):
            state = ssp_rk3_step(model, state, 10.0)
        assert bool(jnp.all(jnp.isfinite(state.rho_theta)))
        for name in model.microphysics.prognostic_tracer_names:
            assert float(state.tracers[name].min()) >= 0
