"""2M (Seifert-Beheng family) microphysics tests (reference
test/cloud_microphysics_2M.jl + test/number_concentration.jl patterns)."""

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.model import diagnose, initial_state, make_model
from breeze_tpu.physics.two_moment import TwoMomentMicrophysics, two_moment_update
from breeze_tpu.timesteppers import ssp_rk3_step


def warm_grid():
    return bz.make_grid(size=(8, 1, 16), extent=(4000.0, 1.0, 3000.0),
                        topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                        dtype=jnp.float64)


class TestTwoMoment:
    def make(self, qv0=0.02):
        g = warm_grid()
        model = make_model(g, advection=bz.WENO(5), potential_temperature=300.0,
                          microphysics=TwoMomentMicrophysics())
        state = initial_state(model, qt=lambda x, y, z: qv0 * jnp.exp(-z / 2000.0))
        return g, model, state

    def test_activation_creates_droplets(self):
        g, model, state = self.make(qv0=0.025)
        s1, = (two_moment_update(model.microphysics, model, state, 10.0),)
        assert float(s1.tracers["rho_ncl"].max()) > 0, "supersaturation activates CCN"
        assert float(s1.tracers["rho_qcl"].max()) > 0

    def test_subsaturated_inert(self):
        g, model, state = self.make(qv0=0.002)
        s1 = two_moment_update(model.microphysics, model, state, 10.0)
        np.testing.assert_allclose(np.asarray(s1.rho_qt), np.asarray(state.rho_qt),
                                   rtol=1e-12)
        assert float(s1.tracers["rho_ncl"].max()) == 0.0

    def test_autoconversion_forms_rain_with_numbers(self):
        g, model, state = self.make(qv0=0.03)
        for _ in range(40):
            state = two_moment_update(model.microphysics, model, state, 10.0)
        qr = float(state.tracers["rho_qr"].max())
        nr = float(state.tracers["rho_nr"].max())
        assert qr > 1e-8, "rain mass should form"
        assert nr > 0, "rain number should form with the mass"

    def test_no_orphan_numbers(self):
        g, model, state = self.make(qv0=0.02)
        for _ in range(10):
            state = two_moment_update(model.microphysics, model, state, 10.0)
        qcl = np.asarray(state.tracers["rho_qcl"])
        ncl = np.asarray(state.tracers["rho_ncl"])
        assert np.all(ncl[qcl <= 1e-12 * np.max(qcl + 1e-30)] == 0.0)

    def test_full_model_integration(self):
        g, model, state = self.make(qv0=0.022)
        for _ in range(5):
            state = ssp_rk3_step(model, state, 10.0)
        assert bool(jnp.all(jnp.isfinite(state.rho_theta)))
        aux = diagnose(model, state)
        assert bool(jnp.all(jnp.isfinite(aux.T)))
