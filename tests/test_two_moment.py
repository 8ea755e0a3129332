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


class TestARGActivation:
    """ARG2000 κ-Köhler activation (reference AerosolActivation +
    max_supersaturation_breeze, cloud_microphysics_translations.jl:592)."""

    def _env(self):
        from breeze_tpu.physics.one_moment import AirProperties
        from breeze_tpu.thermo.constants import (MoistureMassFractions,
                                                 ThermodynamicConstants)
        c = ThermodynamicConstants()
        T = jnp.asarray(283.0)
        p = jnp.asarray(90000.0)
        rho = p / (c.Rd * T)
        q = MoistureMassFractions(jnp.asarray(0.0077), jnp.asarray(0.0),
                                  jnp.asarray(0.0))
        return c, AirProperties(), T, p, rho, q

    def test_smax_monotone_in_updraft_and_physical_range(self):
        from breeze_tpu.physics.two_moment import (AerosolActivation,
                                                   AerosolMode,
                                                   arg_max_supersaturation)
        aa = AerosolActivation(modes=(AerosolMode(N=100e6),))
        c, air, T, p, rho, q = self._env()
        smaxes = []
        for w in (0.1, 0.5, 1.0, 3.0):
            smax, _ = arg_max_supersaturation(aa, air, rho, jnp.asarray(w),
                                              T, p, q, jnp.asarray(0.0), c)
            smaxes.append(float(smax))
        assert smaxes == sorted(smaxes)
        # published ARG2000 range: ~0.1-1.5% for marine aerosol
        assert 5e-4 < smaxes[0] < 5e-3
        assert 3e-3 < smaxes[-1] < 2e-2

    def test_aerosol_competition_lowers_smax(self):
        from breeze_tpu.physics.two_moment import (AerosolActivation,
                                                   AerosolMode,
                                                   arg_max_supersaturation)
        c, air, T, p, rho, q = self._env()
        w = jnp.asarray(1.0)
        s_low, _ = arg_max_supersaturation(
            AerosolActivation(modes=(AerosolMode(N=100e6),)), air, rho, w,
            T, p, q, jnp.asarray(0.0), c)
        s_high, _ = arg_max_supersaturation(
            AerosolActivation(modes=(AerosolMode(N=1000e6),)), air, rho, w,
            T, p, q, jnp.asarray(0.0), c)
        assert float(s_high) < float(s_low)

    def test_existing_droplets_suppress_smax_korolev_mazin(self):
        from breeze_tpu.physics.two_moment import (AerosolActivation,
                                                   AerosolMode,
                                                   arg_max_supersaturation)
        from breeze_tpu.thermo.constants import MoistureMassFractions
        aa = AerosolActivation(modes=(AerosolMode(N=100e6),))
        c, air, T, p, rho, q = self._env()
        w = jnp.asarray(1.0)
        s0, _ = arg_max_supersaturation(aa, air, rho, w, T, p, q,
                                        jnp.asarray(0.0), c)
        q_cloudy = MoistureMassFractions(q.vapor, jnp.asarray(5e-4),
                                         jnp.asarray(0.0))
        s1, _ = arg_max_supersaturation(aa, air, rho, w, T, p, q_cloudy,
                                        jnp.asarray(50e6), c)
        assert float(s1) < float(s0)

    def test_no_updraft_no_activation(self):
        from breeze_tpu.physics.two_moment import (AerosolActivation,
                                                   AerosolMode,
                                                   arg_max_supersaturation)
        aa = AerosolActivation(modes=(AerosolMode(N=100e6),))
        c, air, T, p, rho, q = self._env()
        s, _ = arg_max_supersaturation(aa, air, rho, jnp.asarray(-0.5),
                                       T, p, q, jnp.asarray(0.0), c)
        assert float(s) == 0.0

    def test_activated_fraction_saturates_to_one(self):
        from breeze_tpu.physics.two_moment import (AerosolActivation,
                                                   AerosolMode,
                                                   arg_activated_fraction)
        aa = AerosolActivation(modes=(AerosolMode(N=100e6),))
        A = jnp.asarray(1.2e-9)
        assert float(arg_activated_fraction(aa, jnp.asarray(0.5), A)) > 0.99
        assert float(arg_activated_fraction(aa, jnp.asarray(1e-7), A)) < 0.01

    def test_thermal_with_arg_activation_bounded_by_aerosol(self):
        """Rising moist thermal: cloud forms, N_cl bounded by the aerosol
        reservoir (150/cm³)."""
        import jax
        from breeze_tpu.model import initial_state, make_model
        from breeze_tpu.timesteppers import ssp_rk3_step
        from breeze_tpu.physics.two_moment import (AerosolActivation,
                                                   AerosolMode,
                                                   TwoMomentMicrophysics)
        g = bz.make_grid(size=(32, 1, 40), extent=(6400.0, 1.0, 4000.0),
                         topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED))
        mp = TwoMomentMicrophysics(activation=AerosolActivation(
            modes=(AerosolMode(N=150e6, r_dry=0.05e-6, stdev=2.0,
                               kappa=0.53),)))
        model = make_model(g, advection=bz.WENO(5),
                           potential_temperature=300.0, microphysics=mp)
        state = initial_state(
            model,
            theta=lambda x, y, z: 300.0 + 2.0 * jnp.exp(
                -((x - 3200.) ** 2 / 500. ** 2 + (z - 800.) ** 2 / 400. ** 2)),
            qt=lambda x, y, z: 0.016 * jnp.exp(-z / 2000.))
        step = jax.jit(lambda s: ssp_rk3_step(model, s, 2.0))
        for _ in range(150):
            state = step(state)
        ncl = np.asarray(state.tracers["rho_ncl"])
        qcl = np.asarray(state.tracers["rho_qcl"])
        assert np.isfinite(ncl).all() and np.isfinite(qcl).all()
        assert qcl.max() > 1e-5
        assert 1e6 < ncl.max() < 165e6
