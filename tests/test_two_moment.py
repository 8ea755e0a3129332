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


class TestSB2006RatePinning:
    """Pin the SB2006 process rates at hand-computed parameter values
    (Seifert & Beheng 2006 Eqs. 4-13; the CloudMicrophysics.jl SB2006
    parameter set the reference delegates to)."""

    def _model(self, nz=4, dz=1000.0):
        import breeze_tpu as bz
        from breeze_tpu.model import make_model
        from breeze_tpu.physics.two_moment import TwoMomentMicrophysics
        g = bz.make_grid(size=(4, 1, nz), extent=(4000.0, 1.0, nz * dz),
                         topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                         dtype=jnp.float64)
        mp = TwoMomentMicrophysics()
        model = make_model(g, advection=bz.Centered(2),
                           potential_temperature=300.0, microphysics=mp)
        return g, mp, model

    def _saturated_state(self, model, qcl, qr, ncl, nr):
        """State with qv == qvs (cond = 0, rain evap off) and uniform
        hydrometeors; returns (state, rho, per-mass fields)."""
        import jax.numpy as jnp
        from breeze_tpu.model import initial_state
        from breeze_tpu.thermo.saturation import saturation_specific_humidity
        from breeze_tpu.thermo.states import temperature_from_theta_li
        from breeze_tpu.thermo.constants import MoistureMassFractions
        g, c = model.grid, model.constants
        rho = jnp.broadcast_to(model.reference.rho_col, g.shape)
        p = jnp.broadcast_to(model.reference.p_col, g.shape)
        theta = 300.0 * jnp.ones(g.shape)
        qv = 0.010 * jnp.ones(g.shape)
        for _ in range(30):   # fixed-point: qv -> qvs(T(qv))
            q = MoistureMassFractions(qv, (qcl + qr) * jnp.ones(g.shape),
                                      jnp.zeros(g.shape))
            T = temperature_from_theta_li(theta, q, p, c, model.p_standard)
            qv = saturation_specific_humidity(T, rho, c, 1.0)
        state = initial_state(model, theta=theta, qt=qv)
        tr = dict(state.tracers)
        tr["rho_qcl"] = rho * qcl
        tr["rho_qr"] = rho * qr
        tr["rho_ncl"] = rho * ncl
        tr["rho_nr"] = rho * nr
        state = state.replace(tracers=tr)
        return state, rho

    def _rates(self, model, mp, state, rho, dt=1e-3):
        from breeze_tpu.physics.two_moment import two_moment_update
        out = two_moment_update(mp, model, state, dt)
        d = {}
        for k in ("rho_qcl", "rho_qr", "rho_ncl", "rho_nr"):
            d[k] = np.asarray((out.tracers[k] - state.tracers[k]) / (rho * dt))
        d["rho_qt"] = np.asarray((out.rho_qt - state.rho_qt) / (rho * dt))
        return d

    def test_autoconversion_rate_pinned(self):
        g, mp, model = self._model()
        qcl, ncl = 1.0e-3, 1.0e-3 / 2.0e-11     # x̄c = 2e-11 kg
        state, rho = self._saturated_state(model, qcl, 0.0, ncl, 0.0)
        # dt large enough that the fresh rain mass exceeds the orphan-number
        # clamp threshold (qr > 1e-12) yet small vs the process timescales
        d = self._rates(model, mp, state, rho, dt=1e-2)
        rho0 = np.asarray(rho)[1, 0, 0]
        nu = mp.nu_cloud
        # τ -> 0 (no rain): φau -> 0, pure SB2006 Eq. 4 base rate
        exp_au = (4.44e9 / (20.0 * 2.6e-10) * (nu + 2) * (nu + 4)
                  / (nu + 1) ** 2 * qcl ** 2 * (2.0e-11) ** 2 * rho0)
        np.testing.assert_allclose(d["rho_qr"][1, 0, 0], exp_au, rtol=2e-2)
        # number budgets: dNr = au/x*, dNcl = -2 au/x* - cloud self-collection
        np.testing.assert_allclose(d["rho_nr"][1, 0, 0], exp_au / 2.6e-10,
                                   rtol=2e-2)
        exp_sc_c = 4.44e9 * (nu + 2) / (nu + 1) * qcl ** 2 * rho0
        np.testing.assert_allclose(-d["rho_ncl"][1, 0, 0],
                                   2 * exp_au / 2.6e-10 + exp_sc_c, rtol=5e-2)

    def test_accretion_rate_pinned(self):
        g, mp, model = self._model()
        qcl, qr = 0.5e-3, 0.5e-3                 # τ = 1/2
        ncl = qcl / 2.0e-11
        nr = qr / 5.0e-8
        state, rho = self._saturated_state(model, qcl, qr, ncl, nr)
        d = self._rates(model, mp, state, rho)
        rho0 = np.asarray(rho)[1, 0, 0]
        tau = 0.5
        phi_ac = (tau / (tau + 5e-5)) ** 4
        exp_ac = 5.25 * qcl * qr * rho0 * phi_ac * np.sqrt(1.225 / rho0)
        # total rain-mass source = au + ac; au(x̄c=2e-11) is ~1e-2 of ac here
        got = d["rho_qr"][1, 0, 0]
        assert abs(got - exp_ac) / exp_ac < 0.05, (got, exp_ac)

    def test_breakup_reverses_self_collection(self):
        """Small rain drops: Nr decreases (self-collection); beyond the
        equilibrium diameter breakup wins and Nr increases (SB2006 Eq. 13)."""
        g, mp, model = self._model()
        qr = 1.0e-3
        # small drops: x̄ = 1e-9 kg -> D ~ 0.12 mm < 0.35 mm -> phi = -1
        state, rho = self._saturated_state(model, 0.0, qr, 0.0, qr / 1.0e-9)
        d_small = self._rates(model, mp, state, rho)
        rho0 = np.asarray(rho)[1, 0, 0]
        exp_sc = -7.12 * (qr / 1.0e-9) * qr * rho0 * np.sqrt(1.225 / rho0)
        np.testing.assert_allclose(d_small["rho_nr"][1, 0, 0], exp_sc,
                                   rtol=5e-2)
        # large drops: x̄ = 2e-6 kg -> D ~ 1.56 mm > Deq -> breakup wins
        state, rho = self._saturated_state(model, 0.0, qr, 0.0, qr / 2.0e-6)
        d_large = self._rates(model, mp, state, rho)
        assert d_large["rho_nr"][1, 0, 0] > 0.0, "breakup must add drops"

    def test_rogers_fall_speeds(self):
        """SB2006VelType sedimentation: mass-weighted faster than
        number-weighted; both below the Rogers asymptote aR."""
        # shallow domain: ρ(z) variation ~2% so the interior sedimentation
        # budget cancels to that accuracy
        g, mp, model = self._model(nz=4, dz=50.0)
        qr = 1.0e-3
        nr = qr / 5.0e-7                          # x̄ = 5e-7 kg, D ~ 1 mm
        state, rho = self._saturated_state(model, 0.0, qr, 0.0, nr)
        dt = 0.5
        from breeze_tpu.physics.two_moment import two_moment_update
        out = two_moment_update(mp, model, state, dt)
        # with uniform fields the sedimentation budget cancels everywhere
        # except the TOP cell (zero inflow): its extra loss relative to an
        # interior cell is flux/dz = v q / dz.  Microphysical sources are
        # uniform, so the difference isolates sedimentation.
        qr0 = np.asarray(state.tracers["rho_qr"])
        qr1 = np.asarray(out.tracers["rho_qr"])
        nr0 = np.asarray(state.tracers["rho_nr"])
        nr1 = np.asarray(out.tracers["rho_nr"])
        lam = (np.pi * 1000.0 / 5.0e-7) ** (1.0 / 3.0)
        rho_np = np.asarray(rho)
        corr = np.sqrt(1.225 / rho_np[-1, 0, 0])
        v_q = corr * (9.65 - 10.3 * (1 + 600.0 / lam) ** -4.0)
        v_N = corr * (9.65 - 10.3 * (1 + 600.0 / lam) ** -1.0)
        assert v_q > v_N > 0
        dq = qr1 - qr0
        dN = nr1 - nr0
        loss_q = (dq[1, 0, 0] - dq[-1, 0, 0]) / dt
        loss_N = (dN[1, 0, 0] - dN[-1, 0, 0]) / dt
        np.testing.assert_allclose(loss_q, qr0[-1, 0, 0] * v_q / 50.0,
                                   rtol=0.06)
        np.testing.assert_allclose(loss_N, nr0[-1, 0, 0] * v_N / 50.0,
                                   rtol=0.06)
