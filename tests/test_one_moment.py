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


# ---------------------------------------------------------------------------
# CloudMicrophysics-parity rate verification: every closed-form
# gamma-integral rate is checked against direct numerical quadrature of the
# exponential size distribution (reference rates documented in
# ext/BreezeCloudMicrophysicsExt/cloud_microphysics_translations.jl and the
# CloudMicrophysics.jl 1M docs).
# ---------------------------------------------------------------------------

import math

from breeze_tpu.physics.one_moment import (
    AirProperties,
    CloudIceParams,
    RainParams,
    SnowParams,
    accretion,
    accretion_between_precip,
    accretion_rain_sink,
    diffusional_growth_factor,
    lambda_inverse,
    rain_evaporation,
    terminal_velocity,
    _process_rates,
)
from breeze_tpu.thermo.constants import (
    MoistureMassFractions,
    ThermodynamicConstants,
)
from breeze_tpu.thermo.saturation import supersaturation

RHO = 1.1
G0 = 9.81


def _dsd(params, q, rho, n_pts=300_000, span=60.0):
    """(r, n(r)) sampled over the exponential DSD."""
    lam_inv = float(lambda_inverse(params, jnp.float64(q), RHO))
    r = np.linspace(1e-9, span * lam_inv, n_pts)
    n0 = float(params.n0_of(jnp.float64(q), rho))
    return r, n0 * np.exp(-r / lam_inv)


def _powerlaw(x0, e, r0, r):
    return x0 * (r / r0) ** e


class TestQuadratureParity:
    def test_rain_terminal_velocity(self):
        rain = RainParams()
        q = 1e-3
        r, n = _dsd(rain, q, RHO)
        m = _powerlaw(rain.mass.m0, rain.mass.me, rain.mass.r0, r)
        v0 = math.sqrt(8.0 / (3.0 * rain.C_drag)
                       * (rain.rho_w / RHO - 1.0) * G0 * rain.mass.r0)
        v = _powerlaw(v0, rain.ve, rain.mass.r0, r)
        expected = np.trapezoid(m * v * n, r) / np.trapezoid(m * n, r)
        got = float(terminal_velocity(rain, jnp.float64(q), RHO, G0))
        np.testing.assert_allclose(got, expected, rtol=1e-4)
        assert 3.0 < got < 10.0  # physical rain fall speed

    def test_snow_terminal_velocity(self):
        snow = SnowParams()
        q = 1e-3
        r, n = _dsd(snow, q, RHO)
        m = _powerlaw(snow.mass.m0, snow.mass.me, snow.mass.r0, r)
        v = _powerlaw(snow.v0, snow.ve, snow.mass.r0, r)
        expected = np.trapezoid(m * v * n, r) / np.trapezoid(m * n, r)
        got = float(terminal_velocity(snow, jnp.float64(q), RHO, G0))
        np.testing.assert_allclose(got, expected, rtol=1e-4)
        assert 0.3 < got < 3.0  # physical snow fall speed

    def test_accretion_liquid_rain(self):
        rain = RainParams()
        qc, qr = 5e-4, 1e-3
        r, n = _dsd(rain, qr, RHO)
        a = _powerlaw(rain.area.a0, rain.area.ae, rain.mass.r0, r)
        v0 = math.sqrt(8.0 / (3.0 * rain.C_drag)
                       * (rain.rho_w / RHO - 1.0) * G0 * rain.mass.r0)
        v = _powerlaw(v0, rain.ve, rain.mass.r0, r)
        expected = qc * 0.8 * np.trapezoid(a * v * n, r)
        got = float(accretion(jnp.float64(qc), jnp.float64(qr), RHO, 0.8,
                              rain, G0))
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_accretion_rain_sink(self):
        rain, ice = RainParams(), CloudIceParams()
        qi, qr = 1e-4, 1e-3
        r, n_r = _dsd(rain, qr, RHO)
        m = _powerlaw(rain.mass.m0, rain.mass.me, rain.mass.r0, r)
        a = _powerlaw(rain.area.a0, rain.area.ae, rain.mass.r0, r)
        v0 = math.sqrt(8.0 / (3.0 * rain.C_drag)
                       * (rain.rho_w / RHO - 1.0) * G0 * rain.mass.r0)
        v = _powerlaw(v0, rain.ve, rain.mass.r0, r)
        N_ice = ice.n0 * float(lambda_inverse(ice, jnp.float64(qi), RHO))
        expected = 1.0 * N_ice * np.trapezoid(m * a * v * n_r, r) / RHO
        got = float(accretion_rain_sink(jnp.float64(qi), jnp.float64(qr),
                                        RHO, 1.0, ice, rain, G0))
        np.testing.assert_allclose(got, expected, rtol=1e-4)

    def test_accretion_snow_rain_2d_quadrature(self):
        """2-D collision integral π(rᵢ+rⱼ)² mⱼ nᵢ nⱼ |Δv| vs closed form."""
        rain, snow = RainParams(), SnowParams()
        qs, qr = 1e-3, 1e-3
        ri, ni = _dsd(snow, qs, RHO, n_pts=2000, span=40.0)   # collector i
        rj, nj = _dsd(rain, qr, RHO, n_pts=2000, span=40.0)   # collected j
        mj = _powerlaw(rain.mass.m0, rain.mass.me, rain.mass.r0, rj)
        vti = float(terminal_velocity(snow, jnp.float64(qs), RHO, G0))
        vtj = float(terminal_velocity(rain, jnp.float64(qr), RHO, G0))
        dv = math.sqrt((vti - vtj) ** 2 + 0.08 * vti * vtj)
        cross = (ri[:, None] + rj[None, :]) ** 2
        integrand = cross * (ni[:, None] * (mj * nj)[None, :])
        inner = np.trapezoid(integrand, rj, axis=1)
        expected = math.pi * 1.0 * dv * np.trapezoid(inner, ri) / RHO
        got = float(accretion_between_precip(
            snow, rain, jnp.float64(qs), jnp.float64(qr), RHO, 1.0, 0.08,
            G0))
        np.testing.assert_allclose(got, expected, rtol=1e-3)

    def test_rain_evaporation_ventilated_quadrature(self):
        """Ventilated Mason-equation evaporation vs quadrature of
        4π r G 𝒮 (a + b Sc^⅓ √Re(r)) n(r)."""
        c = ThermodynamicConstants()
        air = AirProperties()
        rain = RainParams()
        T = jnp.float64(290.0)
        qr = 5e-4
        q = MoistureMassFractions(jnp.float64(0.005), jnp.float64(0.0),
                                  jnp.float64(0.0))   # subsaturated at 290 K
        S = float(supersaturation(T, RHO, q, c, 1.0))
        assert S < 0.0
        Gf = float(diffusional_growth_factor(air, T, c))
        r, n = _dsd(rain, qr, RHO)
        v0 = math.sqrt(8.0 / (3.0 * rain.C_drag)
                       * (rain.rho_w / RHO - 1.0) * G0 * rain.mass.r0)
        v = _powerlaw(v0, rain.ve, rain.mass.r0, r)
        Sc = air.nu_air / air.D_vapor
        F = rain.vent.a + rain.vent.b * Sc ** (1 / 3) * np.sqrt(
            2.0 * v * r / air.nu_air)
        expected = 4.0 * math.pi * Gf * S / RHO * np.trapezoid(r * F * n, r)
        got = float(rain_evaporation(rain, air, q, jnp.float64(qr), RHO, T,
                                     c, G0))
        np.testing.assert_allclose(got, expected, rtol=1e-4)
        assert got < 0.0


class TestRateBundle:
    """The mixed-phase tendency bundle conserves total moisture exactly and
    routes processes by temperature regime (reference
    one_moment_microphysics.jl:1264-1273)."""

    def _rates(self, T_value, qv=8e-3, qcl=6e-4, qci=2e-4, qr=4e-4, qs=3e-4):
        c = ThermodynamicConstants()
        scheme = OneMomentMicrophysics()
        shape = (3,)
        arr = lambda v: jnp.full(shape, v, jnp.float64)
        rates = _process_rates(scheme, arr(qv), arr(qcl), arr(qci), arr(qr),
                               arr(qs), arr(RHO), arr(T_value), c, G0)
        return [np.asarray(x) for x in rates]

    def test_conservation_cold(self):
        rates = self._rates(260.0)
        total = sum(rates)
        scale = max(np.abs(r).max() for r in rates)
        assert np.abs(total).max() < 1e-12 * max(scale, 1e-30)

    def test_conservation_warm(self):
        rates = self._rates(292.0)
        total = sum(rates)
        scale = max(np.abs(r).max() for r in rates)
        assert np.abs(total).max() < 1e-12 * max(scale, 1e-30)

    def test_warm_melts_snow_to_rain(self):
        dqv, dqcl, dqci, dqr, dqs = self._rates(285.0, qv=5e-3)
        assert (dqs < 0).all()
        assert (dqr > 0).all()

    def test_cold_rain_snow_collection_feeds_snow(self):
        # cold: rain-snow collection routes rain into snow
        dqv, dqcl, dqci, dqr, dqs = self._rates(260.0, qv=1e-3)
        assert (dqs > 0).all()

    def test_warm_phase_option_three_way_conservation(self):
        c = ThermodynamicConstants()
        scheme = OneMomentMicrophysics(warm_phase=True)
        arr = lambda v: jnp.full((2,), v, jnp.float64)
        dqv, dqcl, dqci, dqr, dqs = [np.asarray(x) for x in _process_rates(
            scheme, arr(0.012), arr(5e-4), arr(0.0), arr(3e-4), arr(0.0),
            arr(RHO), arr(295.0), c, G0)]
        assert np.abs(dqv + dqcl + dqr).max() < 1e-15
        assert (dqci == 0).all() and (dqs == 0).all()
        assert scheme.prognostic_tracer_names == ("rho_qcl", "rho_qr")


class TestParameterPins:
    """Pin the published CloudMicrophysics.jl default parameters."""

    def test_rain_defaults(self):
        rain = RainParams()
        assert rain.n0 == 1.6e7
        np.testing.assert_allclose(rain.mass.m0,
                                   4 / 3 * math.pi * 1e3 * (1e-3) ** 3)
        assert rain.mass.me == 3.0 and rain.area.ae == 2.0
        assert (rain.vent.a, rain.vent.b) == (1.5, 0.53)
        assert rain.C_drag == 0.55 and rain.ve == 0.5

    def test_snow_defaults(self):
        snow = SnowParams()
        assert (snow.mu, snow.nu) == (4.36e9, 0.63)
        np.testing.assert_allclose(snow.mass.m0, 0.1 * (1e-3) ** 2)
        np.testing.assert_allclose(snow.v0, 2 ** 2.25 * (1e-3) ** 0.25)
        assert (snow.vent.a, snow.vent.b) == (0.65, 0.44)
        # Kaul et al. (2015) intercept at q=1e-3, rho=1
        n0 = float(snow.n0_of(jnp.float64(1e-3), 1.0))
        np.testing.assert_allclose(n0, 4.36e9 * 1e-3 ** 0.63, rtol=1e-12)

    def test_collision_efficiencies(self):
        s = OneMomentMicrophysics()
        assert (s.E_liquid_rain, s.E_liquid_snow, s.E_ice_rain,
                s.E_ice_snow, s.E_rain_snow) == (0.8, 0.1, 1.0, 0.1, 1.0)
        assert (s.q_liq_threshold, s.tau_acnv_liq) == (5e-4, 1e3)
        assert (s.q_ice_threshold, s.tau_acnv_ice) == (1e-6, 1e2)

    def test_surface_precip_diagnostic_accumulates(self):
        g = cold_grid()
        model = make_model(g, advection=bz.WENO(5),
                           potential_temperature=300.0,
                           microphysics=OneMomentMicrophysics())
        state = initial_state(
            model, qt=lambda x, y, z: 0.03 * jnp.exp(-z / 2500.0))
        assert "surface_precip_rate" in state.diagnostics
        for _ in range(40):
            state = one_moment_update(model.microphysics, model, state, 20.0)
        acc = float(np.asarray(state.diagnostics["accumulated_precip"]).max())
        assert acc > 0.0, "sustained condensate should rain out"
