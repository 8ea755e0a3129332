"""Gray radiation and solar geometry tests (reference
test/gray_radiative_transfer.jl + radiation scheduling)."""

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.model import compute_tendencies, diagnose, initial_state, make_model
from breeze_tpu.physics.radiation import (DiurnalSolarPosition, FixedCosineZenith,
                                          GrayRadiation, STEFAN_BOLTZMANN,
                                          cos_solar_zenith_angle)
from breeze_tpu.timesteppers import ssp_rk3_step


def rad_model(**kw):
    g = bz.make_grid(size=(8, 1, 32), extent=(4000.0, 1.0, 10_000.0),
                     topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                     dtype=jnp.float64)
    rad = GrayRadiation(**kw)
    model = make_model(g, potential_temperature=300.0, forcings=(rad,))
    return g, model, rad


class TestSolarGeometry:
    def test_zenith_bounds(self):
        mu = cos_solar_zenith_angle(12 * 3600.0, 0.0, 0.0, day_of_year=80)
        assert 0.9 < float(mu) <= 1.0, "equatorial equinox noon is near overhead"
        mu_night = cos_solar_zenith_angle(0.0, 0.0, 0.0, day_of_year=80)
        assert float(mu_night) == 0.0, "midnight sun below horizon clamps to 0"

    def test_diurnal_cycle(self):
        sp = DiurnalSolarPosition(latitude=35.0)
        mus = [float(sp(t * 3600.0)) for t in range(24)]
        assert max(mus) > 0.5 and min(mus) == 0.0

    def test_polar_night(self):
        mu = cos_solar_zenith_angle(12 * 3600.0, -80.0, 0.0, day_of_year=172)
        assert float(mu) < 0.05


class TestGrayRadiation:
    def test_flux_profiles_sane(self):
        g, model, rad = rad_model(solar_position=FixedCosineZenith(0.5))
        state = initial_state(model)
        aux = diagnose(model, state)
        lw_up, lw_dn, sw_dn = rad.fluxes(model, aux, 0.0)
        assert lw_up.shape[0] == g.nz + 1
        # LW down vanishes at TOA, builds toward the surface
        assert float(lw_dn[-1].max()) == 0.0
        assert float(lw_dn[0].mean()) > 50.0
        # LW up at surface = σTs⁴
        Ts = float(aux.T[0, 0, 0])
        np.testing.assert_allclose(float(lw_up[0, 0, 0]),
                                   STEFAN_BOLTZMANN * Ts ** 4, rtol=1e-6)
        # SW attenuates downward
        assert float(sw_dn[-1].mean()) > float(sw_dn[0].mean())

    def test_column_cools_at_night(self):
        g, model, rad = rad_model(solar_position=FixedCosineZenith(0.0))
        state = initial_state(model)
        G = compute_tendencies(model, state)
        # night: pure LW; outgoing radiation cools the column as a whole
        # (individual thin cold layers may warm under the gray absorber)
        dzc = np.asarray(g.dz_c)[:, None, None]
        assert float((G.rho_theta * dzc).sum()) < 0

    def test_sun_heats(self):
        g, model_night, _ = rad_model(solar_position=FixedCosineZenith(0.0))
        g2, model_day, _ = rad_model(solar_position=FixedCosineZenith(1.0),
                                     surface_albedo=0.0)
        s = initial_state(model_night)
        G_night = compute_tendencies(model_night, s)
        G_day = compute_tendencies(model_day, initial_state(model_day))
        assert float((G_day.rho_theta - G_night.rho_theta).mean()) > 0

    def test_radiative_run_stable(self):
        g, model, rad = rad_model()
        state = initial_state(model)
        for _ in range(10):
            state = ssp_rk3_step(model, state, 30.0)
        assert bool(jnp.all(jnp.isfinite(state.rho_theta)))
