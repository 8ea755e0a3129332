"""Surface-layer fidelity tests: polynomial bulk coefficients, fitted MO
stability functions, and the filtered surface state.

Reference: ``src/BoundaryConditions/polynomial_bulk_coefficient.jl:16-556``
(Large & Yeager 2009 neutral polynomials, Li et al. 2010 Riᴮ → ζ mapping,
Hogström 1996 / Beljaars & Holtslag 1991 Ψ functions) and
``filtered_surface_state.jl:25-344``.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import breeze_tpu as bz
from breeze_tpu.model import initial_state, make_model
from breeze_tpu.physics.surface import (
    NEUTRAL_DRAG_POLYNOMIAL,
    NEUTRAL_LATENT_HEAT_POLYNOMIAL,
    NEUTRAL_SENSIBLE_HEAT_POLYNOMIAL,
    BulkSurfaceFluxes,
    FittedStabilityFunction,
    PolynomialCoefficient,
    SurfaceFilter,
    bulk_richardson_number,
    surface_flux_values,
)
from breeze_tpu.timesteppers import ssp_rk3_step


class TestNeutralPolynomial:
    def test_large_yeager_values(self):
        """Pinned Large & Yeager (2009) polynomial evaluations."""
        coef = PolynomialCoefficient(polynomial=NEUTRAL_DRAG_POLYNOMIAL)
        # (0.142 + 0.076·10 + 2.7/10)·1e-3
        np.testing.assert_allclose(
            float(coef.neutral_10m(jnp.float64(10.0))), 1.172e-3, rtol=1e-12)
        coef_h = PolynomialCoefficient(
            polynomial=NEUTRAL_SENSIBLE_HEAT_POLYNOMIAL)
        np.testing.assert_allclose(
            float(coef_h.neutral_10m(jnp.float64(5.0))),
            (0.128 + 0.068 * 5 + 2.43 / 5) * 1e-3, rtol=1e-12)

    def test_minimum_wind_speed_clamp(self):
        coef = PolynomialCoefficient(polynomial=NEUTRAL_DRAG_POLYNOMIAL,
                                     minimum_wind_speed=0.1)
        v0 = float(coef.neutral_10m(jnp.float64(0.0)))
        v1 = float(coef.neutral_10m(jnp.float64(0.1)))
        assert v0 == v1 and np.isfinite(v0)

    def test_height_adjustment_log_profile(self):
        """C(h) = C₁₀·[ln(10/ℓ)/ln(h/ℓ)]²; at h = 10 m no adjustment."""
        coef = PolynomialCoefficient(polynomial=NEUTRAL_DRAG_POLYNOMIAL,
                                     stability_function=None)
        U = jnp.float64(8.0)
        c10 = float(coef(U, 10.0))
        np.testing.assert_allclose(c10, float(coef.neutral_10m(U)),
                                   rtol=1e-12)
        # Higher measurement height → weaker neutral coefficient.
        assert float(coef(U, 40.0)) < c10 < float(coef(U, 2.0))


class TestStabilityFunctions:
    sf = FittedStabilityFunction(scalar_roughness_length=1.5e-4 / 7.3)

    def test_psi_zero_at_neutral(self):
        assert abs(float(self.sf.psi_momentum(jnp.float64(0.0)))) < 1e-12
        assert abs(float(self.sf.psi_scalar(jnp.float64(0.0)))) < 1e-12

    def test_stable_psi_beljaars_holtslag_pinned(self):
        """Ψᴰ(1) = −[a + b(1 − c/d)e^{−d} + bc/d] with a=1, b=2/3, c=5,
        d=0.35 (Beljaars & Holtslag 1991)."""
        a, b, c, d = 1.0, 2.0 / 3.0, 5.0, 0.35
        expected = -(a + b * (1 - c / d) * math.exp(-d) + b * c / d)
        np.testing.assert_allclose(
            float(self.sf.psi_momentum(jnp.float64(1.0))), expected,
            rtol=1e-12)
        x = 1 + 2 * a / 3
        expected_t = -(x ** 1.5 + b * (1 - c / d) * math.exp(-d)
                       + b * c / d - 1)
        np.testing.assert_allclose(
            float(self.sf.psi_scalar(jnp.float64(1.0))), expected_t,
            rtol=1e-12)

    def test_unstable_psi_hogstrom_pinned(self):
        """Ψᴰ(−1): x = (1+γᴰ)^¼, 2ln((1+x)/2)+ln((1+x²)/2)−2atan(x)+π/2."""
        x = (1 + 19.3) ** 0.25
        expected = (2 * math.log((1 + x) / 2) + math.log((1 + x * x) / 2)
                    - 2 * math.atan(x) + math.pi / 2)
        np.testing.assert_allclose(
            float(self.sf.psi_momentum(jnp.float64(-1.0))), expected,
            rtol=1e-12)
        y = (1 + 11.6) ** 0.5
        np.testing.assert_allclose(
            float(self.sf.psi_scalar(jnp.float64(-1.0))),
            2 * math.log((1 + y) / 2), rtol=1e-12)

    def test_zeta_mapping_signs_and_regimes(self):
        """ζ has the sign of Riᴮ; the three Li et al. regimes are hit."""
        alpha, beta = math.log(20.0 / 1.5e-4), math.log(7.3)
        z_un = float(self.sf.zeta(jnp.float64(-0.5), alpha, beta))
        z_w = float(self.sf.zeta(jnp.float64(0.1), alpha, beta))
        z_s = float(self.sf.zeta(jnp.float64(0.5), alpha, beta))
        assert z_un < 0 < z_w < z_s

    def test_correction_enhances_unstable_suppresses_stable(self):
        alpha, beta = math.log(20.0 / 1.5e-4), math.log(7.3)
        for transfer in ("momentum", "scalar"):
            f_un = float(self.sf.correction(jnp.float64(-0.5), alpha, beta,
                                            transfer))
            f_n = float(self.sf.correction(jnp.float64(0.0), alpha, beta,
                                           transfer))
            f_st = float(self.sf.correction(jnp.float64(0.3), alpha, beta,
                                            transfer))
            assert f_st < f_n < f_un
            np.testing.assert_allclose(f_n, 1.0, rtol=1e-10)

    def test_momentum_scalar_corrections_differ(self):
        alpha, beta = math.log(20.0 / 1.5e-4), math.log(7.3)
        fm = float(self.sf.correction(jnp.float64(-0.5), alpha, beta,
                                      "momentum"))
        fs = float(self.sf.correction(jnp.float64(-0.5), alpha, beta,
                                      "scalar"))
        assert fm != fs


class TestBulkRichardson:
    def test_sign_and_scaling(self):
        Ri = float(bulk_richardson_number(20.0, jnp.float64(301.0),
                                          jnp.float64(300.0), 5.0, 0.1))
        assert Ri > 0
        Ri_un = float(bulk_richardson_number(20.0, jnp.float64(299.0),
                                             jnp.float64(300.0), 5.0, 0.1))
        assert Ri_un < 0
        np.testing.assert_allclose(
            Ri, 9.81 / 300.5 * 20.0 * 1.0 / 25.0, rtol=1e-12)


def _bulk_model(bf):
    g = bz.make_grid(size=(16, 1, 16), extent=(8_000.0, 1.0, 2_000.0),
                     topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                     dtype=jnp.float64)
    return make_model(g, advection=bz.WENO(5), potential_temperature=300.0,
                      boundary_fluxes=bf)


class TestPolynomialBulkFluxes:
    def test_unstable_surface_enhances_fluxes(self):
        """Warm surface (unstable) gives larger transfer than cold."""
        from breeze_tpu.model import diagnose

        def fluxes(Ts):
            bf = BulkSurfaceFluxes(
                surface_temperature=Ts,
                drag_coefficient=PolynomialCoefficient(),
                heat_transfer_coefficient=PolynomialCoefficient())
            model = _bulk_model(bf)
            state = initial_state(model, u=lambda x, y, z: 5.0 + 0 * z)
            aux = diagnose(model, state)
            return surface_flux_values(bf, model, state, aux,
                                       want_moisture=False)

        th_warm, _, Fu_warm, _ = fluxes(305.0)
        th_cold, _, Fu_cold, _ = fluxes(295.0)
        # Heat flux: into the air when surface warm, out when cold.
        assert float(th_warm[0, 0]) > 0 > float(th_cold[0, 0])
        # Unstable drag exceeds stable drag at identical wind.
        assert abs(float(Fu_warm[0, 0])) > abs(float(Fu_cold[0, 0]))

    def test_model_step_runs_with_polynomial_coefficients(self):
        bf = BulkSurfaceFluxes(
            surface_temperature=302.0,
            drag_coefficient=PolynomialCoefficient(),
            heat_transfer_coefficient=PolynomialCoefficient(),
            vapor_transfer_coefficient=PolynomialCoefficient())
        model = _bulk_model(bf)
        state = initial_state(model, u=lambda x, y, z: 5.0 + 0 * z)
        for _ in range(3):
            state = ssp_rk3_step(model, state, 2.0)
        assert bool(jnp.all(jnp.isfinite(state.rho_theta)))
        # surface heating has warmed the lowest level
        theta0 = np.asarray(state.rho_theta / model.reference.rho_col)[0]
        assert theta0.mean() > 300.0


class TestSurfaceFilter:
    def test_infinite_timescale_freezes_filter(self):
        bf = BulkSurfaceFluxes(surface_temperature=302.0,
                               filter=SurfaceFilter())
        model = _bulk_model(bf)
        state = initial_state(model, u=lambda x, y, z: 5.0 + 0 * z)
        assert "sf_u" in state.diagnostics
        u0 = np.asarray(state.diagnostics["sf_u"])
        np.testing.assert_allclose(u0, 5.0, rtol=1e-12)
        out = ssp_rk3_step(model, state, 2.0)
        np.testing.assert_array_equal(np.asarray(out.diagnostics["sf_u"]),
                                      u0)

    def test_exponential_blend_algebra(self):
        """One step: x̄ = (x̄₀ + ε·xⁿ)/(1+ε) with ε = Δt/τ."""
        tau = 100.0
        bf = BulkSurfaceFluxes(surface_temperature=300.0,
                               filter=SurfaceFilter(filter_timescale=tau))
        model = _bulk_model(bf)
        state = initial_state(model, u=lambda x, y, z: 5.0 + 0 * z)
        # Perturb the instantaneous field; the filter should move a fraction
        # ε/(1+ε) of the way toward it.
        state = state.replace(
            rho_u=state.rho_u * 2.0,
            diagnostics={**state.diagnostics,
                         "sf_u": jnp.asarray(state.diagnostics["sf_u"])})
        dt = 2.0
        out = ssp_rk3_step(model, state, dt)
        eps = dt / tau
        expected = (5.0 + eps * 10.0) / (1.0 + eps)
        np.testing.assert_allclose(np.asarray(out.diagnostics["sf_u"]),
                                   expected, rtol=1e-12)

    def test_height_interpolation(self):
        from breeze_tpu.physics.surface import surface_layer_values
        from breeze_tpu.model import diagnose
        bf = BulkSurfaceFluxes(surface_temperature=300.0,
                               filter=SurfaceFilter(height=250.0))
        model = _bulk_model(bf)
        # u varies linearly with z: interpolation at 250 m is exact.
        state = initial_state(model, u=lambda x, y, z: 0.01 * z)
        vals = surface_layer_values(model, diagnose(model, state),
                                    height=250.0)
        np.testing.assert_allclose(np.asarray(vals["sf_u"]), 2.5, rtol=1e-10)

    def test_compressible_filter_runs(self):
        from breeze_tpu.dynamics.compressible import (
            SplitExplicitTimeDiscretization, acoustic_rk3_step,
            compressible_initial_state, make_compressible_model)
        g = bz.make_grid(size=(16, 1, 16), extent=(8_000.0, 1.0, 2_000.0),
                         topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                         dtype=jnp.float64)
        bf = BulkSurfaceFluxes(
            surface_temperature=302.0,
            drag_coefficient=PolynomialCoefficient(),
            filter=SurfaceFilter(filter_timescale=50.0))
        model = make_compressible_model(
            g, reference_potential_temperature=300.0, boundary_fluxes=bf,
            time_discretization=SplitExplicitTimeDiscretization(substeps=4))
        state = compressible_initial_state(model,
                                           u=lambda x, y, z: 5.0 + 0 * z)
        assert "sf_u" in state.diagnostics
        for _ in range(2):
            state = acoustic_rk3_step(model, state, 1.0)
        assert bool(jnp.all(jnp.isfinite(state.rho_theta)))
        assert bool(jnp.all(jnp.isfinite(state.diagnostics["sf_u"])))


class TestReedJablonowskiSimplePhysics:
    """Reed & Jablonowski (2011/2012) "simple physics" pieces — the
    DCMIP2016 TC configuration (reference
    ``validation/DCMIP2016_TC/dcmip2016_tc.jl``: ``WindDependentDrag`` +
    ``rj_Km``/``rj_Ke``)."""

    def test_wind_dependent_drag_values(self):
        from breeze_tpu.physics.surface import WindDependentCoefficient
        cd = WindDependentCoefficient()
        np.testing.assert_allclose(float(cd(jnp.float64(0.0))), 7.0e-4)
        np.testing.assert_allclose(float(cd(jnp.float64(10.0))), 1.35e-3)
        # cap at 20 m/s: 7e-4 + 6.5e-5*20 = 2e-3 exactly, beyond stays
        np.testing.assert_allclose(float(cd(jnp.float64(20.0))), 2.0e-3)
        np.testing.assert_allclose(float(cd(jnp.float64(80.0))), 2.0e-3)

    def test_wind_dependent_drag_in_bulk_fluxes(self):
        from breeze_tpu.model import diagnose
        from breeze_tpu.physics.surface import WindDependentCoefficient
        bf = BulkSurfaceFluxes(surface_temperature=300.0,
                               drag_coefficient=WindDependentCoefficient(),
                               gustiness=0.0)
        model = _bulk_model(bf)
        state = initial_state(model, u=lambda x, y, z: 10.0 + 0 * z)
        _, _, F_u, _ = surface_flux_values(
            bf, model, state, diagnose(model, state), want_moisture=False)
        # tau/rho = -Cd(|U|)|U|u = -1.35e-3 * 100
        np.testing.assert_allclose(np.asarray(F_u), -0.135, rtol=1e-10)

    def test_rj_pbl_diffusivities(self):
        """Kₘ = Cᴰ(|v₁|)|v₁|zₐ·taper(p), Kₑ = 1.1e-3|v₁|zₐ·taper(p)."""
        from breeze_tpu.physics.closures import (
            ReedJablonowskiBoundaryLayer, eddy_coefficients)
        g = bz.make_grid(size=(8, 1, 40), extent=(8_000.0, 1.0, 20_000.0),
                         topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                         dtype=jnp.float64)
        model = make_model(g, advection=bz.WENO(5),
                           potential_temperature=300.0,
                           closure=ReedJablonowskiBoundaryLayer())
        state = initial_state(model, u=lambda x, y, z: 10.0 + 0 * z)
        Km, Ke = eddy_coefficients(model, state)
        z_a = float(g.z_c[0])
        # lowest level: p ≈ 1013 hPa ≥ 850 hPa → taper = 1
        np.testing.assert_allclose(np.asarray(Km[0]), 1.35e-3 * 10.0 * z_a,
                                   rtol=1e-8)
        np.testing.assert_allclose(np.asarray(Ke[0]), 1.1e-3 * 10.0 * z_a,
                                   rtol=1e-8)
        # taper: K decays above the 850 hPa level and is tiny near the top
        p_col = np.asarray(model.reference.p_col).ravel()
        k850 = int(np.argmax(p_col < 85000.0))
        assert float(Km[k850 - 1, 0, 0]) > float(Km[-1, 0, 0])
        assert float(Km[-1, 0, 0]) < 1e-3 * float(Km[0, 0, 0])

    def test_rj_pbl_step_runs_and_mixes(self):
        """A sheared lowest-level jet diffuses upward through the implicit
        vertical step; solution stays finite at a dt far beyond the
        explicit diffusive limit."""
        from breeze_tpu.model import diagnose
        from breeze_tpu.physics.closures import ReedJablonowskiBoundaryLayer
        g = bz.make_grid(size=(8, 1, 20), extent=(8_000.0, 1.0, 2_000.0),
                         topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                         dtype=jnp.float64)
        model = make_model(g, advection=bz.Centered(2),
                           potential_temperature=300.0,
                           closure=ReedJablonowskiBoundaryLayer())
        u0 = lambda x, y, z: 20.0 * jnp.exp(-z / 300.0)
        state = initial_state(model, u=u0)
        shear0 = float(jnp.max(jnp.abs(jnp.diff(
            diagnose(model, state).u, axis=0))))
        for _ in range(10):
            state = ssp_rk3_step(model, state, 20.0)
        aux = diagnose(model, state)
        assert bool(jnp.all(jnp.isfinite(aux.u)))
        shear1 = float(jnp.max(jnp.abs(jnp.diff(aux.u, axis=0))))
        assert shear1 < shear0  # PBL mixing smooths the near-surface shear
