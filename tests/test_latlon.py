"""Latitude-longitude grid tests (reference test/latitude_longitude_grid.jl
+ the baroclinic-wave capability, examples/baroclinic_wave.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

import breeze_tpu as bz
from breeze_tpu import advection as adv
from breeze_tpu import fields as fl
from breeze_tpu.dynamics.compressible import (
    SplitExplicitTimeDiscretization, acoustic_rk3_step, compressible_diagnose,
    compressible_initial_state, make_compressible_model)
from breeze_tpu.grid import make_latlon_grid
from breeze_tpu.ops import StencilOps
from breeze_tpu.physics.coriolis import HydrostaticSphericalCoriolis


def sphere_grid(nx=36, ny=16, nz=8, dtype=jnp.float64):
    return make_latlon_grid((nx, ny, nz), longitude=(0.0, 360.0),
                            latitude=(-80.0, 80.0), z=(0.0, 10_000.0),
                            dtype=dtype)


class TestLatLonGrid:
    def test_metric_arrays(self):
        g = sphere_grid()
        assert g.is_latlon
        cos_c = np.asarray(g.coslat_c)
        assert cos_c.shape == (16,)
        # symmetric about the equator, smaller toward the poles
        np.testing.assert_allclose(cos_c, cos_c[::-1], rtol=1e-6)
        assert cos_c[0] < cos_c[8]

    def test_zonal_flow_nondivergent(self):
        """u = const (zonal) has zero divergence on the sphere."""
        g = sphere_grid()
        so = StencilOps(g)
        u = jnp.ones(g.shape)
        zero = jnp.zeros(g.shape)
        div = so.div_c(fl.pad(u, g, fl.CCF), fl.pad(zero, g, fl.CFC),
                       fl.pad(zero, g, fl.FCC))
        np.testing.assert_allclose(np.asarray(div), 0.0, atol=1e-12)

    def test_meridional_cosine_flow_nondivergent(self):
        """v·cosφ = const is non-divergent: δy(cosφ v) = 0."""
        g = sphere_grid()
        so = StencilOps(g)
        cosf_row = g.coslat_f[: g.ny][None, :, None]
        v = jnp.ones(g.shape) / cosf_row
        zero = jnp.zeros(g.shape)
        div = so.div_c(fl.pad(zero, g, fl.CCF), fl.pad(v, g, fl.CFC),
                       fl.pad(zero, g, fl.FCC))
        # interior rows exact; the polar-wall rows see the halo closure
        np.testing.assert_allclose(np.asarray(div)[:, 1:-1, :], 0.0, atol=1e-12)

    def test_tracer_conservation_on_sphere(self):
        """FV with cos-weighted areas conserves ∫ρc cosφ dV under advection."""
        g = sphere_grid(nx=24, ny=12, nz=6)
        so = StencilOps(g)
        rng = np.random.default_rng(0)
        rho_pad = fl.pad(jnp.ones(g.shape), g, fl.CCC)
        u = jnp.asarray(rng.normal(size=g.shape))
        v = jnp.asarray(rng.normal(size=g.shape)).at[:, 0, :].set(0.0)
        w = fl.enforce_impenetrability(jnp.asarray(rng.normal(size=g.shape)), g)
        c = jnp.asarray(rng.random(g.shape))
        G = -adv.div_rho_u_c(so, adv.WENO(5), rho_pad,
                             fl.pad(u, g, fl.CCF), fl.pad(v, g, fl.CFC),
                             fl.pad(w, g, fl.FCC), fl.pad(c, g, fl.CCC))
        # volume weight ∝ cosφ_c Δz (Δλ, Δφ uniform)
        wgt = g.coslat_c[None, :, None] * g.dz_c_col
        total_tendency = float(jnp.sum(G * wgt))
        scale = float(jnp.sum(jnp.abs(G) * wgt))
        assert abs(total_tendency) < 1e-12 * max(scale, 1.0)


class TestSphericalDynamics:
    def test_rest_state_on_sphere(self):
        g = sphere_grid(nx=24, ny=12, nz=16)
        model = make_compressible_model(
            g, reference_potential_temperature=300.0,
            coriolis=HydrostaticSphericalCoriolis(),
            time_discretization=SplitExplicitTimeDiscretization(substeps=4))
        state = compressible_initial_state(model)
        for _ in range(5):
            state = acoustic_rk3_step(model, state, 20.0)
        aux = compressible_diagnose(model, state)
        assert float(jnp.abs(aux.w).max()) < 1e-9
        assert float(jnp.abs(aux.u).max()) < 1e-9

    @pytest.mark.nightly
    def test_baroclinic_channel_stable(self):
        """Baroclinic-wave-like setup: zonal jet in thermal-wind-ish balance
        perturbs and integrates stably (capability: examples/baroclinic_wave.jl)."""
        g = make_latlon_grid((48, 20, 10), longitude=(0.0, 360.0),
                             latitude=(-60.0, 60.0), z=(0.0, 10_000.0),
                             dtype=jnp.float64)
        N2 = 1e-4
        g_acc = 9.81
        theta_fn = lambda z: 288.0 * np.exp(N2 / g_acc * z)
        model = make_compressible_model(
            g, advection=bz.WENO(5), reference_potential_temperature=theta_fn,
            coriolis=HydrostaticSphericalCoriolis(),
            time_discretization=SplitExplicitTimeDiscretization(substeps=8))

        def theta0(lon, lat, z):
            base = 288.0 * jnp.exp(N2 / g_acc * z)
            # gentle meridional gradient + wave-1 perturbation
            dT = -2.0 * jnp.sin(lat) ** 2
            pert = 0.1 * jnp.cos(lat) * jnp.sin(lon)
            return base + dT + pert

        state = compressible_initial_state(model, theta=theta0)
        dzc = np.asarray(g.dz_c)[:, None, None]
        wgt = np.asarray(g.coslat_c)[None, :, None] * dzc
        m0 = float(jnp.sum(state.rho * wgt))
        for _ in range(10):
            state = acoustic_rk3_step(model, state, 15.0)
        aux = compressible_diagnose(model, state)
        assert bool(jnp.all(jnp.isfinite(aux.u)))
        assert float(jnp.abs(aux.u).max()) < 100.0, "winds stay bounded"
        m1 = float(jnp.sum(state.rho * wgt))
        np.testing.assert_allclose(m1, m0, rtol=1e-11)

    def test_coriolis_turns_zonal_flow(self):
        """Northern-hemisphere zonal flow turns equatorward/poleward per f."""
        g = sphere_grid(nx=24, ny=12, nz=8)
        model = make_compressible_model(
            g, coriolis=HydrostaticSphericalCoriolis(),
            time_discretization=SplitExplicitTimeDiscretization(
                substeps=4, damping_coefficient=0.0))
        state = compressible_initial_state(model, u=10.0 * jnp.ones(g.shape))
        state = acoustic_rk3_step(model, state, 100.0)
        aux = compressible_diagnose(model, state)
        v = np.asarray(aux.v)
        # f > 0 north: u eastward → -fu southward acceleration (v < 0 north)
        north = v[:, -3, :].mean()
        south = v[:, 2, :].mean()
        assert north < 0 < south
