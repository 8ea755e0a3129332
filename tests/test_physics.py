"""Closures, surface fluxes, forcings — and a miniature BOMEX run.

Mirrors reference ``test/turbulence_closures.jl``, ``test/vertical_diffusion.jl``,
``test/forcing_and_boundary_conditions.jl``, ``test/geostrophic_subsidence_forcings.jl``.
"""

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.model import compute_tendencies, diagnose, initial_state, make_model
from breeze_tpu.physics.closures import ConstantDiffusivity, SmagorinskyLilly
from breeze_tpu.physics.forcings import (GeostrophicForcing, SubsidenceForcing,
                                         UpperSponge)
from breeze_tpu.physics.surface import BulkSurfaceFluxes, PrescribedSurfaceFluxes
from breeze_tpu.timesteppers import ssp_rk3_step


def les_grid(n=16, nz=16, dtype=jnp.float64):
    return bz.make_grid(size=(n, n, nz), extent=(3200.0, 3200.0, 1600.0),
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                        dtype=dtype)


class TestClosures:
    def test_constant_diffusivity_decays_shear(self):
        g = les_grid()
        model = make_model(g, potential_temperature=300.0,
                          closure=ConstantDiffusivity(viscosity=10.0, diffusivity=10.0))
        x, y, z = g.xyz_c()
        state = initial_state(model, u=lambda x, y, z: 2.0 * jnp.sin(
            2 * jnp.pi * x / 3200.0))
        ke0 = float(jnp.sum(state.rho_u ** 2))
        for _ in range(5):
            state = ssp_rk3_step(model, state, 2.0)
        ke1 = float(jnp.sum(state.rho_u ** 2))
        assert ke1 < ke0, "viscosity must dissipate shear kinetic energy"

    def test_smagorinsky_viscosity_positive_in_shear(self):
        from breeze_tpu.physics.closures import closure_tendencies
        from breeze_tpu import fields as fl
        g = les_grid()
        model = make_model(g, potential_temperature=300.0,
                          closure=SmagorinskyLilly())
        state = initial_state(model, u=lambda x, y, z: 0.01 * z)
        aux = diagnose(model, state)
        so = model.stencil_ops()
        cf = closure_tendencies(model, so, aux,
                                fl.pad(aux.u, g, fl.CCF),
                                fl.pad(aux.v, g, fl.CFC),
                                fl.pad(aux.w, g, fl.FCC))
        assert float(cf.nu_e.max()) > 0

    def test_smagorinsky_zero_at_rest(self):
        g = les_grid()
        model = make_model(g, potential_temperature=300.0, closure=SmagorinskyLilly())
        state = initial_state(model)
        G = compute_tendencies(model, state)
        np.testing.assert_allclose(np.asarray(G.rho_u), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(G.rho_theta), 0.0, atol=1e-10)


class TestSurfaceFluxes:
    def test_prescribed_theta_flux_heats_bottom(self):
        g = les_grid()
        model = make_model(g, potential_temperature=300.0,
                          boundary_fluxes=PrescribedSurfaceFluxes(theta_flux=0.1))
        state = initial_state(model)
        G = compute_tendencies(model, state)
        assert float(G.rho_theta[0].min()) > 0
        np.testing.assert_allclose(np.asarray(G.rho_theta[1:]), 0.0, atol=1e-12)

    def test_drag_opposes_flow(self):
        g = les_grid()
        model = make_model(
            g, potential_temperature=300.0,
            boundary_fluxes=PrescribedSurfaceFluxes(momentum_drag_coefficient=1e-3))
        state = initial_state(model, u=5.0 * jnp.ones(g.shape))
        G = compute_tendencies(model, state)
        assert float(G.rho_u[0].max()) < 0, "drag must decelerate the bottom cell"

    def test_bulk_fluxes_warm_surface(self):
        g = les_grid()
        model = make_model(
            g, potential_temperature=300.0,
            microphysics=bz.SaturationAdjustment(equilibrium=bz.WarmPhaseEquilibrium()),
            boundary_fluxes=BulkSurfaceFluxes(surface_temperature=302.0))
        state = initial_state(model, u=2.0 * jnp.ones(g.shape),
                              qt=jnp.full(g.shape, 0.005))
        G = compute_tendencies(model, state)
        assert float(G.rho_theta[0].mean()) > 0, "warm surface heats the air"
        assert float(G.rho_qt[0].mean()) > 0, "saturated surface moistens the air"


class TestForcings:
    def test_geostrophic_balance_is_steady(self):
        """u = uᵍ with FPlane + GeostrophicForcing has zero net tendency."""
        g = les_grid()
        f = 1e-4
        ug = 5.0
        model = make_model(g, potential_temperature=300.0,
                          coriolis=bz.FPlane(f=f),
                          forcings=(GeostrophicForcing(f=f, u_g=ug),))
        state = initial_state(model, u=ug * jnp.ones(g.shape))
        G = compute_tendencies(model, state)
        np.testing.assert_allclose(np.asarray(G.rho_u), 0.0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(G.rho_v), 0.0, atol=1e-10)

    def test_subsidence_warms_with_stable_gradient(self):
        g = les_grid()
        model = make_model(
            g, potential_temperature=300.0,
            forcings=(SubsidenceForcing(w_profile=lambda z: -0.005 * jnp.ones_like(z)),))
        # stable stratification: θ increases upward
        state = initial_state(model, theta=lambda x, y, z: 300.0 + 0.003 * z)
        G = compute_tendencies(model, state)
        # −ρ wˢ ∂zθ with wˢ<0 and ∂zθ>0 → positive tendency
        assert float(G.rho_theta[2:-2].mean()) > 0

    def test_sponge_damps_w(self):
        g = les_grid()
        model = make_model(g, potential_temperature=300.0,
                          forcings=(UpperSponge(rate=0.1, bottom=800.0),))
        w = jnp.ones(g.shape)
        state = initial_state(model, w=w)
        G = compute_tendencies(model, state)
        # at the top, damping dominates: G_rho_w < 0 where rho_w > 0
        assert float(G.rho_w[-1].mean()) < 0


class TestMiniBomex:
    def test_bomex_like_les_runs_stably(self):
        """All BOMEX ingredients together (closure + surface + forcings +
        moisture), 10 steps, finite and cloud-free-to-cloudy sane."""
        g = les_grid(n=16, nz=20)
        f = 3.76e-5
        model = make_model(
            g, advection=bz.WENO(5), potential_temperature=299.1,
            microphysics=bz.SaturationAdjustment(equilibrium=bz.WarmPhaseEquilibrium()),
            closure=SmagorinskyLilly(),
            coriolis=bz.FPlane(f=f),
            boundary_fluxes=PrescribedSurfaceFluxes(
                theta_flux=8e-3, qt_flux=5.2e-5, friction_velocity=0.28),
            forcings=(
                GeostrophicForcing(f=f, u_g=lambda z: -10.0 + 1.8e-3 * z),
                SubsidenceForcing(w_profile=lambda z: -0.0065 * jnp.clip(z / 1500.0, 0, 1)),
                UpperSponge(rate=0.05, bottom=1200.0),
            ))

        import jax

        noise = 0.1 * jax.random.normal(jax.random.key(0), g.shape)

        def theta0(x, y, z):
            base = jnp.where(z < 520.0, 298.7, 298.7 + (z - 520.0) * 3.85e-3)
            return base + noise * jnp.exp(-z / 500.0)

        def qt0(x, y, z):
            return jnp.where(z < 520.0, 0.017, 0.0163 - (z - 520.0) * 6e-6)

        state = initial_state(model, theta=theta0, qt=qt0,
                              u=lambda x, y, z: -8.75 * jnp.ones_like(x * y * z))
        for _ in range(10):
            state = ssp_rk3_step(model, state, 5.0)
        assert bool(jnp.all(jnp.isfinite(state.rho_theta)))
        assert bool(jnp.all(jnp.isfinite(state.rho_qt)))
        assert bool(jnp.all(jnp.isfinite(state.rho_u)))
        aux = diagnose(model, state)
        # surface heating generates convective motion
        assert float(jnp.abs(aux.w).max()) > 1e-6


class TestAMD:
    def test_amd_positive_in_shear_zero_at_rest(self):
        from breeze_tpu.physics.closures import (AnisotropicMinimumDissipation,
                                                 closure_tendencies)
        from breeze_tpu import fields as fl
        g = les_grid()
        model = make_model(g, potential_temperature=300.0,
                          closure=AnisotropicMinimumDissipation())
        state = initial_state(model, u=lambda x, y, z: 2.0 * jnp.sin(
            2 * jnp.pi * x / 3200.0) * jnp.exp(-z / 500.0))
        aux = diagnose(model, state)
        so = model.stencil_ops()
        cf = closure_tendencies(model, so, aux,
                                fl.pad(aux.u, g, fl.CCF),
                                fl.pad(aux.v, g, fl.CFC),
                                fl.pad(aux.w, g, fl.FCC))
        assert float(cf.nu_e.max()) >= 0
        assert bool(jnp.all(jnp.isfinite(cf.G_u)))
        # at rest: zero
        state0 = initial_state(model)
        G = compute_tendencies(model, state0)
        np.testing.assert_allclose(np.asarray(G.rho_u), 0.0, atol=1e-12)

    def test_amd_les_runs(self):
        from breeze_tpu.physics.closures import AnisotropicMinimumDissipation
        g = les_grid()
        model = make_model(g, advection=bz.WENO(5), potential_temperature=300.0,
                          closure=AnisotropicMinimumDissipation(),
                          boundary_fluxes=PrescribedSurfaceFluxes(theta_flux=0.05))
        import jax
        noise = 0.1 * jax.random.normal(jax.random.key(2), g.shape)
        state = initial_state(model, theta=300.0 + noise)
        for _ in range(5):
            state = ssp_rk3_step(model, state, 2.0)
        assert bool(jnp.all(jnp.isfinite(state.rho_u)))


class TestHDF5Writer:
    def test_hdf5_time_series(self, tmp_path):
        from breeze_tpu.simulation import HDF5Writer, IterationInterval, Simulation
        g = les_grid(n=8, nz=8, dtype=jnp.float32)
        model = make_model(g, potential_temperature=300.0)
        state = initial_state(model, theta=lambda x, y, z: 300.0 + z * 1e-3)
        sim = Simulation(model, state, dt=1.0, stop_iteration=6, verbose=False)
        writer = HDF5Writer(str(tmp_path / "out.h5"), IterationInterval(2),
                            fields=("theta", "w"))
        sim.add_output_writer(writer)
        sim.run()
        writer.close()
        times, thetas = writer.load_time_series("theta")
        assert len(times) == 3
        assert thetas.shape[1:] == g.shape
        np.testing.assert_allclose(thetas[0].mean(), 300.0, atol=1.0)


class TestStabilityCorrection:
    def test_louis_factor_shape(self):
        bf = BulkSurfaceFluxes(stability_correction=True)
        import jax.numpy as jnp
        f_unstable = float(bf.stability_factor(jnp.float64(-1.0)))
        f_neutral = float(bf.stability_factor(jnp.float64(0.0)))
        f_stable = float(bf.stability_factor(jnp.float64(1.0)))
        assert f_unstable > 1.0 > f_stable
        np.testing.assert_allclose(f_neutral, 1.0)

    def test_warm_surface_enhances_fluxes(self):
        g = les_grid()
        kw = dict(surface_temperature=305.0)
        m_neutral = make_model(g, potential_temperature=300.0,
                              boundary_fluxes=BulkSurfaceFluxes(**kw))
        m_stab = make_model(g, potential_temperature=300.0,
                            boundary_fluxes=BulkSurfaceFluxes(
                                stability_correction=True, **kw))
        state = initial_state(m_neutral, u=2.0 * jnp.ones(g.shape))
        G_n = compute_tendencies(m_neutral, state)
        G_s = compute_tendencies(m_stab, state)
        # unstable (warm surface): corrected fluxes exceed neutral
        assert float(G_s.rho_theta[0].mean()) > float(G_n.rho_theta[0].mean())


class TestOpenBoundary:
    def test_edge_zones_relax_momentum(self):
        """Open-boundary relaxation damps momentum in the edge zones while
        leaving the interior untouched (reference
        test/open_boundary_momentum.jl capability)."""
        from breeze_tpu.physics.forcings import OpenBoundaryRelaxation
        from breeze_tpu.dynamics.compressible import (
            SplitExplicitTimeDiscretization, acoustic_rk3_step,
            compressible_initial_state, make_compressible_model)

        g = bz.make_grid(size=(64, 1, 12), x=(0.0, 32000.0), y=(0.0, 1.0),
                         z=(0.0, 6000.0),
                         topology=(bz.BOUNDED, bz.FLAT, bz.BOUNDED),
                         dtype=jnp.float64)
        model = make_compressible_model(
            g, advection=bz.Centered(2),
            forcings=(OpenBoundaryRelaxation(axis="x", width=8, rate=0.1),),
            time_discretization=SplitExplicitTimeDiscretization(substeps=4))
        state = compressible_initial_state(model, u=5.0 * jnp.ones(g.shape))
        u0_interior = float((state.rho_u[:, :, 24:40]).mean())
        u0_edge = float((state.rho_u[:, :, 1:5]).mean())
        for _ in range(10):
            state = acoustic_rk3_step(model, state, 2.0)
        u1_interior = float((state.rho_u[:, :, 24:40]).mean())
        u1_edge = float((state.rho_u[:, :, 1:5]).mean())
        assert u1_edge < 0.7 * u0_edge, "edge momentum must relax toward zero"
        assert abs(u1_interior - u0_interior) < 0.15 * u0_interior, (
            "interior momentum nearly unchanged over this horizon")

    def test_fast_loop_relaxation_reduces_acoustic_reflection(self):
        """Per-substep open-boundary relaxation of ρ′/(ρθ)′ (reference
        acoustic_substepping.jl:1279-1322): a pure acoustic pulse launched
        at the west wall reflects progressively less as absorption layers
        stack — rigid > Davies-only > Davies + fast relaxation."""
        from breeze_tpu.physics.forcings import OpenBoundaryRelaxation
        from breeze_tpu.dynamics.compressible import (
            SplitExplicitTimeDiscretization, acoustic_rk3_step,
            compressible_initial_state, make_compressible_model)

        g = bz.make_grid(size=(128, 1, 8), x=(0.0, 64000.0), y=(0.0, 1.0),
                         z=(0.0, 4000.0),
                         topology=(bz.BOUNDED, bz.FLAT, bz.BOUNDED),
                         dtype=jnp.float64)

        def run(forcings, alpha):
            td = SplitExplicitTimeDiscretization(
                substeps=6, open_boundary_relaxation=alpha)
            model = make_compressible_model(
                g, advection=bz.Centered(2), forcings=forcings,
                time_discretization=td)
            state = compressible_initial_state(model)
            # +0.1% density pulse near the west wall, θ untouched: acoustic
            x = g.xyz_c()[0]
            pulse = 1e-3 * jnp.exp(-(((x - 6000.0) / 1500.0) ** 2)) \
                * jnp.ones(g.shape)
            rho0 = state.rho
            state = state.replace(rho=rho0 * (1 + pulse),
                                  rho_theta=state.rho_theta * (1 + pulse))
            import jax
            step = jax.jit(lambda s: acoustic_rk3_step(model, s, 1.0))
            for _ in range(75):
                state = step(state)
            # reflected-wave amplitude outside the relaxation zone
            rp = (state.rho - rho0) / rho0
            return float(jnp.abs(rp[:, :, 12:52]).max())

        dav = OpenBoundaryRelaxation(axis="x", width=8, rate=0.1)
        closed = run((), 0.0)
        davies = run((dav,), 0.0)
        davies_fast = run((dav,), 0.5)
        assert davies < 0.95 * closed, (closed, davies)
        assert davies_fast < 0.95 * davies, (
            f"fast-loop relaxation must add absorption: "
            f"closed={closed:.3e} davies={davies:.3e} "
            f"davies+fast={davies_fast:.3e}")

    def test_ramp_shape(self):
        from breeze_tpu.physics.forcings import OpenBoundaryRelaxation
        g = bz.make_grid(size=(32, 1, 8), extent=(1.0, 1.0, 1.0),
                         topology=(bz.BOUNDED, bz.FLAT, bz.BOUNDED))
        ob = OpenBoundaryRelaxation(axis="x", width=4, rate=0.1)
        sig = np.asarray(ob._ramp(g)).ravel()
        assert sig[0] == sig[-1] == np.max(sig)
        np.testing.assert_allclose(sig[10:22], 0.0)


class TestDynamicSmagorinsky:
    """Germano-Lilly dynamic Smagorinsky (reference src/Breeze.jl:219
    DynamicSmagorinsky re-export)."""

    def _grid(self):
        return bz.make_grid(size=(32, 32, 16), x=(0., 3200.), y=(0., 3200.),
                            z=(0., 1600.))

    def test_linear_shear_gives_zero_coefficient(self):
        """A fully resolved linear shear has no Leonard stress: the dynamic
        procedure returns c2 = 0 (pure Smagorinsky would diffuse it)."""
        from breeze_tpu.physics.closures import (DynamicSmagorinsky,
                                                 eddy_coefficients)
        g = self._grid()
        model = make_model(g, potential_temperature=300.0,
                           closure=DynamicSmagorinsky())
        state = initial_state(model, theta=lambda x, y, z: 300.0 + 0.003 * z,
                              u=lambda x, y, z: 0.01 * z)
        nu, _ = eddy_coefficients(model, state)
        assert float(jnp.max(nu)) < 1e-10

    def test_turbulent_field_positive_viscosity_and_stable(self):
        import jax
        from breeze_tpu.physics.closures import (DynamicSmagorinsky,
                                                 eddy_coefficients)
        from breeze_tpu.timesteppers import ssp_rk3_step
        g = self._grid()
        model = make_model(g, advection=bz.WENO(5),
                           potential_temperature=300.0,
                           closure=DynamicSmagorinsky())
        state = initial_state(model, theta=lambda x, y, z: 300.0 + 0.003 * z)
        key = jax.random.PRNGKey(0)
        state = state.replace(
            rho_u=state.rho_u + 0.5 * jax.random.normal(key, g.shape, g.dtype),
            rho_v=state.rho_v + 0.5 * jax.random.normal(
                jax.random.fold_in(key, 1), g.shape, g.dtype),
            rho_w=(state.rho_w + 0.5 * jax.random.normal(
                jax.random.fold_in(key, 2), g.shape, g.dtype)).at[0].set(0.0))
        nu, kappa = eddy_coefficients(model, state)
        assert float(jnp.max(nu)) > 0.0
        np.testing.assert_allclose(np.asarray(kappa),
                                   np.asarray(nu) * 3.0, rtol=1e-5)
        step = jax.jit(lambda s: ssp_rk3_step(model, s, 2.0))
        for _ in range(5):
            state = step(state)
        assert bool(jnp.all(jnp.isfinite(state.rho_u)))


class TestNonTraditionalBetaPlane:
    def test_reduces_to_constant_cartesian(self):
        """β = γ = 0: identical to ConstantCartesianCoriolis(0, fy, fz)."""
        from breeze_tpu import fields as fl
        from breeze_tpu.ops import StencilOps
        from breeze_tpu.physics.coriolis import (ConstantCartesianCoriolis,
                                                 NonTraditionalBetaPlane,
                                                 coriolis_terms)
        g = bz.make_grid(size=(16, 8, 8), extent=(1600.0, 800.0, 800.0),
                         topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                         dtype=jnp.float64)
        so = StencilOps(g)
        rng = np.random.default_rng(3)
        ru = fl.pad(jnp.asarray(rng.normal(size=g.shape)), g, fl.CCF)
        rv = fl.pad(jnp.asarray(rng.normal(size=g.shape)), g, fl.CFC)
        rw = fl.pad(jnp.asarray(rng.normal(size=g.shape)), g, fl.FCC)
        nt = NonTraditionalBetaPlane(fz=1e-4, fy=7e-5, beta=0.0, gamma=0.0)
        cc = ConstantCartesianCoriolis(fx=0.0, fy=7e-5, fz=1e-4)
        for a, b in zip(coriolis_terms(nt, so, ru, rv, rw, g),
                        coriolis_terms(cc, so, ru, rv, rw, g)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-15)

    def test_from_latitude_and_beta_variation(self):
        from breeze_tpu import fields as fl
        from breeze_tpu.ops import StencilOps
        from breeze_tpu.physics.coriolis import (NonTraditionalBetaPlane,
                                                 coriolis_terms)
        import math
        nt = NonTraditionalBetaPlane.from_latitude(45.0)
        two_om = 2 * 7.292115e-5
        np.testing.assert_allclose(nt.fz, two_om * math.sin(math.pi / 4))
        np.testing.assert_allclose(nt.beta, two_om * math.cos(math.pi / 4)
                                   / 6.371e6)
        np.testing.assert_allclose(nt.gamma, -2 * two_om
                                   * math.sin(math.pi / 4) / 6.371e6)
        # fz(y) variation shows up in the x-term: uniform rho_v, zero w
        g = bz.make_grid(size=(8, 16, 4), extent=(800.0, 3.2e6, 400.0),
                         topology=(bz.PERIODIC, bz.BOUNDED, bz.BOUNDED),
                         dtype=jnp.float64)
        so = StencilOps(g)
        ru = fl.pad(jnp.zeros(g.shape), g, fl.CCF)
        rv = fl.pad(jnp.ones(g.shape), g, fl.CFC)
        rw = fl.pad(jnp.zeros(g.shape), g, fl.FCC)
        x_t, _, _ = coriolis_terms(nt, so, ru, rv, rw, g)
        x_t = np.asarray(x_t)
        # interior rows (wall-face rows see the zero-padded v average)
        assert x_t[0, 12, 0] < x_t[0, 4, 0] < 0.0, "−fz(y)·v decreases with y"
