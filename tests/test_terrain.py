"""Terrain-following coordinate tests (reference test/terrain_following_*.jl
patterns: metrics, reference state over terrain, rest state, mountain wave)."""

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.dynamics.compressible import make_compressible_model
from breeze_tpu.dynamics.terrain import (TerrainMetrics, contravariant_rho_w,
                                         kinematic_bottom_rho_w, make_terrain,
                                         terrain_explicit_rk3_step,
                                         terrain_initial_state)
from breeze_tpu.thermo.constants import ThermodynamicConstants

CONST = ThermodynamicConstants()


def witch_of_agnesi(h0=250.0, a=2000.0, x0=10_000.0):
    return lambda x, y: h0 / (1.0 + ((x - x0) / a) ** 2)


def terrain_grid(nx=64, nz=24, lx=20_000.0, lz=10_000.0):
    return bz.make_grid(size=(nx, 1, nz), extent=(lx, 1.0, lz),
                        topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                        dtype=jnp.float64)


class TestTerrainMetrics:
    def test_jacobian_and_slopes(self):
        g = terrain_grid()
        t = make_terrain(g, CONST, witch_of_agnesi())
        assert float(t.h_c.max()) > 200.0
        # J < 1 over the mountain, = 1 - h/H
        np.testing.assert_allclose(np.asarray(t.jac_c),
                                   1.0 - np.asarray(t.h_c) / g.Lz, rtol=1e-12)
        # slopes antisymmetric about the peak
        sx = np.asarray(t.sx_xf)[0]
        assert sx.max() > 0 and sx.min() < 0
        # surface level follows the terrain
        np.testing.assert_allclose(np.asarray(t.z_true_c[0, 0]),
                                   np.asarray(g.z_c[0]) * np.asarray(t.jac_c[0])
                                   + np.asarray(t.h_c[0]), rtol=1e-10)

    def test_reference_hydrostatic_on_true_heights(self):
        """Per-column discrete balance on the terrain's physical heights."""
        g = terrain_grid()
        t = make_terrain(g, CONST, witch_of_agnesi())
        p = np.asarray(t.p_ref, np.float64)
        rho = np.asarray(t.rho_ref, np.float64)
        z = np.asarray(t.z_true_c, np.float64)
        res = ((p[1:] - p[:-1]) / (z[1:] - z[:-1])
               + 9.81 * 0.5 * (rho[1:] + rho[:-1]))
        np.testing.assert_allclose(res, 0.0, atol=1e-8)

    def test_flat_terrain_reduces_to_column(self):
        g = terrain_grid()
        t = make_terrain(g, CONST, lambda x, y: 0.0 * x)
        model = make_compressible_model(g, reference_potential_temperature=300.0)
        np.testing.assert_allclose(
            np.asarray(t.p_ref[:, 0, 0]), np.asarray(model.reference.p_c),
            rtol=1e-10)


class TestContravariant:
    def test_flat_terrain_w_tilde_equals_w(self):
        from breeze_tpu import fields as fl
        g = terrain_grid()
        t = make_terrain(g, CONST, lambda x, y: 0.0 * x)
        model = make_compressible_model(g, reference_potential_temperature=300.0)
        so = model.stencil_ops()
        rng = np.random.default_rng(0)
        ru = jnp.asarray(rng.normal(size=g.shape))
        rv = jnp.zeros(g.shape)
        rw = jnp.asarray(rng.normal(size=g.shape))
        wt = contravariant_rho_w(t, so, fl.pad(ru, g, fl.CCF),
                                 fl.pad(rv, g, fl.CFC), rw)
        np.testing.assert_allclose(np.asarray(wt), np.asarray(rw), atol=1e-12)

    def test_kinematic_bottom_on_slope(self):
        from breeze_tpu import fields as fl
        g = terrain_grid()
        t = make_terrain(g, CONST, witch_of_agnesi())
        model = make_compressible_model(g, reference_potential_temperature=300.0)
        so = model.stencil_ops()
        ru = jnp.ones(g.shape)   # uniform eastward momentum
        rv = jnp.zeros(g.shape)
        rw0 = np.asarray(kinematic_bottom_rho_w(t, so, ru, rv))
        sx_c = np.asarray(0.5 * (t.sx_xf + jnp.roll(t.sx_xf, -1, axis=1)))[0]
        # windward slope (sx > 0): upward surface flux; lee: downward
        assert rw0[0, sx_c > 1e-4].min() > 0
        assert rw0[0, sx_c < -1e-4].max() < 0


class TestTerrainDynamics:
    def test_rest_state_over_terrain(self):
        """Resting atmosphere over a mountain stays at rest (the key
        terrain contract — reference terrain rest-state tests)."""
        g = terrain_grid(nx=48, nz=20)
        t = make_terrain(g, CONST, witch_of_agnesi(h0=200.0))
        model = make_compressible_model(
            g, advection=bz.Centered(2), reference_potential_temperature=300.0)
        state = terrain_initial_state(model, t)
        dt = 0.05   # explicit path: acoustic CFL limited
        for _ in range(40):
            state = terrain_explicit_rk3_step(model, t, state, dt)
        w = np.asarray(state.rho_w)
        assert np.isfinite(w).all()
        assert np.abs(w[1:]).max() < 1e-4, (
            f"terrain rest state: max interior |rho_w| = {np.abs(w[1:]).max()}")

    def test_mountain_wave_updraft_on_windward_slope(self):
        """Uniform flow over a hill: windward updraft at the surface (the
        Schär/mountain-wave capability, examples/two_dimension_mountain_wave.jl)."""
        g = terrain_grid(nx=64, nz=20)
        t = make_terrain(g, CONST, witch_of_agnesi(h0=100.0, a=3000.0))
        model = make_compressible_model(
            g, advection=bz.Centered(2), reference_potential_temperature=300.0)
        state = terrain_initial_state(model, t, u=10.0)
        dt = 0.05
        for _ in range(100):
            state = terrain_explicit_rk3_step(model, t, state, dt)
        w = np.asarray(state.rho_w)
        assert np.isfinite(w).all()
        sx_c = np.asarray(0.5 * (t.sx_xf + jnp.roll(t.sx_xf, -1, axis=1)))[0]
        surf_w = w[0, 0]
        assert surf_w[sx_c > 1e-4].mean() > 0, "windward surface flux upward"
        # low-level w above the windward slope positive
        assert w[2, 0, (sx_c > 1e-4)].mean() > 0


class TestTerrainSplitExplicit:
    """Terrain through the acoustic substepper (reference
    ``terrain_compressible_physics.jl:486-659`` split-explicit dispatch)."""

    def test_flat_terrain_matches_flat_path_one_step(self):
        """With h=0 the terrain acoustic path reduces to the flat path at
        machine precision in a single step (all metric factors exact)."""
        import jax
        from breeze_tpu.dynamics.compressible import (
            acoustic_rk3_step, compressible_initial_state)
        g = terrain_grid(nx=48, nz=20)
        t = make_terrain(g, CONST, lambda x, y: 0.0 * x)
        m0 = make_compressible_model(g, advection=bz.Centered(2))
        mt = make_compressible_model(g, advection=bz.Centered(2), terrain=t)
        th = lambda x, y, z: (300.0
                              + 0.5 * jnp.exp(-((x - 10e3) ** 2) / 2e3 ** 2)
                              * jnp.exp(-((z - 3e3) ** 2) / 1e3 ** 2))
        s = compressible_initial_state(m0, theta=th, u=lambda x, y, z: 3.0 + 0 * z)
        a = acoustic_rk3_step(m0, s, 2.0)
        b = acoustic_rk3_step(mt, s, 2.0)
        for f in ("rho", "rho_u", "rho_w", "rho_theta"):
            x, y = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
            scale = max(np.abs(x).max(), 1e-30)
            assert np.abs(x - y).max() / scale < 1e-12, f

    def test_rest_state_over_terrain_split_explicit(self):
        """Resting atmosphere over a mountain stays at machine-zero rest
        through the split-explicit core at Δt ≫ the acoustic-explicit limit."""
        import jax
        from breeze_tpu.dynamics.compressible import acoustic_rk3_step
        g = terrain_grid(nx=48, nz=20)
        t = make_terrain(g, CONST, witch_of_agnesi(h0=200.0))
        m = make_compressible_model(g, advection=bz.Centered(2), terrain=t)
        s = terrain_initial_state(m, t)
        step = jax.jit(lambda st: acoustic_rk3_step(m, st, 2.0))
        for _ in range(20):
            s = step(s)
        w = np.asarray(s.rho_w)
        assert np.isfinite(w).all()
        assert np.abs(w[1:]).max() < 1e-10, (
            f"split-explicit terrain rest: max |rho_w| = {np.abs(w[1:]).max()}")

class TestSLEVE:
    """TwoLevelDecay / SLEVE formulation (reference
    ``terrain_formulations.jl:88-200``, Schär et al. 2002)."""

    def sleve_terrain(self, g, h0=250.0):
        return make_terrain(g, CONST, witch_of_agnesi(h0=h0),
                            large_scale_height=6000.0,
                            small_scale_height=3000.0,
                            sleve_smoothing_passes=10)

    def test_metric_consistency(self):
        """J == ∂z/∂ζ and slope == ∂z/∂x of the realized coordinate map."""
        g = terrain_grid()
        t = self.sleve_terrain(g)
        z = np.asarray(t.z_true_c, np.float64)          # (nz, 1, nx)
        zeta_c = np.asarray(g.z_c, np.float64)
        # J at interior ζ-faces from finite differences of z(ζ)
        J_fd = (z[1:] - z[:-1]) / (zeta_c[1:, None, None] - zeta_c[:-1, None, None])
        J_cf = np.asarray(t.jac_cf, np.float64)[1:]     # faces 1..nz-1
        # sinh basis is smooth: centered FD converges; loose tol for curvature
        np.testing.assert_allclose(J_fd, J_cf, rtol=2e-3)
        # terrain decays upward: near the top the levels are nearly flat
        assert (z[-1].max() - z[-1].min()) < 0.02 * float(t.h_total.max())
        # small scale decays faster than large scale
        b1 = np.asarray(t.decay_c)
        b2 = np.asarray(t.basis2_c)
        assert (b2[1:] <= b1[1:] + 1e-12).all()
        # slope field == ∂x z_true at ζ-centers (x-face differences)
        sx = np.asarray(t.slope_x(at_zface=False), np.float64)
        sx_fd = (z - np.roll(z, 1, axis=2)) / g.dx
        np.testing.assert_allclose(sx, sx_fd, atol=1e-10)

    def test_h_split_reconstructs_total(self):
        g = terrain_grid()
        t = self.sleve_terrain(g)
        h_fn = witch_of_agnesi()
        h_exact = h_fn(g.x_c()[None, :], np.zeros((1, 1)))
        np.testing.assert_allclose(np.asarray(t.h_total), h_exact, atol=1e-10)
        assert float(np.abs(np.asarray(t.h2_c)).max()) > 1.0  # split is real

    def test_rest_state_split_explicit_sleve(self):
        """Machine-zero rest over SLEVE terrain through the acoustic core —
        exercises the ζ-dependent-Jacobian tridiagonal couplings."""
        import jax
        from breeze_tpu.dynamics.compressible import acoustic_rk3_step
        g = terrain_grid(nx=48, nz=20)
        t = self.sleve_terrain(g, h0=200.0)
        m = make_compressible_model(g, advection=bz.Centered(2), terrain=t)
        s = terrain_initial_state(m, t)
        step = jax.jit(lambda st: acoustic_rk3_step(m, st, 2.0))
        for _ in range(20):
            s = step(s)
        w = np.asarray(s.rho_w)
        assert np.isfinite(w).all()
        assert np.abs(w[1:]).max() < 1e-10, (
            f"SLEVE rest: max |rho_w| = {np.abs(w[1:]).max()}")

    def test_sleve_mountain_wave_matches_linear_decay(self):
        """Same physical mountain through SLEVE vs Gal-Chen coordinates:
        the physical solution must agree (coordinate-independence)."""
        import jax
        from breeze_tpu.dynamics.compressible import acoustic_rk3_step
        g = terrain_grid(nx=48, nz=20)
        hfn = witch_of_agnesi(h0=100.0, a=3000.0)
        tl = make_terrain(g, CONST, hfn)
        ts = make_terrain(g, CONST, hfn, large_scale_height=7000.0,
                          small_scale_height=5000.0, sleve_smoothing_passes=6)
        ml = make_compressible_model(g, advection=bz.Centered(2), terrain=tl)
        ms = make_compressible_model(g, advection=bz.Centered(2), terrain=ts)
        sl = terrain_initial_state(ml, tl, u=10.0)
        ss = terrain_initial_state(ms, ts, u=10.0)
        stepl = jax.jit(lambda st: acoustic_rk3_step(ml, st, 1.0))
        steps = jax.jit(lambda st: acoustic_rk3_step(ms, st, 1.0))
        for _ in range(20):
            sl = stepl(sl)
            ss = steps(ss)
        wl, ws = np.asarray(sl.rho_w), np.asarray(ss.rho_w)
        assert np.isfinite(ws).all()
        # different vertical coordinates sample different physical heights;
        # compare amplitude and broad pattern
        assert abs(np.abs(ws).max() - np.abs(wl).max()) / np.abs(wl).max() < 0.15
        corr = np.corrcoef(wl.ravel(), ws.ravel())[0, 1]
        assert corr > 0.9, f"SLEVE vs linear-decay correlation {corr}"

class TestTerrainSplitExplicitMountainWave:
    def test_mountain_wave_split_matches_explicit(self):
        """Schär-style mountain wave: the split-explicit terrain core at
        20x the explicit Δt reproduces the explicit solution (amplitude to
        <2%, pattern correlation >0.97)."""
        import jax
        from breeze_tpu.dynamics.compressible import acoustic_rk3_step
        g = terrain_grid(nx=48, nz=20)
        t = make_terrain(g, CONST, witch_of_agnesi(h0=100.0, a=3000.0))
        me = make_compressible_model(g, advection=bz.Centered(2))
        ms = make_compressible_model(g, advection=bz.Centered(2), terrain=t)
        se = terrain_initial_state(me, t, u=10.0)
        ss = se
        stepe = jax.jit(lambda st: terrain_explicit_rk3_step(me, t, st, 0.05))
        steps = jax.jit(lambda st: acoustic_rk3_step(ms, st, 1.0))
        for _ in range(400):
            se = stepe(se)
        for _ in range(20):
            ss = steps(ss)
        we, ws = np.asarray(se.rho_w), np.asarray(ss.rho_w)
        assert np.isfinite(ws).all()
        assert abs(np.abs(ws).max() - np.abs(we).max()) / np.abs(we).max() < 0.02
        corr = np.corrcoef(we.ravel(), ws.ravel())[0, 1]
        assert corr > 0.97, f"pattern correlation {corr}"

class TestTerrainLatLon:
    """Terrain on latitude-longitude grids: metric-correct slopes (zonal
    spacing R cosφ Δλ) + spherical curvature terms through the terrain
    tendency paths."""

    def latlon_setup(self, h0=200.0):
        from breeze_tpu.grid import make_latlon_grid
        # ~0.5° band near 45°N: zonal spacing clearly != equatorial R Δλ
        g = make_latlon_grid((48, 4, 16), longitude=(0.0, 360.0),
                             latitude=(43.0, 47.0), z=(0.0, 10_000.0),
                             dtype=jnp.float64)
        lam0 = np.pi
        hfn = lambda lam, phi: h0 / (1.0 + ((lam - lam0)
                                            / (8.0 * np.pi / 48.0)) ** 2)
        t = make_terrain(g, CONST, hfn)
        return g, t, hfn

    def test_metric_slope(self):
        g, t, hfn = self.latlon_setup()
        # slope == Δh / (R cosφ Δλ), row-dependent through cosφ
        h = np.asarray(t.h_c, np.float64)
        sx = np.asarray(t.sx_xf, np.float64)
        coslat = np.asarray(g.coslat_c, np.float64)
        dx_eq = g.dx   # equatorial arc R·Δλ
        expect = (h - np.roll(h, 1, axis=1)) / (dx_eq * coslat[:, None])
        np.testing.assert_allclose(sx, expect, rtol=1e-12)
        # rows at different latitudes see different slopes for the same Δh
        assert abs(sx[0].max() / sx[-1].max() - coslat[-1] / coslat[0]) < 1e-6

    def test_rest_state_split_explicit_latlon_terrain(self):
        import jax
        from breeze_tpu.dynamics.compressible import (
            SplitExplicitTimeDiscretization, acoustic_rk3_step)
        from breeze_tpu.physics.coriolis import HydrostaticSphericalCoriolis
        g, t, _ = self.latlon_setup()
        m = make_compressible_model(
            g, advection=bz.Centered(2), terrain=t,
            coriolis=HydrostaticSphericalCoriolis(),
            time_discretization=SplitExplicitTimeDiscretization(substeps=4))
        s = terrain_initial_state(m, t)
        step = jax.jit(lambda st: acoustic_rk3_step(m, st, 2.0))
        for _ in range(20):
            s = step(s)
        w = np.asarray(s.rho_w)
        assert np.isfinite(w).all()
        assert np.abs(w[1:]).max() < 1e-10, (
            f"lat-lon terrain rest: max |rho_w| = {np.abs(w[1:]).max()}")

    def test_narrow_band_matches_cartesian(self):
        """Mountain wave on a thin equatorial lat-lon band reproduces the
        equivalent Cartesian channel solution (curvature negligible)."""
        import jax
        from breeze_tpu.grid import make_latlon_grid
        from breeze_tpu.dynamics.compressible import (
            SplitExplicitTimeDiscretization, acoustic_rk3_step)
        R = 6.371e6
        nx, ny, nz = 48, 4, 16
        dlon = 20_000.0 / R * 180.0 / np.pi / nx   # 20 km circumference band
        g_ll = make_latlon_grid(
            (nx, ny, nz), longitude=(0.0, nx * dlon),
            latitude=(-ny * dlon / 2, ny * dlon / 2), z=(0.0, 10_000.0),
            dtype=jnp.float64)
        dy = R * dlon * np.pi / 180.0
        # the partial-circumference band is x-BOUNDED; match it
        g_ca = bz.make_grid(size=(nx, ny, nz),
                            extent=(20_000.0, ny * dy, 10_000.0),
                            topology=(bz.BOUNDED, bz.BOUNDED, bz.BOUNDED),
                            dtype=jnp.float64)
        h0, a = 120.0, 3000.0
        h_ca = witch_of_agnesi(h0=h0, a=a)
        lam_mid = 0.5 * nx * dlon * np.pi / 180.0
        h_ll = lambda lam, phi: h0 / (1.0 + ((lam - lam_mid) * R / a) ** 2)
        td = SplitExplicitTimeDiscretization(substeps=6)

        def run(g, hfn):
            t = make_terrain(g, CONST, hfn)
            m = make_compressible_model(g, advection=bz.Centered(2),
                                        terrain=t, time_discretization=td)
            s = terrain_initial_state(m, t, u=10.0)
            step = jax.jit(lambda st: acoustic_rk3_step(m, st, 1.0))
            for _ in range(30):
                s = step(s)
            return np.asarray(s.rho_w)

        w_ll = run(g_ll, h_ll)
        w_ca = run(g_ca, h_ca)
        assert np.isfinite(w_ll).all()
        np.testing.assert_allclose(w_ll, w_ca, atol=5e-4 * np.abs(w_ca).max()
                                   + 1e-12, rtol=0.02)
