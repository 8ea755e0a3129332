"""Vertically-implicit diffusion tests (reference test/vertical_diffusion.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

import breeze_tpu as bz
from breeze_tpu.dynamics.tridiagonal import thomas_solve
from breeze_tpu.model import initial_state, make_model
from breeze_tpu.physics.closures import ConstantDiffusivity
from breeze_tpu.timesteppers import ssp_rk3_step


class TestThomas:
    def test_matches_dense_solve(self):
        rng = np.random.default_rng(0)
        n, batch = 16, 5
        lower = rng.normal(size=(n, batch)) * 0.3
        upper = rng.normal(size=(n, batch)) * 0.3
        diag = 2.0 + rng.random((n, batch))
        rhs = rng.normal(size=(n, batch))
        x = np.asarray(thomas_solve(jnp.asarray(lower), jnp.asarray(diag),
                                    jnp.asarray(upper), jnp.asarray(rhs)))
        for b in range(batch):
            A = np.zeros((n, n))
            for k in range(n):
                A[k, k] = diag[k, b]
                if k > 0:
                    A[k, k - 1] = lower[k, b]
                if k < n - 1:
                    A[k, k + 1] = upper[k, b]
            expected = np.linalg.solve(A, rhs[:, b])
            np.testing.assert_allclose(x[:, b], expected, rtol=1e-10)


class TestImplicitDiffusion:
    def model_state(self, vertically_implicit):
        g = bz.make_grid(size=(8, 1, 32), extent=(800.0, 1.0, 1600.0),
                         topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                         dtype=jnp.float64)
        closure = ConstantDiffusivity(viscosity=5.0, diffusivity=5.0,
                                      vertically_implicit=vertically_implicit)
        model = make_model(g, potential_temperature=300.0, closure=closure)
        state = initial_state(
            model, u=lambda x, y, z: 3.0 * jnp.exp(-(z - 800.0) ** 2 / 100.0 ** 2))
        return g, model, state

    def test_implicit_stable_at_large_dt(self):
        """Explicit diffusion at dt >> dz²/κ blows up; implicit stays stable."""
        g, model, state = self.model_state(vertically_implicit=True)
        dz = float(g.dz_c[0])
        dt_unstable = 5.0 * dz * dz / 5.0   # 5× the explicit stability limit
        for _ in range(10):
            state = ssp_rk3_step(model, state, dt_unstable)
        assert bool(jnp.all(jnp.isfinite(state.rho_u)))
        # diffusion must decay the shear layer
        assert float(jnp.abs(state.rho_u).max()) < 3.5

    @pytest.mark.nightly
    def test_implicit_matches_explicit_at_small_dt(self):
        g, model_i, state_i = self.model_state(vertically_implicit=True)
        _, model_e, state_e = self.model_state(vertically_implicit=False)
        dt = 2.0  # well below the explicit limit (dz²/κ = 500)
        for _ in range(20):
            state_i = ssp_rk3_step(model_i, state_i, dt)
            state_e = ssp_rk3_step(model_e, state_e, dt)
        u_i = np.asarray(state_i.rho_u)
        u_e = np.asarray(state_e.rho_u)
        scale = np.abs(u_e).max()
        np.testing.assert_allclose(u_i / scale, u_e / scale, atol=0.02)

    def test_conservation_under_implicit_diffusion(self):
        g, model, state = self.model_state(vertically_implicit=True)
        state = initial_state(
            model, theta=lambda x, y, z: 300.0 + jnp.exp(-(z - 800.0) ** 2 / 100.0 ** 2))
        dzc = np.asarray(g.dz_c)[:, None, None]
        t0 = float(jnp.sum(state.rho_theta * dzc))
        for _ in range(5):
            state = ssp_rk3_step(model, state, 50.0)
        t1 = float(jnp.sum(state.rho_theta * dzc))
        np.testing.assert_allclose(t1, t0, rtol=1e-10)
