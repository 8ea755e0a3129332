"""Immersed boundary (GridFittedBottom) tests (reference ImmersedBoundaryGrid
usage; stair-step terrain in the anelastic core)."""

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.dynamics.immersed import make_grid_fitted_bottom
from breeze_tpu.model import compute_tendencies, diagnose, initial_state, make_model
from breeze_tpu.timesteppers import ssp_rk3_step


def ib_setup(n=32, nz=16):
    g = bz.make_grid(size=(n, 1, nz), extent=(8000.0, 1.0, 4000.0),
                     topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                     dtype=jnp.float64)
    hill = lambda x, y: 1000.0 * jnp.exp(-((x - 4000.0) / 1000.0) ** 2)
    ib = make_grid_fitted_bottom(g, lambda x, y: 1000.0 * np.exp(
        -((x - 4000.0) / 1000.0) ** 2))
    model = make_model(g, advection=bz.WENO(5), potential_temperature=300.0,
                      immersed=ib)
    return g, ib, model


class TestMasks:
    def test_mask_geometry(self):
        g, ib, model = ib_setup()
        mc = np.asarray(ib.mask_c)
        # solid near the hill center at low levels, fluid at the top
        assert mc[0, 0, 16] == 0.0
        assert mc[-1].min() == 1.0
        # w faces bounding solid cells masked
        mw = np.asarray(ib.mask_w)
        assert mw[0].max() == 0.0  # bottom face row always wall-adjacent

    def test_rest_state_with_obstacle(self):
        g, ib, model = ib_setup()
        state = initial_state(model)
        for _ in range(10):
            state = ssp_rk3_step(model, state, 5.0)
        aux = diagnose(model, state)
        assert float(jnp.abs(aux.w).max()) < 1e-10

    def test_no_flow_into_solid(self):
        g, ib, model = ib_setup()
        state = initial_state(model, u=5.0 * jnp.ones(g.shape))
        for _ in range(10):
            state = ssp_rk3_step(model, state, 2.0)
        # momentum inside the solid stays zero
        solid_u = np.asarray(state.rho_u)[np.asarray(ib.mask_u) == 0.0]
        np.testing.assert_allclose(solid_u, 0.0, atol=1e-12)
        solid_w = np.asarray(state.rho_w)[np.asarray(ib.mask_w) == 0.0]
        np.testing.assert_allclose(solid_w, 0.0, atol=1e-12)
        # flow deflects over the obstacle: w > 0 on the windward side aloft
        aux = diagnose(model, state)
        w = np.asarray(aux.w)
        assert w.max() > 0.01

    def test_scalar_stays_out_of_solid(self):
        g, ib, model = ib_setup()
        state = initial_state(model, u=5.0 * jnp.ones(g.shape))
        theta0 = np.asarray(state.rho_theta).copy()
        for _ in range(10):
            state = ssp_rk3_step(model, state, 2.0)
        # θ in solid cells unchanged (no tendencies there)
        solid = np.asarray(ib.mask_c) == 0.0
        np.testing.assert_allclose(np.asarray(state.rho_theta)[solid],
                                   theta0[solid], atol=1e-10)
