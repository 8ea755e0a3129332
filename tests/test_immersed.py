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


class TestPartialCellBottom:
    """PartialCellBottom (reference re-export, src/Breeze.jl:182/207):
    shortened bottom cells with exact area-weighted scalar conservation."""

    def pcb_setup(self, n=32, nz=16):
        from breeze_tpu.dynamics.immersed import make_partial_cell_bottom
        g = bz.make_grid(size=(n, 1, nz), extent=(8000.0, 1.0, 4000.0),
                         topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                         dtype=jnp.float64)
        hill = lambda x, y: 1000.0 * np.exp(-((x - 4000.0) / 1000.0) ** 2)
        ib = make_partial_cell_bottom(g, hill)
        model = make_model(g, advection=bz.WENO(5),
                           potential_temperature=300.0, immersed=ib)
        return g, ib, model

    def test_partial_geometry(self):
        g, ib, model = self.pcb_setup()
        frac = np.asarray(ib.frac_c)
        dz3 = np.asarray(ib.dz_c3)
        mc = np.asarray(ib.mask_c)
        z_f = np.asarray(g.z_f)
        h = np.asarray(ib.bottom_height)
        dz = float(g.Lz / g.nz)
        # interior cells full thickness; fluid everywhere frac in [min, 1]
        assert frac[-1].min() == 1.0
        assert (frac >= ib.minimum_fraction - 1e-12).all()
        # each column's lowest FLUID cell thickness equals the open height
        # (clamped), i.e. dz3 = z_f[k+1] - h there
        for i in range(g.nx):
            col = mc[:, 0, i]
            k0 = int(np.argmax(col > 0))
            open_h = z_f[k0 + 1] - h[0, i]
            np.testing.assert_allclose(dz3[k0, 0, i], min(open_h, dz),
                                       rtol=1e-12)
            # everything above is full
            np.testing.assert_allclose(dz3[k0 + 1:, 0, i], dz, rtol=1e-12)
        # the partial cell really is partial somewhere on the hill flank
        assert frac[mc > 0].min() < 0.95

    def test_rest_state(self):
        g, ib, model = self.pcb_setup()
        state = initial_state(model)
        for _ in range(10):
            state = ssp_rk3_step(model, state, 5.0)
        aux = diagnose(model, state)
        assert float(jnp.abs(aux.w).max()) < 1e-10

    def test_scalar_conservation_partial_volumes(self):
        """Σ ρθ·(frac·Δz) is conserved under flow over the partial-cell
        hill — the area-weighted divergence telescopes exactly."""
        from breeze_tpu.dynamics.immersed import mask_state
        g, ib, model = self.pcb_setup()
        theta0 = lambda x, y, z: 300.0 + 0.5 * jnp.sin(
            2 * jnp.pi * x / 8000.0) * jnp.exp(-z / 2000.0)
        state = initial_state(model, theta=theta0,
                              u=3.0 * jnp.ones(g.shape))
        state = mask_state(ib, state)
        wgt = np.asarray(ib.dz_c3) * np.asarray(ib.mask_c)
        m0 = float(jnp.sum(state.rho_theta * wgt))
        for _ in range(10):
            state = ssp_rk3_step(model, state, 2.0)
        m1 = float(jnp.sum(state.rho_theta * wgt))
        np.testing.assert_allclose(m1, m0, rtol=1e-12)
        assert bool(jnp.all(jnp.isfinite(state.rho_theta)))

    def test_flow_deflects_and_stays_finite(self):
        g, ib, model = self.pcb_setup()
        from breeze_tpu.dynamics.immersed import mask_state
        state = initial_state(model, u=5.0 * jnp.ones(g.shape))
        state = mask_state(ib, state)
        for _ in range(20):
            state = ssp_rk3_step(model, state, 2.0)
        aux = diagnose(model, state)
        assert bool(jnp.all(jnp.isfinite(aux.u)))
        assert float(np.asarray(aux.w).max()) > 0.01  # deflection aloft
        solid_u = np.asarray(state.rho_u)[np.asarray(ib.mask_u) == 0.0]
        np.testing.assert_allclose(solid_u, 0.0, atol=1e-12)
