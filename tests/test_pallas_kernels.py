"""Pallas fused WENO kernel vs the jnp reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import breeze_tpu as bz
from breeze_tpu import advection as adv
from breeze_tpu import fields as fl
from breeze_tpu.ops import StencilOps
from breeze_tpu.pallas_kernels import advection as padv


def make_inputs(nz=8, ny=32, nx=128, seed=0):
    g = bz.make_grid(size=(nx, ny, nz), extent=(1000.0, 500.0, 300.0),
                     topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                     halo=3, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    c = jnp.asarray(rng.normal(300.0, 1.0, g.shape).astype(np.float32))
    u = jnp.asarray(rng.normal(0.0, 2.0, g.shape).astype(np.float32))
    v = jnp.asarray(rng.normal(0.0, 2.0, g.shape).astype(np.float32))
    w = jnp.asarray(rng.normal(0.0, 1.0, g.shape).astype(np.float32))
    w = fl.enforce_impenetrability(w, g)
    rho = jnp.asarray((1.0 + 0.1 * rng.normal(size=g.shape)).astype(np.float32))
    return g, c, u, v, w, rho


class TestFusedWENO:
    def test_matches_jnp_path(self):
        g, c, u, v, w, rho = make_inputs()
        so = StencilOps(g)
        scheme = adv.WENO(5)

        ref = -adv.div_rho_u_c(
            so, scheme, fl.pad(rho, g, fl.CCC), fl.pad(u, g, fl.CCF),
            fl.pad(v, g, fl.CFC), fl.pad(w, g, fl.FCC), fl.pad(c, g, fl.CCC))

        pz = lambda a, loc: padv.pad_zy(a, g, loc)
        got = padv.div_rho_u_c_pallas(
            g, pz(c, fl.CCC), pz(u, fl.CCF), pz(v, fl.CFC), pz(w, fl.FCC),
            pz(rho, fl.CCC), interpret=True)

        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-4, atol=5e-4)

    def test_supported_predicate(self):
        g, *_ = make_inputs()
        assert padv.supported(g, adv.WENO(5))
        assert not padv.supported(g, adv.WENO(9))
        assert not padv.supported(g, adv.Centered(2))
        g2 = bz.make_grid(size=(64, 17, 8), extent=(1.0, 1.0, 1.0),
                          topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED))
        assert not padv.supported(g2, adv.WENO(5))  # ny=17 unblockable


class TestFusedMomentum:
    def _check(self, nz=8, ny=32, nx=128, ztopo=None):
        from breeze_tpu.pallas_kernels import momentum as pmom
        g, c, u, v, w, rho = make_inputs(nz=nz, ny=ny, nx=nx)
        so = StencilOps(g)
        scheme = adv.WENO(5)
        rng = np.random.default_rng(3)
        ru = jnp.asarray(rng.normal(0.0, 1.0, g.shape).astype(np.float32))
        rv = jnp.asarray(rng.normal(0.0, 1.0, g.shape).astype(np.float32))
        rw = fl.enforce_impenetrability(
            jnp.asarray(rng.normal(0.0, 1.0, g.shape).astype(np.float32)), g)

        ref = adv.momentum_flux_divergence(
            so, scheme,
            fl.pad(ru, g, fl.CCF), fl.pad(rv, g, fl.CFC), fl.pad(rw, g, fl.FCC),
            fl.pad(u, g, fl.CCF), fl.pad(v, g, fl.CFC), fl.pad(w, g, fl.FCC))

        pz = lambda a, loc: padv.pad_zy(a, g, loc)
        got = pmom.momentum_div_pallas(
            g, pz(ru, fl.CCF), pz(rv, fl.CFC), pz(rw, fl.FCC),
            pz(u, fl.CCF), pz(v, fl.CFC), pz(w, fl.FCC), interpret=True)

        for name, a, b in zip("uvw", got, ref):
            a, b = np.asarray(a), np.asarray(b)
            if name == "w":
                a, b = a[1:], b[1:]   # wall row k=0 overwritten by stepper
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4,
                                       err_msg=f"momentum component {name}")

    def test_matches_jnp_path(self):
        self._check()

    def test_matches_jnp_path_larger(self):
        self._check(nz=16, ny=64, nx=128)

    def test_supported_predicate(self):
        from breeze_tpu.pallas_kernels import momentum as pmom
        g, *_ = make_inputs()
        assert pmom.supported(g, adv.WENO(5))
        assert not pmom.supported(g, adv.WENO(5, bounds_preserving=True))
        assert not pmom.supported(g, adv.Centered(2))

    def test_cols_variant_matches_jnp_path(self):
        """ρᵣ(z)-column variant (the anelastic hot path: momenta formed
        in VMEM) against the jnp path with ρu = ρᵣ·u."""
        from breeze_tpu.model import _padded_reference_columns, make_model
        from breeze_tpu.pallas_kernels import momentum as pmom
        g, c, u, v, w, rho = make_inputs(nz=8, ny=32, nx=128)
        model = make_model(g, advection=adv.WENO(5),
                           potential_temperature=300.0)
        so = StencilOps(g)
        scheme = adv.WENO(5)

        colc_g, colf_g = _padded_reference_columns(model)   # grid halo
        u_pad, v_pad, w_pad = (fl.pad(u, g, fl.CCF), fl.pad(v, g, fl.CFC),
                               fl.pad(w, g, fl.FCC))
        ref = adv.momentum_flux_divergence(
            so, scheme, u_pad * colc_g, v_pad * colc_g, w_pad * colf_g,
            u_pad, v_pad, w_pad)

        pz = lambda a, loc: padv.pad_zy(a, g, loc)
        colc, colf = _padded_reference_columns(model, halo=pmom.H)
        got = pmom.momentum_div_pallas_cols(
            g, pz(u, fl.CCF), pz(v, fl.CFC), pz(w, fl.FCC), colc, colf,
            interpret=True)

        for name, a, b in zip("uvw", got, ref):
            a, b = np.asarray(a), np.asarray(b)
            if name == "w":
                a, b = a[1:], b[1:]
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4,
                                       err_msg=f"momentum component {name}")
