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
