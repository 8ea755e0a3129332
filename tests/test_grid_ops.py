"""Unit tests for grid construction, halo padding, and stencil operators.

Mirrors the reference's substrate unit tests (SURVEY.md §7 phase 1):
operators checked against hand-computed stencils and analytic derivatives.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import breeze_tpu as bz
from breeze_tpu import fields as fl
from breeze_tpu.ops import StencilOps


def small_grid(halo=3):
    return bz.make_grid(size=(8, 6, 5), extent=(8.0, 6.0, 5.0),
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                        halo=halo, dtype=jnp.float64)


class TestGrid:
    def test_shapes_and_spacings(self):
        g = small_grid()
        assert g.shape == (5, 6, 8)
        assert g.dx == 1.0 and g.dy == 1.0
        np.testing.assert_allclose(np.asarray(g.dz_c), 1.0)
        np.testing.assert_allclose(np.asarray(g.z_c), np.arange(5) + 0.5)

    def test_stretched_z(self):
        z_f = np.array([0.0, 1.0, 2.5, 4.5, 7.0, 10.0])
        g = bz.make_grid(size=(4, 4, 5), x=(0, 4), y=(0, 4), z=z_f,
                         topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED))
        np.testing.assert_allclose(np.asarray(g.dz_c), np.diff(z_f))
        assert not g.uniform_z

    def test_piecewise_stretched(self):
        z_f = bz.piecewise_stretched_z(32, surface_layer_height=500.0,
                                       surface_layer_spacing=50.0, top=3000.0)
        assert z_f.shape == (33,)
        assert z_f[0] == 0.0
        np.testing.assert_allclose(z_f[-1], 3000.0)
        np.testing.assert_allclose(np.diff(z_f)[:10], 50.0)
        assert np.all(np.diff(z_f) > 0)


class TestHalo:
    def test_periodic_wrap(self):
        g = small_grid(halo=2)
        a = jnp.arange(5 * 6 * 8, dtype=jnp.float64).reshape(5, 6, 8)
        p = fl.pad(a, g, fl.CCC)
        assert p.shape == (9, 10, 12)
        np.testing.assert_array_equal(p[2:-2, 2:-2, :2], a[:, :, -2:])
        np.testing.assert_array_equal(p[2:-2, 2:-2, -2:], a[:, :, :2])

    def test_bounded_center_mirror(self):
        g = small_grid(halo=2)
        a = jnp.arange(5.0)[:, None, None] * jnp.ones((5, 6, 8))
        p = fl.pad(a, g, fl.CCC)
        # ghost below mirror interior: [1, 0 | 0, 1, ...]
        np.testing.assert_allclose(p[0, 2, 2], 1.0)
        np.testing.assert_allclose(p[1, 2, 2], 0.0)
        np.testing.assert_allclose(p[-1, 2, 2], 3.0)
        np.testing.assert_allclose(p[-2, 2, 2], 4.0)

    def test_bounded_face_odd(self):
        g = small_grid(halo=2)
        w = jnp.zeros((5, 6, 8)).at[:, 0, 0].set(jnp.array([0.0, 1.0, 2.0, 3.0, 4.0]))
        p = fl.pad(w, g, fl.FCC)
        col = np.asarray(p[:, 2, 2])
        # lower ghosts: -w[2], -w[1]
        np.testing.assert_allclose(col[0], -2.0)
        np.testing.assert_allclose(col[1], -1.0)
        # stored faces
        np.testing.assert_allclose(col[2:7], [0, 1, 2, 3, 4])
        # upper wall face 5 = 0, then -w[4]
        np.testing.assert_allclose(col[7], 0.0)
        np.testing.assert_allclose(col[8], -4.0)


class TestOps:
    def test_dx_exact_for_linear(self):
        """Centered differences are exact for trigonometric modes on periodic x."""
        g = bz.make_grid(size=(32, 4, 4), extent=(2 * np.pi, 1, 1),
                         topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                         dtype=jnp.float64)
        so = StencilOps(g)
        x_c = jnp.asarray(g.x_c())[None, None, :]
        x_f = jnp.asarray(g.x_f())[None, None, :]
        c = jnp.sin(x_c) * jnp.ones(g.shape)
        d = so.dx_cf(fl.pad(c, g, fl.CCC))
        expected = (jnp.sin(x_f + g.dx / 2) - jnp.sin(x_f - g.dx / 2)) / g.dx
        np.testing.assert_allclose(np.asarray(d), np.asarray(expected * jnp.ones(g.shape)),
                                   atol=1e-12)

    def test_dz_stretched(self):
        z_f = np.array([0.0, 1.0, 3.0, 6.0, 10.0])
        g = bz.make_grid(size=(4, 4, 4), x=(0, 1), y=(0, 1), z=z_f,
                         topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                         dtype=jnp.float64)
        so = StencilOps(g)
        c = jnp.asarray(g.z_c)[:, None, None] * jnp.ones(g.shape)  # c = z
        d = so.dz_cf(fl.pad(c, g, fl.CCC))
        # interior faces: exact derivative = 1
        np.testing.assert_allclose(np.asarray(d[1:, 0, 0]), 1.0)

    def test_divergence_of_constant_is_zero(self):
        g = small_grid()
        so = StencilOps(g)
        u = jnp.ones(g.shape)
        v = jnp.ones(g.shape)
        w = jnp.zeros(g.shape)
        div = so.div_c(fl.pad(u, g, fl.CCF), fl.pad(v, g, fl.CFC), fl.pad(w, g, fl.FCC))
        np.testing.assert_allclose(np.asarray(div), 0.0, atol=1e-14)

    def test_divergence_matches_fd(self):
        rng = np.random.default_rng(0)
        g = small_grid()
        so = StencilOps(g)
        u = jnp.asarray(rng.normal(size=g.shape))
        div = so.div_c(fl.pad(u, g, fl.CCF),
                       fl.pad(jnp.zeros(g.shape), g, fl.CFC),
                       fl.pad(jnp.zeros(g.shape), g, fl.FCC))
        expected = (np.roll(np.asarray(u), -1, axis=2) - np.asarray(u)) / g.dx
        np.testing.assert_allclose(np.asarray(div), expected, atol=1e-12)
