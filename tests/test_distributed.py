"""Distributed execution tests on an 8-virtual-device CPU mesh.

The key contract (SURVEY.md §4): sharded and single-device runs agree
allclose.  Exercises both execution paths — GSPMD (jit + NamedSharding) and
the explicit shard_map halo exchange.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import breeze_tpu as bz
from breeze_tpu import fields as fl
from breeze_tpu.model import initial_state, make_model
from breeze_tpu.parallel.halo import pad_axis_sharded, shard_axes
from breeze_tpu.parallel.mesh import (device_put_replicated_model,
                                      device_put_sharded_state, factor_mesh,
                                      make_mesh, shard_step, state_sharding)
from breeze_tpu.timesteppers import ssp_rk3_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def bomex_like(nx=32, ny=16, nz=8):
    g = bz.make_grid(size=(nx, ny, nz), extent=(6400.0, 3200.0, 1600.0),
                     topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                     dtype=jnp.float32)
    model = make_model(g, advection=bz.WENO(5), potential_temperature=300.0,
                      microphysics=bz.SaturationAdjustment(
                          equilibrium=bz.WarmPhaseEquilibrium()),
                      coriolis=bz.FPlane(1e-4))

    def theta0(x, y, z):
        return (300.0 + 1.5 * jnp.exp(-((x - 3200.0) ** 2 + (y - 1600.0) ** 2
                                        + (z - 500.0) ** 2) / 400.0 ** 2))

    state = initial_state(model, theta=theta0,
                          qt=lambda x, y, z: 0.01 * jnp.exp(-z / 1000.0))
    return model, state


class TestMeshHelpers:
    def test_factor_mesh(self):
        assert factor_mesh(8) in ((4, 2), (2, 4))
        assert factor_mesh(4) == (2, 2)
        assert factor_mesh(1) == (1, 1)

    def test_make_mesh(self):
        mesh = make_mesh(jax.devices()[:8])
        assert set(mesh.axis_names) == {"x", "y"}
        assert mesh.devices.size == 8


class TestGSPMD:
    def test_sharded_step_matches_single_device(self):
        """The core distributed contract: sharded == single-device."""
        model, state = bomex_like()
        ref_state = jax.jit(ssp_rk3_step)(model, state, 2.0)
        for _ in range(2):
            ref_state = jax.jit(ssp_rk3_step)(model, ref_state, 2.0)

        mesh = make_mesh(jax.devices()[:8])
        model_s = device_put_replicated_model(mesh, model)
        state_s = device_put_sharded_state(mesh, state)
        step = shard_step(lambda m, s, dt: ssp_rk3_step(m, s, dt), mesh,
                          model_s, state_s, donate=False)
        out = state_s
        for _ in range(3):
            out = step(model_s, out, 2.0)

        np.testing.assert_allclose(np.asarray(out.rho_theta),
                                   np.asarray(ref_state.rho_theta),
                                   rtol=2e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.rho_w),
                                   np.asarray(ref_state.rho_w),
                                   rtol=2e-4, atol=1e-4)

    def test_output_stays_sharded(self):
        model, state = bomex_like()
        mesh = make_mesh(jax.devices()[:8])
        model_s = device_put_replicated_model(mesh, model)
        state_s = device_put_sharded_state(mesh, state)
        step = shard_step(lambda m, s, dt: ssp_rk3_step(m, s, dt), mesh,
                          model_s, state_s, donate=False)
        out = step(model_s, state_s, 1.0)
        shard_shape = out.rho_theta.sharding.shard_shape(out.rho_theta.shape)
        assert shard_shape[1] < out.rho_theta.shape[1] or \
            shard_shape[2] < out.rho_theta.shape[2], "fields must stay sharded"


class TestShardMapHalo:
    def test_ppermute_halo_matches_wrap(self):
        """shard_map halo exchange reproduces the single-device wrap pad."""
        n_dev = 8
        mesh = jax.make_mesh((n_dev,), ("x",))
        nx = 64
        a = jnp.arange(4 * 4 * nx, dtype=jnp.float32).reshape(4, 4, nx)
        h = 3

        def local_pad(block):
            with shard_axes({2: "x"}):
                return pad_axis_sharded(block, 2, h)

        padded_shards = jax.jit(
            jax.shard_map(local_pad, mesh=mesh,
                          in_specs=P(None, None, "x"),
                          out_specs=P(None, None, "x")))(a)
        # Each shard's padded block: [left-nbr top h | shard | right-nbr bottom h]
        # Reassemble shard 0's halo and compare with the global wrap pad.
        per_shard = nx // n_dev
        shard0 = np.asarray(padded_shards)[:, :, : per_shard + 2 * h]
        expected_left = np.asarray(a[:, :, -h:])        # global wrap
        np.testing.assert_array_equal(shard0[:, :, :h], expected_left)
        np.testing.assert_array_equal(shard0[:, :, h:h + per_shard],
                                      np.asarray(a[:, :, :per_shard]))
        np.testing.assert_array_equal(shard0[:, :, h + per_shard:],
                                      np.asarray(a[:, :, per_shard:per_shard + h]))

    def test_sharded_stencil_matches_dense(self):
        """A derivative computed per-shard with exchanged halos equals the
        single-device operator."""
        n_dev = 4
        mesh = jax.make_mesh((n_dev,), ("x",))
        g = bz.make_grid(size=(32, 4, 4), extent=(2 * np.pi, 1.0, 1.0),
                         topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                         dtype=jnp.float64)
        x = jnp.asarray(g.x_c())[None, None, :]
        c = jnp.sin(x) * jnp.ones(g.shape)

        from breeze_tpu.ops import StencilOps
        so = StencilOps(g)
        dense = so.dx_cf(fl.pad(c, g, fl.CCC))

        def local_dx(block):
            with shard_axes({2: "x"}):
                p = pad_axis_sharded(block, 2, g.halo)
            # same stencil arithmetic, local window
            return (p[:, :, g.halo:-g.halo] - p[:, :, g.halo - 1:-g.halo - 1]) / g.dx

        sharded = jax.jit(
            jax.shard_map(local_dx, mesh=mesh,
                          in_specs=P(None, None, "x"),
                          out_specs=P(None, None, "x")))(c)
        np.testing.assert_allclose(np.asarray(sharded), np.asarray(dense),
                                   atol=1e-13)
