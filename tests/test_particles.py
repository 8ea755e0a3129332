"""Lagrangian particle tests."""

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.model import diagnose, initial_state, make_model
from breeze_tpu.physics.particles import (LagrangianParticles, ParticleTracker,
                                          advect_particles, sample_velocities)
from breeze_tpu.simulation import IterationInterval, Simulation


def flow_model(u0=2.0):
    g = bz.make_grid(size=(32, 1, 16), extent=(3200.0, 1.0, 1600.0),
                     topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                     dtype=jnp.float64)
    model = make_model(g, potential_temperature=300.0)
    state = initial_state(model, u=u0 * jnp.ones(g.shape))
    return g, model, state


class TestParticles:
    def test_uniform_flow_translation(self):
        g, model, state = flow_model(u0=2.0)
        aux = diagnose(model, state)
        p = LagrangianParticles(x=jnp.array([100.0, 1000.0]),
                                y=jnp.array([0.5, 0.5]),
                                z=jnp.array([400.0, 800.0]))
        for _ in range(10):
            p = advect_particles(g, aux, p, 5.0)
        np.testing.assert_allclose(np.asarray(p.x), [100.0 + 100.0, 1100.0],
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p.z), [400.0, 800.0], atol=1e-8)

    def test_periodic_wrap(self):
        g, model, state = flow_model(u0=10.0)
        aux = diagnose(model, state)
        p = LagrangianParticles(x=jnp.array([3100.0]), y=jnp.array([0.5]),
                                z=jnp.array([800.0]))
        p = advect_particles(g, aux, p, 50.0)  # moves 500 m, wraps
        assert 0.0 <= float(p.x[0]) < 3200.0
        np.testing.assert_allclose(float(p.x[0]), (3100.0 + 500.0) % 3200.0,
                                   rtol=1e-6)

    def test_interpolation_linear_shear(self):
        g, model, state = flow_model()
        state = initial_state(model, u=lambda x, y, z: 0.001 * z)
        aux = diagnose(model, state)
        p = LagrangianParticles(x=jnp.array([1600.0]), y=jnp.array([0.5]),
                                z=jnp.array([750.0]))
        u, v, w = sample_velocities(g, aux, p)
        np.testing.assert_allclose(float(u[0]), 0.75, rtol=1e-6)

    def test_tracker_in_simulation(self):
        g, model, state = flow_model(u0=1.0)
        sim = Simulation(model, state, dt=5.0, stop_iteration=4, verbose=False)
        tracker = ParticleTracker(LagrangianParticles(
            x=jnp.array([500.0]), y=jnp.array([0.5]), z=jnp.array([400.0])))
        sim.add_callback(tracker, IterationInterval(1))
        sim.run()
        assert float(tracker.particles.x[0]) > 510.0
