"""Inertia-gravity wave — compressible HEVI gravity-wave dispersion
(reference examples/inertia_gravity_wave.jl; Skamarock & Klemp 1994 setup;
BASELINE config 3).

Run:  python examples/inertia_gravity_wave.py [--quick]
"""

import argparse

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.dynamics.compressible import (
    SplitExplicitTimeDiscretization, acoustic_rk3_step, compressible_diagnose,
    compressible_initial_state, make_compressible_model)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    nx = 75 if args.quick else 300
    grid = bz.make_grid(size=(nx, 1, 20), extent=(300_000.0, 1.0, 10_000.0),
                        topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                        halo=3, dtype=jnp.float64)

    N_bv = 0.01
    g_acc = 9.81
    theta_bar = lambda z: 300.0 * np.exp(N_bv ** 2 / g_acc * z)

    model = make_compressible_model(
        grid, advection=bz.Centered(2),
        reference_potential_temperature=theta_bar,
        time_discretization=SplitExplicitTimeDiscretization(substeps=10))

    # SK94 θ' perturbation
    def theta0(x, y, z):
        base = 300.0 * jnp.exp(N_bv ** 2 / g_acc * z)
        pert = 0.01 * jnp.sin(jnp.pi * z / 10_000.0) / (
            1.0 + ((x - 100_000.0) / 5_000.0) ** 2)
        return base + pert

    state = compressible_initial_state(model, theta=theta0)

    T = 1000.0 if args.quick else 3000.0
    dt = 12.0
    for i in range(int(T / dt)):
        state = acoustic_rk3_step(model, state, dt)

    aux = compressible_diagnose(model, state)
    theta_ref = np.asarray([float(theta_bar(z)) for z in np.asarray(grid.z_c)])
    theta_pert = np.asarray(aux.theta)[:, 0, :] - theta_ref[:, None]
    print(f"t = {T}s: θ' range [{theta_pert.min():.4f}, {theta_pert.max():.4f}] K")
    print(f"wave dispersed from the initial single peak: "
          f"{(np.abs(theta_pert[10]) > 1e-4).sum()} active columns")
    assert np.isfinite(theta_pert).all()


if __name__ == "__main__":
    main()
