"""Cloudy thermal bubble — moist thermodynamics + saturation adjustment
(reference examples/cloudy_thermal_bubble.jl; BASELINE config 2).

Run:  python examples/cloudy_thermal_bubble.py [--quick]
"""

import argparse

import jax.numpy as jnp

import breeze_tpu as bz
from breeze_tpu.simulation import IterationInterval, Simulation


def setup(n=128, quick=False):
    if quick:
        n = 48
    grid = bz.make_grid(size=(n, 1, n), extent=(20_000.0, 1.0, 10_000.0),
                        topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                        halo=3, dtype=jnp.float32)
    model = bz.make_model(
        grid, advection=bz.WENO(5), potential_temperature=300.0,
        microphysics=bz.SaturationAdjustment(equilibrium=bz.WarmPhaseEquilibrium()))

    def theta0(x, y, z):
        r = jnp.sqrt((x - 10_000.0) ** 2 + (z - 2_000.0) ** 2)
        return 300.0 + 2.0 * jnp.maximum(0.0, 1.0 - r / 2_000.0)

    def qt0(x, y, z):
        return 0.014 * jnp.exp(-z / 3_000.0)

    state = bz.initial_state(model, theta=theta0, qt=qt0)
    return model, state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    model, state = setup(quick=args.quick)
    sim = Simulation(model, state, dt=2.0, stop_time=150.0 if args.quick else 900.0)

    def progress(s):
        aux = bz.diagnose(s.model, s.state)
        print(f"  t={s.time:7.1f}s  max|w|={float(jnp.abs(aux.w).max()):.2f}  "
              f"max qˡ={float(aux.q.liquid.max()) * 1e3:.3f} g/kg")

    sim.add_callback(progress, IterationInterval(25))
    sim.run()

    aux = bz.diagnose(model, sim.state)
    print(f"cloud formed: {float(aux.q.liquid.max()) > 1e-5}")


if __name__ == "__main__":
    main()
