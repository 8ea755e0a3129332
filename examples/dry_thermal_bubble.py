"""Dry thermal bubble — the quickstart case (reference examples/dry_thermal_bubble.jl,
README.md:64-79; BASELINE config 1).

A 2 K warm bubble in a neutrally-stratified anelastic atmosphere rises and
rolls up into the classic mushroom vortex pair.

Run:  python examples/dry_thermal_bubble.py [--quick]
"""

import argparse

import jax.numpy as jnp

import breeze_tpu as bz
from breeze_tpu.simulation import FieldWriter, IterationInterval, Simulation, TimeInterval


def setup(n=256, quick=False):
    if quick:
        n = 64
    grid = bz.make_grid(size=(n, 1, n), extent=(20_000.0, 1.0, 10_000.0),
                        topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                        halo=3, dtype=jnp.float32)
    model = bz.make_model(grid, advection=bz.WENO(5), potential_temperature=300.0)

    def theta0(x, y, z):
        r = jnp.sqrt((x - 10_000.0) ** 2 + (z - 2_000.0) ** 2)
        return 300.0 + 2.0 * jnp.maximum(0.0, 1.0 - r / 2_000.0)

    state = bz.initial_state(model, theta=theta0)
    return model, state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--output", default=None)
    args = p.parse_args()

    model, state = setup(quick=args.quick)
    stop = 200.0 if args.quick else 1000.0
    sim = Simulation(model, state, dt=2.0 if args.quick else 1.0, stop_time=stop)

    def progress(s):
        aux = bz.diagnose(s.model, s.state)
        print(f"  iter {s.iteration:5d}  t={s.time:7.1f}s  "
              f"max|w| = {float(jnp.abs(aux.w).max()):.3f} m/s")

    sim.add_callback(progress, IterationInterval(50))
    if args.output:
        sim.add_output_writer(FieldWriter(args.output, TimeInterval(60.0),
                                          fields=("w", "theta")))
    sim.run()

    aux = bz.diagnose(model, sim.state)
    print(f"final: max w = {float(aux.w.max()):.2f} m/s "
          f"(bubble rising: {float(aux.w.max()) > 0.5})")


if __name__ == "__main__":
    main()
