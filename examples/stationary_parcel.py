"""Stationary parcel: microphysics box comparison (1M vs 2M rates)
(reference examples/stationary_parcel_model.jl).

A single supersaturated grid cell with no dynamics: the prognostic-
condensate schemes relax toward their equilibria — condensation builds
cloud, autoconversion + accretion transfer it to rain, rain sediments out.
Compares the one-moment and two-moment warm schemes side by side.

Run:  python examples/stationary_parcel.py [--quick]
"""

import argparse

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.physics.one_moment import OneMomentMicrophysics
from breeze_tpu.physics.two_moment import TwoMomentMicrophysics


def run_box(mp, label, n_steps, dt=1.0):
    grid = bz.make_grid(size=(1, 1, 1), extent=(1.0, 1.0, 1.0),
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED))
    model = bz.make_model(grid, potential_temperature=300.0, microphysics=mp)
    state = bz.initial_state(model, theta=lambda x, y, z: 300.0 + 0.0 * z,
                             qt=lambda x, y, z: 0.020 + 0.0 * z)
    history = []
    for i in range(n_steps):
        state = mp.model_update(model, state, dt)
        if i % max(1, n_steps // 10) == 0:
            rho = float(model.reference.rho_c[0])
            qv = float(state.rho_qt[0, 0, 0]) / rho
            cond = sum(float(state.tracers[k][0, 0, 0]) / rho
                       for k in state.tracers if k.startswith("rho_q"))
            history.append((i * dt, qv, cond))
    t, qv, cond = history[-1]
    print(f"{label:10s}: after {t:5.0f}s  qᵛ = {qv*1e3:6.2f} g/kg  "
          f"condensate+rain = {cond*1e3:6.2f} g/kg")
    for name, val in sorted(state.tracers.items()):
        v = float(val[0, 0, 0]) / float(model.reference.rho_c[0])
        print(f"    {name:10s} = {v*1e3:8.4f} g/kg")
    assert np.isfinite(qv) and qv < 0.020
    return state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()
    n = 120 if args.quick else 2000

    run_box(OneMomentMicrophysics(warm_phase=True), "1M warm", n)
    run_box(TwoMomentMicrophysics(), "2M (SB06)", n)


if __name__ == "__main__":
    main()
