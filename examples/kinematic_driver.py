"""KiD-style kinematic driver column: prescribed updraft advecting moisture
(reference examples/kinematic_driver.jl).

A single column with a gentle prescribed updraft lifting boundary-layer
moisture through the saturation level; the dynamics are bypassed
(PrescribedDynamics) so the microphysics response is isolated — the
kinematic-driver intercomparison pattern (Shipway & Hill 2012).

Run:  python examples/kinematic_driver.py [--quick]
"""

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.kinematic import PrescribedDynamics, kinematic_step


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    nz = 50 if args.quick else 100
    grid = bz.make_grid(size=(1, 1, nz), extent=(1.0, 1.0, 20e3),
                        topology=(bz.FLAT, bz.FLAT, bz.BOUNDED))
    model = bz.make_model(
        grid, advection=bz.WENO(5), potential_temperature=300.0,
        microphysics=bz.SaturationAdjustment(
            equilibrium=bz.WarmPhaseEquilibrium()))

    # tropical-ish sounding: θ blending to an isothermal stratosphere
    z_tr, th_tr, T_tr = 12000.0, 343.0, 213.0
    g_acc = 9.81
    cp = 1004.6

    def theta0(x, y, z):
        strat = th_tr * jnp.exp(g_acc / (cp * T_tr) * (z - z_tr))
        tropo = 300.0 + (th_tr - 300.0) * (z / z_tr) ** 1.25
        return jnp.where(z < z_tr, tropo, strat)

    def qt0(x, y, z):
        return 0.018 * jnp.exp(-z / 2300.0)

    state = bz.initial_state(model, theta=theta0, qt=qt0)
    dyn = PrescribedDynamics(w=2.0)       # 2 m/s updraft

    dt = 5.0
    n = 24 if args.quick else 600
    step = jax.jit(lambda s: kinematic_step(model, dyn, s, dt))
    for i in range(n):
        state = step(state)

    aux = bz.diagnose(model, state)
    ql = np.asarray(aux.q.liquid)[:, 0, 0]
    z = np.asarray(grid.z_c)
    k = int(ql.argmax())
    print(f"done after {n * dt:.0f}s of 2 m/s ascent: max qˡ = "
          f"{ql.max()*1e3:.2f} g/kg at z = {z[k]/1e3:.1f} km")
    assert np.isfinite(ql).all()
    if not args.quick:
        assert ql.max() > 1e-4, "condensation expected"


if __name__ == "__main__":
    main()
