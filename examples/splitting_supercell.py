"""Splitting supercell — 3-D deep moist convection with Kessler microphysics
(reference examples/splitting_supercell.jl, DCMIP2016 / Klemp et al. 2015;
BASELINE config 5).

A warm bubble in a sheared, conditionally-unstable sounding develops into a
storm whose updraft splits under the shear-induced pressure gradients.

Run:  python examples/splitting_supercell.py [--quick]
"""

import argparse

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.physics.kessler import KesslerMicrophysics
from breeze_tpu.simulation import IterationInterval, Simulation


def weisman_klemp_sounding(z, theta_0=300.0, theta_tr=343.0, z_tr=12_000.0,
                           T_tr=213.0):
    """Weisman & Klemp (1982) analytic θ(z) sounding."""
    z = np.asarray(z, np.float64)
    theta = np.where(
        z <= z_tr,
        theta_0 + (theta_tr - theta_0) * (z / z_tr) ** 1.25,
        theta_tr * np.exp(9.81 / (1005.0 * T_tr) * (z - z_tr)))
    return theta


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--check", action="store_true",
                   help="physics-assertion run: 20 sim-min on a coarse "
                        "grid, asserts deep convection + the mid-level "
                        "vortex couplet that precedes splitting")
    args = p.parse_args()

    if args.quick:
        n, nz, stop = 32, 16, 120.0
    elif args.check:
        # 40 sim-min: deep convection needs ~25 min to mature on the
        # coarse Δx=1.7 km grid before the couplet check is meaningful
        n, nz, stop = 48, 24, 2400.0
    else:
        n, nz, stop = 128, 40, 3600.0

    grid = bz.make_grid(size=(n, n, nz), extent=(80_000.0, 80_000.0, 20_000.0),
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                        halo=3, dtype=jnp.float32)

    theta_prof = lambda zz: float(weisman_klemp_sounding(np.array([zz]))[0])
    model = bz.make_model(
        grid, advection=bz.WENO(5),
        potential_temperature=theta_prof,
        microphysics=KesslerMicrophysics())

    def theta0(x, y, z):
        base = jnp.asarray(weisman_klemp_sounding(np.asarray(
            jnp.broadcast_to(z, (grid.nz, 1, 1)))), jnp.float32)
        base = jnp.broadcast_to(base, grid.shape)
        r = jnp.sqrt(((x - 40_000.0) / 10_000.0) ** 2
                     + ((y - 40_000.0) / 10_000.0) ** 2
                     + ((z - 1_500.0) / 1_500.0) ** 2)
        return base + 3.0 * jnp.maximum(0.0, jnp.cos(0.5 * jnp.pi * jnp.minimum(r, 1.0))) ** 2

    def u0(x, y, z):
        # Klemp et al. (2015) eqs. 15-16: linear shear over zˢ = 5 km with
        # a smooth quadratic blend ±1 km, Galilean-shifted by the storm
        # motion uᶜ (reference examples/splitting_supercell.jl:151-160)
        us, zs, uc = 30.0, 5_000.0, 15.0
        ul = us * (z / zs) - uc
        ut = (-0.8 + 3.0 * (z / zs) - 1.25 * (z / zs) ** 2) * us - uc
        uu = us - uc
        return jnp.where(z < zs - 1_000.0, ul,
                         jnp.where(jnp.abs(z - zs) <= 1_000.0, ut, uu))

    state = bz.initial_state(model, theta=theta0, u=u0,
                             qt=lambda x, y, z: 0.0 * x)
    # Klemp et al. (2015) eqs. 11-12 relative-humidity profile against the
    # hydrostatic reference column, capped at qᵛ_max = 14 g/kg (reference
    # examples/splitting_supercell.jl:138-147) — the exp-decay moisture this
    # replaced starved the sounding of CAPE and no storm formed.
    from breeze_tpu.thermo.saturation import saturation_specific_humidity
    z_tr = 12_000.0
    zc = grid.z_c_col
    ref = model.reference
    H = jnp.where(zc <= z_tr, 1.0 - 0.75 * (zc / z_tr) ** 1.25, 0.25)
    qvs_col = saturation_specific_humidity(
        ref.T_col, ref.rho_col, model.constants, 1.0)
    qv_col = jnp.minimum(H * qvs_col, 0.014).astype(jnp.float32)
    state = state.replace(
        rho_qt=jnp.broadcast_to(ref.rho_col * qv_col, grid.shape))

    sim = Simulation(model, state, dt=2.0 if args.quick else 4.0, stop_time=stop)

    def progress(s):
        aux = bz.diagnose(s.model, s.state)
        qr = s.state.tracers["rho_qr"]
        print(f"  t={s.time:7.0f}s  max w={float(aux.w.max()):6.2f} m/s  "
              f"max qʳ={float(qr.max() / model.reference.rho_c[0]) * 1e3:.2f} g/kg")

    sim.add_callback(progress, IterationInterval(25))
    sim.run()

    if args.check:
        # Supercell dynamics signatures after 20 sim-min (Weisman & Klemp
        # 1982; Klemp et al. 2015 splitting mechanism): a deep updraft, and
        # the tilting of environmental shear vorticity into a MID-LEVEL
        # VORTEX COUPLET flanking it — the rotation that drives the
        # subsequent split.
        aux = bz.diagnose(sim.model, sim.state)
        w = np.asarray(aux.w)
        wmax = float(w.max())
        assert np.isfinite(w).all()
        assert wmax > 3.0, f"no deep convection: max w = {wmax:.2f} m/s"

        kmid = int(np.argmin(np.abs(np.asarray(grid.z_c) - 4_000.0)))
        u = np.asarray(aux.u)[kmid]
        v = np.asarray(aux.v)[kmid]
        zeta = ((np.roll(v, -1, axis=-1) - v) / grid.dx
                - (np.roll(u, -1, axis=0) - u) / grid.dy)
        zmax, zmin = float(zeta.max()), float(zeta.min())
        print(f"check: max w = {wmax:.2f} m/s, mid-level ζ ∈ "
              f"[{zmin:.2e}, {zmax:.2e}] 1/s")
        assert zmax > 5e-4 and zmin < -5e-4, (
            "no vortex couplet — shear tilting absent")
        # couplet flanks the updraft: the ζ extrema are horizontally close
        # to the w maximum (within a storm radius)
        jw, iw = np.unravel_index(np.argmax(w[kmid]), w[kmid].shape)
        jp, ip = np.unravel_index(np.argmax(zeta), zeta.shape)
        jm, im = np.unravel_index(np.argmin(zeta), zeta.shape)
        dxy = grid.dx
        storm_r = 20_000.0
        for (jj, ii) in ((jp, ip), (jm, im)):
            dist = np.hypot((ii - iw) * dxy, (jj - jw) * dxy)
            assert dist < storm_r, "vorticity extremum detached from storm"
        print("check PASSED")


if __name__ == "__main__":
    main()
