"""On-device (TPU) check for the round-5 K3 envelope widening.

Compiles the fused multi-substep acoustic kernel and compares one full
``acoustic_rk3_step`` against the jnp fast loop (BREEZE_TPU_DISABLE_
PALLAS_ACOUSTIC=1 is trace-time, so each variant goes through a fresh jit)
for the newly-covered configs:

  direct   DirectDivergenceDamping (KSH18 eq. 36)
  rhoe     static-energy (ρe) formulation
  both     ρe + direct damping

and times each (amortized fori_loop) kernel-on vs kernel-off for the
envelope table in docs/kernels.md.

Run on TPU:  python tools/tpu_check_k3_envelope.py [--size 256x256x128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build(size, damping, formulation, terrain=False):
    import breeze_tpu as bz
    from breeze_tpu.dynamics.compressible import (
        SplitExplicitTimeDiscretization, compressible_initial_state,
        make_compressible_model)
    nx, ny, nz = size
    g = bz.make_grid(size=(nx, ny, nz),
                     extent=(100.0 * nx, 100.0 * ny, 100.0 * nz),
                     topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                     halo=3, dtype=jnp.float32)
    td = SplitExplicitTimeDiscretization(substeps=6, damping=damping,
                                         damping_coefficient=0.0)
    terr = None
    if terrain:
        from breeze_tpu.dynamics.terrain import make_terrain
        terr = make_terrain(
            g, bz.ThermodynamicConstants(),
            lambda x, y: 250.0 * jnp.exp(
                -((x - 50.0 * nx) / (20.0 * nx)) ** 2)
            * jnp.cos(jnp.pi * (x - 50.0 * nx) / (15.0 * nx)) ** 2)
    model = make_compressible_model(g, advection=bz.WENO(5),
                                    coriolis=bz.FPlane(1e-4),
                                    time_discretization=td,
                                    formulation=formulation,
                                    terrain=terr)
    state = compressible_initial_state(
        model, theta=lambda x, y, z: 300.0 + 1.0 * jnp.exp(
            -((x - 50.0 * nx) ** 2 + (z - 30.0 * nz) ** 2) / 1500.0 ** 2),
        u=lambda x, y, z: 5.0 + 0 * x)
    return g, model, state


def run_once(model, state, dt, disable):
    from breeze_tpu.dynamics.compressible import acoustic_rk3_step
    if disable:
        os.environ["BREEZE_TPU_DISABLE_PALLAS_ACOUSTIC"] = "1"
    try:
        out = jax.jit(lambda m, s: acoustic_rk3_step(m, s, dt))(model, state)
        jax.block_until_ready(out)
        float(jnp.sum(out.rho_theta))   # force readback through the tunnel
    finally:
        os.environ.pop("BREEZE_TPU_DISABLE_PALLAS_ACOUSTIC", None)
    return out


def amortized_step(model, state, dt, disable, n=20):
    from breeze_tpu.dynamics.compressible import acoustic_rk3_step
    if disable:
        os.environ["BREEZE_TPU_DISABLE_PALLAS_ACOUSTIC"] = "1"
    try:
        def body(i, s):
            return acoustic_rk3_step(model, s, dt)
        looped = jax.jit(lambda s: jax.lax.fori_loop(0, n, body, s))
        out = looped(state)
        float(jnp.sum(out.rho_theta))
        t0 = time.perf_counter()
        out = looped(state)
        float(jnp.sum(out.rho_theta))
        return (time.perf_counter() - t0) / n
    finally:
        os.environ.pop("BREEZE_TPU_DISABLE_PALLAS_ACOUSTIC", None)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="256x256x128")
    args = p.parse_args()
    size = tuple(int(s) for s in args.size.split("x"))
    npts = size[0] * size[1] * size[2]

    from breeze_tpu.dynamics.compressible import DirectDivergenceDamping

    configs = {
        "thermal (r4 baseline)": (None, "potential_temperature", False),
        "direct": (DirectDivergenceDamping(0.1), "potential_temperature",
                   False),
        "rhoe": (None, "static_energy", False),
        "rhoe+direct": (DirectDivergenceDamping(0.1), "static_energy",
                        False),
        "terrain (Schaer ridge)": (None, "potential_temperature", True),
    }
    # terrain's initial ridge imbalance drives larger fast-mode
    # perturbations -> more accumulated f32 reorder drift; the interpret
    # probe at matched substeps shows terrain == flat (~4e-7), so the
    # looser bound still pins parity (verify log r5)
    tol = {"terrain (Schaer ridge)": 1.5e-2}
    dt = 0.5
    print(f"# tpu_check_k3_envelope {args.size} device="
          f"{jax.devices()[0].device_kind}", flush=True)
    for name, (damping, formulation, terrain) in configs.items():
        if damping is None and formulation == "potential_temperature":
            from breeze_tpu.dynamics.compressible import (
                ThermalDivergenceDamping)
            damping = ThermalDivergenceDamping(0.1)
        g, model, state = build(size, damping, formulation, terrain)
        from breeze_tpu.pallas_kernels.acoustic import supported
        assert supported(model), name
        ref = run_once(model, state, dt, disable=True)
        got = run_once(model, state, dt, disable=False)
        rels = {}
        for f in ("rho", "rho_u", "rho_w", "rho_theta"):
            a = np.asarray(getattr(got, f))
            b = np.asarray(getattr(ref, f))
            scale = max(np.abs(b).max(), 1e-10)
            rels[f] = np.abs(a - b).max() / scale
        worst = max(rels.values())
        t_on = amortized_step(model, state, dt, disable=False)
        t_off = amortized_step(model, state, dt, disable=True)
        print(f"{name:24s} worst rel {worst:.2e}  "
              f"K3 {t_on * 1e3:7.2f} ms ({npts / t_on / 1e6:6.1f}M pts/s)  "
              f"jnp {t_off * 1e3:7.2f} ms ({npts / t_off / 1e6:6.1f}M)",
              flush=True)
        # full-step f32 ordering drift: 3 outer stages x 6 substeps with
        # the near-zero early rho_w scale amplifies to ~1e-3 relative —
        # IDENTICAL on the unchanged r4 kernel (verify log), so the bound
        # pins parity, not bitwiseness (interpret tests pin 5e-5 at small
        # sizes).
        assert worst < tol.get(name, 3e-3), (name, rels)
    print("K3 envelope OK", flush=True)


if __name__ == "__main__":
    main()
