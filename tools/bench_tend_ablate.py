"""Mega-kernel component ablation on the real chip (TPU-only).

Decomposes the fused tendency kernel's per-stage cost (≈70% of the BOMEX
step) by compiling/measuring variants with components added one at a time:

  mom          9 WENO5 momentum reconstructions only
  +buoy        + dry in-kernel buoyancy columns
  +cor         + FPlane Coriolis
  +1scal       + θ scalar WENO5 flux divergence
  +2scal       + qᵗ scalar (the BOMEX moist pair)
  +clo         + fused Smagorinsky-Lilly epilogue (moist, θᵥ window)
  +sub         + SSP-RK3 substep blend epilogue
  +fcols       + column-linear forcing epilogue (BOMEX 4-forcing masks)

Each row's delta over the previous is that component's marginal cost in
context (incl. its windows' DMA).  Amortized inside one dispatch.

Usage: python tools/bench_tend_ablate.py [--size 256x256x256] [--loops 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", default="256x256x256")
    p.add_argument("--loops", type=int, default=30)
    args = p.parse_args()
    nx, ny, nz = (int(s) for s in args.size.split("x"))

    import breeze_tpu as bz
    from breeze_tpu.pallas_kernels import advection as padv
    from breeze_tpu.pallas_kernels import tendency as ptend
    from breeze_tpu import fields as fl
    from breeze_tpu.physics.closures import SmagorinskyLilly

    grid = bz.make_grid(size=(nx, ny, nz), extent=(6400., 6400., 3000.),
                        topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                        halo=3, dtype=jnp.float32)
    model = bz.make_model(grid, advection=bz.WENO(5),
                          potential_temperature=298.7,
                          microphysics=bz.SaturationAdjustment(),
                          closure=SmagorinskyLilly(),
                          coriolis=bz.FPlane(3.76e-5))
    from breeze_tpu.model import _padded_reference_columns
    colc, colf = _padded_reference_columns(model, halo=padv.H)

    rng = np.random.default_rng(0)
    shp = grid.shape
    mk = lambda scale=1.0, off=0.0: jnp.asarray(
        rng.normal(size=shp) * scale + off, jnp.float32)
    pz = lambda a, loc: padv.pad_zy(a, grid, loc)
    u_pad = pz(mk(), fl.FCC)
    v_pad = pz(mk(), fl.CFC)
    w_pad = pz(mk(0.3).at[0].set(0.0), fl.CCF)
    th_pad = pz(mk(0.5, 300.0), fl.CCC)
    qt_pad = pz(mk(1e-4, 0.01), fl.CCC)
    b_pad = pz(mk(1e-3), fl.CCC)
    thb_pad = pz(mk(0.5, 301.0), fl.CCC)

    # dry buoyancy columns (Tref, Pi, grho)
    from breeze_tpu.model import _dry_buoyancy_columns
    buoy_cols = _dry_buoyancy_columns(model, halo=padv.H)

    nsc2 = 2
    cur = [mk(), mk(), mk(0.3), mk(0.5, 300.0), mk(1e-4, 0.01)]
    prev = [mk(), mk(), mk(0.3), mk(0.5, 300.0), mk(1e-4, 0.01)]
    zcol = np.linspace(0.0, 1.0, nz).astype(np.float32)
    adds = [zcol, zcol, None, zcol, zcol]
    damps = [0.05 * zcol, 0.05 * zcol, 0.05 * zcol, None, None]

    variants = {
        "mom": dict(scalars=(), b=None, cor=None, buoy=None, clo=False,
                    sub=False, fc=False),
        "+buoy": dict(scalars=(th_pad,), b=None, cor=None, buoy=buoy_cols,
                      clo=False, sub=False, fc=False),
        "+cor": dict(scalars=(th_pad,), b=None, cor=3.76e-5, buoy=buoy_cols,
                     clo=False, sub=False, fc=False),
        "+2scal": dict(scalars=(th_pad, qt_pad), b=b_pad, cor=3.76e-5,
                       buoy=None, clo=False, sub=False, fc=False),
        "+clo": dict(scalars=(th_pad, qt_pad), b=b_pad, cor=3.76e-5,
                     buoy=None, clo=True, sub=False, fc=False),
        "+sub": dict(scalars=(th_pad, qt_pad), b=b_pad, cor=3.76e-5,
                     buoy=None, clo=True, sub=True, fc=False),
        "+fcols": dict(scalars=(th_pad, qt_pad), b=b_pad, cor=3.76e-5,
                       buoy=None, clo=True, sub=True, fc=True),
    }

    arrs = dict(u=u_pad, v=v_pad, w=w_pad, th=th_pad, qt=qt_pad, b=b_pad,
                thb=thb_pad, colc=colc, colf=colf,
                cur=cur, prev=prev)

    # micro-op experiments on the dominant momentum block (trace-time
    # knobs in momentum._weno5)
    experiments = {
        "mom/rcp": ("BREEZE_TPU_WENO_RCP", variants["mom"]),
        "mom/diffs": ("BREEZE_TPU_WENO_DIFFS", variants["mom"]),
        "full/rcp+diffs": ("BOTH", variants["+fcols"]),
    }

    print(f"# bench_tend_ablate {nx}x{ny}x{nz} loops={args.loops} "
          f"device={jax.devices()[0].device_kind}", flush=True)
    prev_t = 0.0
    for name, cfg in list(variants.items()) + [
            (k, v[1]) for k, v in experiments.items()]:
        envs = ()
        for k, (e, v) in experiments.items():
            if k == name:
                envs = ("BREEZE_TPU_WENO_RCP",
                        "BREEZE_TPU_WENO_DIFFS") if e == "BOTH" else (e,)
        for e in envs:
            os.environ[e] = "1"
        if envs:
            # the knobs are trace-time: bust the inner jit cache
            ptend._run.clear_cache()
        n_sc = len(cfg["scalars"])
        use_b = cfg["b"] is not None

        def run_variant(a, uu):
            n_out = 3 + n_sc
            sub = None
            if cfg["sub"]:
                sub = (a["cur"][:n_out], a["prev"][:n_out], 0.5, 2.0)
            fcols = None
            if cfg["fc"]:
                fcols = (adds[:n_out], damps[:n_out])
            scals = (a["th"], a["qt"])[:n_sc]
            outs = ptend.fused_tendency_pallas(
                grid, uu, a["v"], a["w"], scals, a["colc"], a["colf"],
                coriolis_f=cfg["cor"], buoy_cols=cfg["buoy"],
                b_pad=a["b"] if use_b else None,
                closure_model=model if cfg["clo"] else None,
                thb_pad=a["thb"] if cfg["clo"] else None,
                substep=sub, forcing_cols=fcols)
            return outs[0]

        def looped_fn(a):
            def body(i, acc):
                return acc + run_variant(a, a["u"] + 1e-30 * acc)[0, 0, 0]
            return jax.lax.fori_loop(0, args.loops, body, jnp.float32(0.0))

        looped = jax.jit(looped_fn)
        float(looped(arrs))
        t0 = time.perf_counter()
        float(looped(arrs))
        t = (time.perf_counter() - t0) / args.loops
        print(f"{name:14s} {t * 1e3:7.3f} ms   (delta {1e3 * (t - prev_t):+6.3f})",
              flush=True)
        prev_t = t
        for e in envs:
            del os.environ[e]


if __name__ == "__main__":
    main()
