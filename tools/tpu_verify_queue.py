"""TPU verification queue — round-4 edition.

Re-validates every DEFAULT-ON Pallas kernel configuration on the real chip
and records fresh headline bench numbers, in increasing order of risk.
Each stage runs in a SUBPROCESS under a timeout (a kernel that hangs the
relay cannot take the queue down); results append to
``tpu_verify_queue.log`` so they survive session interruptions.

Stages:

1. basic      — devices + matmul readback (is the tunnel alive?)
2. tendency   — fused tendency mega-kernel merged/split/jnp equivalence
                (tools/tpu_check_tendency.py)
3. substep    — full SSP-RK3 step: fused substep epilogue (default) vs
                BREEZE_TPU_DISABLE_PALLAS_SUBSTEP=1 vs jnp, on a moist
                BOMEX state (the ADVICE-r3 hardware check)
4. k3_sponge  — compressible acoustic_rk3_step with the DEFAULT
                UpperSponge (damp_full=True): fused K3 (default) vs
                BREEZE_TPU_DISABLE_PALLAS_ACOUSTIC=1 jnp loop
5. bench_bomex— canonical bench.py (BOMEX 256x256x128 moist)
6. bench_dry  — bench.py --case bubble (dry anelastic headline)
7. bench_comp — bench.py --dynamics compressible --substep-floattype
                bfloat16 at DEFAULTS (K3 now default-on)
8. roofline   — tools/bench_kernels.py per-kernel measured-vs-roofline

Usage:  python tools/tpu_verify_queue.py [--from STAGE] [--only STAGE]
"""

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(ROOT, "tpu_verify_queue.log")

BASIC = """
import time, jax, jax.numpy as jnp
t0 = time.time()
print('devices:', jax.devices(), flush=True)
x = jnp.ones((1024, 1024), jnp.float32)
print('matmul sum:', float(jnp.sum(x @ x)), 'elapsed', round(time.time()-t0, 1), flush=True)
"""

SUBSTEP = """
import os, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, %(root)r)
t0 = time.time()
import bench
from breeze_tpu.timesteppers import ssp_rk3_step

class _Args: svp = "flatau"
grid, model, state = bench._build_bomex(_Args(), 128, 128, 64)

def run(tag, env):
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        fn = jax.jit(lambda m, s: ssp_rk3_step(m, s, 1.0))
        out = fn(model, state)
        chk = float(sum(jnp.sum(jnp.abs(a)) for a in jax.tree.leaves(out)))
        print(f"{tag}: checksum {chk:.8e} elapsed {time.time()-t0:.0f}s", flush=True)
        return jax.tree.map(jax.device_get, out)
    finally:
        for k, v in saved.items():
            os.environ.pop(k, None) if v is None else os.environ.update({k: v})

S_def = run("fused-substep (default)", {})
S_nosub = run("substep epilogue OFF   ", {"BREEZE_TPU_DISABLE_PALLAS_SUBSTEP": "1"})
S_jnp = run("jnp fallback           ", {"BREEZE_TPU_DISABLE_PALLAS": "1"})

def cmp(tag, A, B, rtol, atol):
    import jax.tree_util as jtu
    ok = True
    for (pa, la), (pb, lb) in zip(jtu.tree_leaves_with_path(A),
                                  jtu.tree_leaves_with_path(B)):
        la, lb = np.asarray(la), np.asarray(lb)
        if la.dtype == object or la.ndim == 0: continue
        d = float(np.abs(la - lb).max()); s = float(np.abs(lb).max()) or 1.0
        good = d < rtol * s or d < atol
        ok &= good
        if d > 0:
            print(f"  {tag} {jtu.keystr(pa)}: abs {d:.3e} scale {s:.3e} "
                  f"rel {d/s:.3e} {'ok' if good else 'FAIL'}", flush=True)
    print(f"{tag}: {'OK' if ok else 'FAIL'}", flush=True)
    return ok

# fused vs epilogue-off differ only in where the SSP blend happens; the
# post-kernel additive terms make them non-bitwise, and O(1e-7) stage
# noise can flip saturation/upwind thresholds — judge with an absolute
# floor scaled to the prognostic magnitudes (momenta O(1e2), rho_w small).
ok = cmp("fused vs epilogue-off", S_def, S_nosub, 5e-5, 1e-3)
ok &= cmp("fused vs jnp         ", S_def, S_jnp, 5e-4, 1e-3)
print("substep check", "PASSED" if ok else "FAILED", flush=True)
sys.exit(0 if ok else 1)
"""

K3_SPONGE = """
import os, sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, %(root)r)
t0 = time.time()
import breeze_tpu as bz
from breeze_tpu.dynamics.compressible import (
    SplitExplicitTimeDiscretization, UpperSponge, acoustic_rk3_step,
    compressible_initial_state, make_compressible_model)

grid = bz.make_grid(size=(128, 64, 64), extent=(6400., 3200., 3200.),
                    topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                    halo=3, dtype=jnp.float32)

def theta0(x, y, z):
    return 300.0 + 0.5 * jnp.exp(-((x-3200.)**2 + (y-1600.)**2 + (z-800.)**2)/400.0**2)

def run(tag, env, damp_full):
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        model = make_compressible_model(
            grid, advection=bz.WENO(5),
            time_discretization=SplitExplicitTimeDiscretization(
                substeps=6, damping_coefficient=0.1,
                sponge=UpperSponge(depth=800.0, damping_rate=0.05,
                                   damp_full=damp_full)))
        state = compressible_initial_state(model, theta=theta0)
        fn = jax.jit(lambda m, s: jax.lax.fori_loop(
            0, 3, lambda _, st: acoustic_rk3_step(m, st, 0.25), s))
        out = fn(model, state)
        chk = float(sum(jnp.sum(jnp.abs(a)) for a in jax.tree.leaves(out)))
        print(f"{tag}: checksum {chk:.8e} elapsed {time.time()-t0:.0f}s", flush=True)
        return jax.tree.map(jax.device_get, out)
    finally:
        for k, v in saved.items():
            os.environ.pop(k, None) if v is None else os.environ.update({k: v})

ok = True
for damp_full in (True, False):
    A = run(f"K3 fused damp_full={damp_full}", {}, damp_full)
    B = run(f"jnp loop damp_full={damp_full}", {"BREEZE_TPU_DISABLE_PALLAS_ACOUSTIC": "1"}, damp_full)
    import jax.tree_util as jtu
    good = True
    for (pa, la), (pb, lb) in zip(jtu.tree_leaves_with_path(A),
                                  jtu.tree_leaves_with_path(B)):
        la, lb = np.asarray(la), np.asarray(lb)
        if la.ndim == 0: continue
        d = float(np.abs(la - lb).max()); s = float(np.abs(lb).max()) or 1.0
        g = d < 5e-5 * s or d < 1e-3
        good &= g
        if d > 0:
            print(f"  k3 damp_full={damp_full} {jtu.keystr(pa)}: abs {d:.3e} "
                  f"scale {s:.3e} rel {d/s:.3e} {'ok' if g else 'FAIL'}",
                  flush=True)
    ok &= good
    print(f"K3-vs-jnp damp_full={damp_full}: {'OK' if good else 'FAIL'}",
          flush=True)
print("k3_sponge check", "PASSED" if ok else "FAILED", flush=True)
sys.exit(0 if ok else 1)
"""


def stage_cmd(name):
    py = sys.executable
    if name == "basic":
        return [py, "-c", BASIC], {}, 900
    if name == "tendency":
        return [py, os.path.join(ROOT, "tools", "tpu_check_tendency.py")], {}, 1800
    if name == "substep":
        return [py, "-c", SUBSTEP % {"root": ROOT}], {}, 1800
    if name == "k3_sponge":
        return [py, "-c", K3_SPONGE % {"root": ROOT}], {}, 1800
    if name == "bench_bomex":
        return [py, os.path.join(ROOT, "bench.py")], {}, 1800
    if name == "bench_dry":
        return [py, os.path.join(ROOT, "bench.py"), "--case", "bubble"], {}, 1200
    if name == "bench_comp":
        return [py, os.path.join(ROOT, "bench.py"), "--dynamics", "compressible",
                "--substep-floattype", "bfloat16", "--dt", "0.25"], {}, 1800
    if name == "roofline":
        return [py, os.path.join(ROOT, "tools", "bench_kernels.py")], {}, 2400
    raise SystemExit(f"unknown stage {name}")


STAGES = ["basic", "tendency", "substep", "k3_sponge",
          "bench_bomex", "bench_dry", "bench_comp", "roofline"]


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--from", dest="from_", default=None)
    p.add_argument("--only", default=None)
    args = p.parse_args()
    stages = STAGES
    if args.only:
        stages = [args.only]
    elif args.from_:
        stages = STAGES[STAGES.index(args.from_):]

    log(f"=== round-4 verify queue: {' '.join(stages)} (git {git_rev()})")
    for name in stages:
        cmd, env, timeout = stage_cmd(name)
        full_env = dict(os.environ, **env)
        log(f"=== {name}: timeout={timeout}s env={env}")
        t0 = time.time()
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=timeout, env=full_env, cwd=ROOT)
            for ln in (out.stdout + out.stderr).splitlines():
                log("    " + ln)
            log(f"--- {name}: exit={out.returncode} ({time.time()-t0:.0f}s)")
        except subprocess.TimeoutExpired:
            log(f"--- {name}: TIMEOUT after {timeout}s")


def git_rev():
    try:
        return subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True,
                              cwd=ROOT).stdout.strip()
    except Exception:
        return "?"


if __name__ == "__main__":
    main()
