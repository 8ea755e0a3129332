"""TPU verification queue — run after a tunnel outage to re-validate the
Pallas kernels and record fresh perf numbers, in increasing order of risk.

Each stage runs in a SUBPROCESS under a timeout, so a kernel that hangs the
relay cannot take the whole queue down; results append to
``tpu_verify_queue.log``.  Stages:

1. basic     — devices + a matmul readback (is the tunnel alive?)
2. kernels   — momentum/scalar Pallas kernels vs jnp on-device (the WENO
               weight rewrite changed their numerics; re-verify)
3. bench     — anelastic headline bench (the driver's metric)
4. profile   — anelastic per-component + compressible per-phase profiles
5. proj      — BREEZE_TPU_PALLAS_PROJ=1 bench (fused projection)
6. acoustic  — BREEZE_TPU_PALLAS_ACOUSTIC=1 compressible bench
7. cols      — BREEZE_TPU_DISABLE_PALLAS_MOM_COLS=1 comparison bench (the
               cols kernel is the DEFAULT; this stage records the
               premultiplied-kernel number.  The cols kernel once hung the
               relay — LAST, strict timeout)

Usage:  python tpu_verify_queue.py [--from STAGE] [--only STAGE]
"""

import argparse
import os
import subprocess
import sys
import time

LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tpu_verify_queue.log")
ROOT = os.path.dirname(os.path.abspath(__file__))

BASIC = """
import time, jax, jax.numpy as jnp
t0 = time.time()
print('devices:', jax.devices(), flush=True)
x = jnp.ones((1024, 1024), jnp.float32)
y = x @ x
print('matmul sum:', float(jnp.sum(y)), 'elapsed', round(time.time()-t0, 1), flush=True)
"""

KERNELS = """
import time, numpy as np, jax, jax.numpy as jnp
t0 = time.time()
import breeze_tpu as bz
from breeze_tpu import fields as fl
from breeze_tpu import advection as adv
from breeze_tpu.ops import StencilOps
from breeze_tpu.pallas_kernels import advection as padv
from breeze_tpu.pallas_kernels import momentum as pmom

g = bz.make_grid(size=(256, 64, 32), extent=(12800., 3200., 1600.),
                 topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                 halo=3, dtype=jnp.float32)
so = StencilOps(g)
rng = np.random.default_rng(0)
r = lambda: jnp.asarray(rng.normal(size=g.shape), jnp.float32)
c, u, v, w, rho = r(), r(), r(), r().at[0].set(0.0), 1.0 + 0.1*jnp.abs(r())
pz = lambda a, loc: padv.pad_zy(a, g, loc)
got = padv.div_rho_u_c_pallas(g, pz(c, fl.CCC), pz(u, fl.CCF),
                              pz(v, fl.CFC), pz(w, fl.FCC), pz(rho, fl.CCC))
ref = -adv.div_rho_u_c(so, adv.WENO(5), fl.pad(rho, g, fl.CCC),
                       fl.pad(u, g, fl.CCF), fl.pad(v, g, fl.CFC),
                       fl.pad(w, g, fl.FCC), fl.pad(c, g, fl.CCC))
d = float(jnp.abs(got - ref).max()); s = float(jnp.abs(ref).max())
print(f'scalar kernel rel {d/s:.2e}', flush=True)
assert d/s < 1e-4
ru_p, rv_p, rw_p = pz(u*1.1, fl.CCF), pz(v*1.1, fl.CFC), pz(w*1.1, fl.FCC)
a6 = pmom.momentum_div_pallas(g, ru_p, rv_p, rw_p, pz(u, fl.CCF),
                              pz(v, fl.CFC), pz(w, fl.FCC))
m_ref = adv.momentum_flux_divergence(
    so, adv.WENO(5), fl.pad(u*1.1, g, fl.CCF), fl.pad(v*1.1, g, fl.CFC),
    fl.pad(w*1.1, g, fl.FCC), fl.pad(u, g, fl.CCF), fl.pad(v, g, fl.CFC),
    fl.pad(w, g, fl.FCC))
for n, (x1, x2) in enumerate(zip(a6, m_ref)):
    x1 = np.asarray(x1); x2 = np.asarray(x2)
    if n == 2:
        x1, x2 = x1[1:], x2[1:]
    d = np.abs(x1 - x2).max(); s = np.abs(x2).max()
    print(f'momentum[{n}] rel {d/s:.2e}', flush=True)
    assert d/s < 1e-4
# stretched-z variants (spacing-column path)
z_faces = bz.piecewise_stretched_z(32, surface_layer_height=400.0,
                                   surface_layer_spacing=25.0, top=1600.0)
gs = bz.make_grid(size=(256, 64, len(z_faces) - 1), x=(0., 12800.),
                  y=(0., 3200.), z=z_faces,
                  topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                  halo=3, dtype=jnp.float32)
sos = StencilOps(gs)
cs, us, vs = (jnp.asarray(rng.normal(size=gs.shape), jnp.float32)
              for _ in range(3))
ws = jnp.asarray(rng.normal(size=gs.shape), jnp.float32).at[0].set(0.0)
rhos = 1.0 + 0.1 * jnp.abs(jnp.asarray(rng.normal(size=gs.shape), jnp.float32))
pzs = lambda a, loc: padv.pad_zy(a, gs, loc)
gots = padv.div_rho_u_c_pallas(gs, pzs(cs, fl.CCC), pzs(us, fl.CCF),
                               pzs(vs, fl.CFC), pzs(ws, fl.FCC),
                               pzs(rhos, fl.CCC))
refs = -adv.div_rho_u_c(sos, adv.WENO(5), fl.pad(rhos, gs, fl.CCC),
                        fl.pad(us, gs, fl.CCF), fl.pad(vs, gs, fl.CFC),
                        fl.pad(ws, gs, fl.FCC), fl.pad(cs, gs, fl.CCC))
d = float(jnp.abs(gots - refs).max()); s = float(jnp.abs(refs).max())
print(f'stretched scalar kernel rel {d/s:.2e}', flush=True)
assert d/s < 2e-4
print('kernels OK elapsed', round(time.time()-t0, 1), flush=True)
"""

STAGES = [
    ("basic", [sys.executable, "-c", BASIC], {}, 900),
    ("kernels", [sys.executable, "-c", KERNELS], {}, 1200),
    ("bench", [sys.executable, "bench.py"], {}, 1800),
    ("bench_moist", [sys.executable, "bench.py", "--moist"], {}, 1800),
    ("profile", [sys.executable, "profile_components.py"], {}, 1800),
    ("profile_comp", [sys.executable, "profile_components.py",
                      "--dynamics", "compressible"], {}, 1800),
    ("bench_compressible", [sys.executable, "bench.py", "--dynamics",
                            "compressible", "--substep-floattype",
                            "bfloat16"], {}, 1800),
    ("proj", [sys.executable, "bench.py"],
     {"BREEZE_TPU_PALLAS_PROJ": "1"}, 1800),
    ("acoustic", [sys.executable, "bench.py", "--dynamics", "compressible"],
     {"BREEZE_TPU_PALLAS_ACOUSTIC": "1"}, 1800),
    ("acoustic_bf16", [sys.executable, "bench.py", "--dynamics",
                       "compressible", "--substep-floattype", "bfloat16"],
     {"BREEZE_TPU_PALLAS_ACOUSTIC": "1"}, 1800),
    ("cols", [sys.executable, "bench.py"],
     {"BREEZE_TPU_DISABLE_PALLAS_MOM_COLS": "1"}, 1200),
]


def log(msg):
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--from", dest="start", default=None)
    p.add_argument("--only", default=None)
    args = p.parse_args()

    names = [s[0] for s in STAGES]
    todo = STAGES
    if args.only:
        todo = [s for s in STAGES if s[0] == args.only]
    elif args.start:
        todo = STAGES[names.index(args.start):]

    for name, cmd, env_extra, timeout in todo:
        env = dict(os.environ)
        env.update(env_extra)
        log(f"=== {name}: {' '.join(cmd[1:])} env={env_extra} "
            f"timeout={timeout}s")
        t0 = time.time()
        try:
            out = subprocess.run(cmd, cwd=ROOT, env=env, timeout=timeout,
                                 capture_output=True, text=True)
            tail = (out.stdout + out.stderr).strip().splitlines()[-12:]
            for line in tail:
                log(f"    {line}")
            log(f"--- {name}: exit={out.returncode} "
                f"({time.time() - t0:.0f}s)")
            if name == "basic" and out.returncode != 0:
                log("tunnel still down; aborting queue")
                return 1
        except subprocess.TimeoutExpired:
            log(f"--- {name}: TIMEOUT after {timeout}s (kernel may have "
                f"hung the relay — check the tunnel before continuing)")
            if name in ("basic", "cols"):
                return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
