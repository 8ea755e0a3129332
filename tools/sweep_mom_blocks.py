"""Block-size sweep for momentum_div_pallas_cols on the real chip."""
import time
import numpy as np
import jax
import jax.numpy as jnp

import breeze_tpu as bz_mod
from breeze_tpu import fields as fl
from breeze_tpu.pallas_kernels import momentum as pmom
from breeze_tpu.pallas_kernels import advection as padv
from breeze_tpu.pallas_kernels.advection import bcast_col

g = bz_mod.make_grid(size=(256, 256, 128), extent=(12800., 12800., 3200.),
                     topology=(bz_mod.PERIODIC, bz_mod.PERIODIC, bz_mod.BOUNDED),
                     halo=3, dtype=jnp.float32)
nz, ny, nx = g.shape
rng = np.random.default_rng(0)
r = lambda: jnp.asarray(rng.normal(size=g.shape), jnp.float32)
u, v, w = r(), r(), r().at[0].set(0.0)
pz = lambda a, loc: padv.pad_zy(a, g, loc)
up, vp, wp = pz(u, fl.CCF), pz(v, fl.CFC), pz(w, fl.FCC)
H = pmom.H
colc = jnp.ones((nz + 2 * H, 1, 1), jnp.float32)
colf = jnp.ones((nz + 2 * H, 1, 1), jnp.float32)
invdzc, invdzf = pmom._inv_dz_cols(g)
cc, cf = bcast_col(colc, nx), bcast_col(colf, nx)
args = (up, vp, wp, cc, cf, invdzc, invdzf)

N = 30
results = []
for bzb, byb in [(8, 32), (8, 16), (16, 16), (16, 32), (8, 64), (4, 32),
                 (8, 8), (16, 8)]:
    if nz % bzb or ny % byb:
        continue
    def once(_, acc):
        du, dv, dw = pmom._run_cols(*args, float(1.0 / g.dx),
                                    float(1.0 / g.dy), nz, ny, nx, bzb, byb)
        return acc + du[0, 0, 0]
    f = jax.jit(lambda a: jax.lax.fori_loop(0, N, once, a))
    try:
        acc = f(jnp.float32(0.0))
        _ = float(acc)  # readback sync
        t0 = time.perf_counter()
        acc = f(jnp.float32(0.0))
        _ = float(acc)
        dt_ms = (time.perf_counter() - t0) / N * 1e3
        print(f"bz={bzb:3d} by={byb:3d}: {dt_ms:7.3f} ms", flush=True)
        results.append((dt_ms, bzb, byb))
    except Exception as e:
        print(f"bz={bzb:3d} by={byb:3d}: FAIL {type(e).__name__}: {e}",
              flush=True)
results.sort()
print("best:", results[0] if results else None)
