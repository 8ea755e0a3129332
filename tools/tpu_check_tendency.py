"""On-device (TPU) equivalence check for the fused tendency mega-kernel.

Three traces of ``compute_tendencies`` on the SAME BOMEX-like moist state
with a SmagorinskyLilly closure:

1. default      — mega-kernel with the merged SGS epilogue (the production
                  TPU path since the closure-merge commit)
2. split        — BREEZE_TPU_SPLIT_PALLAS_CLOSURE=1: mega-kernel + the
                  standalone closure kernel (the previously TPU-verified
                  configuration)
3. jnp          — BREEZE_TPU_DISABLE_PALLAS=1: pure-XLA fallback

The env flags are read at TRACE time inside ``compute_tendencies``, so each
variant is traced through a fresh ``jax.jit`` wrapper after flipping the
flag.  Expected: merged == split bitwise (identical arithmetic, different
kernel launch layout), both within ~1e-5 rel of jnp (stencil-select WENO vs
where-chains reorder a few flops).

Run on TPU:  python tools/tpu_check_tendency.py [nx ny nz]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    size = (int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])) \
        if len(sys.argv) == 4 else (128, 128, 64)
    nx, ny, nz = size
    t0 = time.time()
    print("devices:", jax.devices(), flush=True)

    import bench
    import breeze_tpu as bz  # noqa: F401

    class _Args:
        svp = "flatau"

    grid, model, state = bench._build_bomex(_Args(), nx, ny, nz)
    from breeze_tpu.model import compute_tendencies

    def run(tag, env):
        saved = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            fn = jax.jit(lambda m, s: compute_tendencies(m, s, dt=None))
            G = fn(model, state)
            G = jax.tree.map(lambda a: a, G)  # materialize
            jax.block_until_ready(G)
            # tunnel-safe readback (block_until_ready alone lies, CLAUDE.md)
            chk = float(sum(jnp.sum(jnp.abs(a)) for a in jax.tree.leaves(G)))
            print(f"{tag}: checksum {chk:.8e} "
                  f"elapsed {time.time()-t0:.1f}s", flush=True)
            return jax.tree.map(lambda a: jax.device_get(a), G)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    G_merged = run("merged", {})
    G_split = run("split ", {"BREEZE_TPU_SPLIT_PALLAS_CLOSURE": "1"})
    G_jnp = run("jnp   ", {"BREEZE_TPU_DISABLE_PALLAS": "1"})

    import numpy as np

    def cmp(tag, A, B, tol):
        worst = 0.0
        for la, lb in zip(jax.tree.leaves(A), jax.tree.leaves(B)):
            d = float(np.abs(np.asarray(la) - np.asarray(lb)).max())
            s = float(np.abs(np.asarray(lb)).max()) or 1.0
            worst = max(worst, d / s)
        status = "OK" if worst < tol else "FAIL"
        print(f"{tag}: max rel {worst:.3e}  (tol {tol:g})  {status}",
              flush=True)
        return worst < tol

    ok = cmp("merged vs split", G_merged, G_split, 1e-6)
    ok &= cmp("merged vs jnp  ", G_merged, G_jnp, 5e-4)
    print("tendency check", "PASSED" if ok else "FAILED",
          "elapsed", round(time.time() - t0, 1), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
