"""Production shard_map execution path: explicit-collective distributed step.

TPU-native equivalent of the reference's hand-written MPI decomposition
(Oceananigans ``DistributedComputations``; SURVEY.md §2.3 item 2 and §7
phase 8) — the alternative to the GSPMD path of :mod:`.mesh` with every
communication explicit:

- **Halo exchange**: `fields.pad` reroutes sharded-axis halos through
  ``lax.ppermute`` (periodic wrap AND bounded mirror — the global-wall
  shards overwrite their outer halo locally; :mod:`.halo`).
- **Aligned-flux wraps**: the roll-based divergences exchange single slabs
  (`halo.wrap_roll`).
- **Pencil-FFT Poisson**: :class:`PencilPoissonSolver` transposes with
  ``lax.all_to_all`` (gather-x → rfft2 → regain-z → per-mode Thomas on the
  shard's factor slice → inverse), the explicit version of what the GSPMD
  partitioner inserts around the transform.

Decomposition: 1-D along x (the slab/pencil standard). The step body is the
SAME ``ssp_rk3_step`` — it runs per-shard on a local grid whose ``nx`` is
the shard width, with the context manager :func:`halo.shard_axes` marking
axis 2 as mesh-sharded.

Use :func:`make_shard_map_step` for a jitted whole-step function, or
:func:`initialize_distributed` first on multi-host (DCN) deployments.

**Compute/comm overlap.** The reference hand-overlaps MPI halo exchange
with interior compute (async ``fill_halo_regions!``).  The TPU-native
equivalent is dataflow freedom + XLA's latency-hiding scheduler: each
``ppermute`` here is issued as an async collective-permute (start/done
pair), and everything that does not consume the exchanged halo — the
z-direction fluxes and tridiagonal solves (z is never sharded), the
pointwise thermodynamics, the y-direction stencils under 1-D x sharding —
is free to schedule between start and done.  The flux-divergence code
keeps those directions dependency-separate precisely so the scheduler can
do this; nothing in the program forces a bulk-synchronous exchange.
(Knobs, if profiling on real multi-chip hardware shows missed overlap:
``--xla_tpu_enable_async_collective_permute``,
``--xla_latency_hiding_scheduler_rerun``.)
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dynamics.poisson import (AnelasticPoissonSolver,
                                fourier_tridiagonal_scan)
from .halo import shard_axes


@partial(jax.tree_util.register_dataclass,
         data_fields=["base"], meta_fields=["axis_name", "nx_global"])
@dataclasses.dataclass(frozen=True)
class PencilPoissonSolver:
    """shard_map-internal anelastic Poisson solve with explicit all-to-alls.

    Pipeline (local shard holds ``(nz, ny, nx/px)``):

        all_to_all split-z/concat-x  → (nz/px, ny, nx)   gather x
        rfft2 over (y, x)            → (nz/px, ny, nxr)
        all_to_all split-y/concat-z  → (nz, ny/px, nxr)  regain z
        Thomas scan on factor slice [ix·ny/px, …)
        …inverse transposes/transform mirror the forward path.

    Requires ``px | nz`` and ``px | ny`` (asserted at build).
    """

    base: AnelasticPoissonSolver
    axis_name: str = "x"
    nx_global: int = 0

    def solve(self, divergence: jax.Array, dt) -> jax.Array:
        base = self.base
        name = self.axis_name
        px = jax.lax.axis_size(name)
        ix = jax.lax.axis_index(name)
        ny = base.ny
        rhs = (divergence * base.dz_c[:, None, None]) / dt

        # gather x (split z)
        a = jax.lax.all_to_all(rhs, name, split_axis=0, concat_axis=2,
                               tiled=True)
        a_hat = jnp.fft.rfft2(a, axes=(1, 2))
        # regain z (split y)
        a_hat = jax.lax.all_to_all(a_hat, name, split_axis=1, concat_axis=0,
                                   tiled=True)

        nyl = ny // px

        def ysl(f):
            return jax.lax.dynamic_slice_in_dim(f, ix * nyl, nyl, axis=1)

        mask = jax.lax.dynamic_slice_in_dim(
            base.zero_mode_mask, ix * nyl, nyl, axis=0)
        x = fourier_tridiagonal_scan(a_hat, ysl(base.lower),
                                     ysl(base.inv_den), ysl(base.c_prime),
                                     mask, base.nz)

        x = jax.lax.all_to_all(x, name, split_axis=0, concat_axis=1,
                               tiled=True)
        phi = jnp.fft.irfft2(x, s=(ny, self.nx_global), axes=(1, 2))
        phi = jax.lax.all_to_all(phi, name, split_axis=2, concat_axis=0,
                                 tiled=True)
        return phi.astype(divergence.dtype)


def make_x_mesh(n_devices: int | None = None) -> Mesh:
    """1-D ('x',) device mesh for the pencil decomposition."""
    devices = jax.devices()
    n = n_devices or len(devices)
    return jax.make_mesh((n,), ("x",), devices=devices[:n])


def _local_model(model, px: int):
    """Shard-local model: grid narrowed to the shard width, Poisson solver
    swapped for the pencil version."""
    g = model.grid
    assert g.nx % px == 0, f"px={px} must divide nx={g.nx}"
    assert g.nz % px == 0, f"px={px} must divide nz={g.nz} (pencil z-split)"
    assert g.ny % px == 0, f"px={px} must divide ny={g.ny} (pencil y-split)"
    assert g.x_topology.value == "periodic", "pencil path: periodic x"
    local_grid = dataclasses.replace(g, nx=g.nx // px)
    kw = {"grid": local_grid}
    if hasattr(model, "solver"):
        assert model.solver.transform == "fourier" and not model.solver.use_matmul_dft, \
            "pencil Poisson uses the rfft2 transform"
        kw["solver"] = PencilPoissonSolver(base=model.solver, axis_name="x",
                                           nx_global=g.nx)
    return dataclasses.replace(model, **kw)


def make_shard_map_step(model, mesh: Mesh, step_fn=None):
    """Jitted distributed step ``f(state, dt) -> state`` running ``step_fn``
    per-shard under ``shard_map`` with explicit collectives (module
    docstring).  ``dt`` is static (as everywhere).
    """
    if step_fn is None:
        from ..timesteppers import ssp_rk3_step
        step_fn = ssp_rk3_step
    (px,) = mesh.devices.shape
    lmodel = _local_model(model, px)

    def spec(leaf):
        nd = getattr(leaf, "ndim", 0)
        if nd == 3:
            return P(None, None, "x")
        if nd == 2:
            return P(None, "x")
        return P()

    def local_step(state, dt):
        with shard_axes({2: "x"}):
            return step_fn(lmodel, state, dt)

    def stepped(state, dt):
        specs = jax.tree.map(spec, state,
                             is_leaf=lambda x: x is None)
        # check_vma=False: the body mixes explicit collectives with
        # pallas_call, whose ShapeDtypeStruct outputs carry no
        # varying-mesh-axes annotation (the x-prepadded kernel mode).
        return jax.shard_map(local_step, mesh=mesh,
                             in_specs=(specs, P()),
                             out_specs=specs,
                             check_vma=False)(state, dt)

    return jax.jit(stepped, static_argnums=(1,))


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Multi-host (DCN) bring-up: ``jax.distributed.initialize`` with
    environment fallback (reference `Distributed(arch)` MPI init).

    On single-host deployments this is a no-op.  On multi-host TPU pods the
    standard TPU environment auto-configures; on other fabrics pass the
    coordinator explicitly or set ``BREEZE_TPU_COORDINATOR`` /
    ``BREEZE_TPU_NUM_PROCESSES`` / ``BREEZE_TPU_PROCESS_ID``.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "BREEZE_TPU_COORDINATOR")
    if num_processes is None and "BREEZE_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["BREEZE_TPU_NUM_PROCESSES"])
    if process_id is None and "BREEZE_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["BREEZE_TPU_PROCESS_ID"])
    if coordinator_address is None and num_processes in (None, 1):
        return  # single host
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
