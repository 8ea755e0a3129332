"""Immersed boundaries: grid-fitted bottom topography via cell masking.

TPU-native equivalent of the reference's Oceananigans immersed-boundary
substrate (``ImmersedBoundaryGrid``/``GridFittedBottom``; reference
``src/Breeze.jl:207``, used by the anelastic solver dispatch
``anelastic_pressure_solver.jl:15-21``): cells whose center lies below the
prescribed bottom height are solid; wall-adjacent face velocities are
masked to zero and tendencies vanish inside the solid.

As in the reference, the FFT pressure projection over an immersed grid is
*approximate* — it uses the underlying grid's solver and leaves a residual
divergence near the terrain (reference comment at
``anelastic_pressure_solver.jl:15-18``).  For terrain-fitted accuracy use
the σ-coordinate path (:mod:`breeze_tpu.dynamics.terrain`).

Masking is pure elementwise multiplication — free on the VPU, fused by XLA
into the tendency kernels (the TPU analogue of the reference's
``mask_immersed_field!`` + ``inactive_cell`` predicates).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..grid import Grid


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["bottom_height", "mask_c", "mask_u", "mask_v", "mask_w"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class GridFittedBottom:
    """Stair-step bottom topography masks (float 0/1 for fused multiplies)."""

    bottom_height: jax.Array   # (ny, nx)
    mask_c: jax.Array          # (nz, ny, nx) 1 = fluid cell
    mask_u: jax.Array          # x-face activity
    mask_v: jax.Array
    mask_w: jax.Array          # z-face activity (0 on faces touching solid)


def make_grid_fitted_bottom(grid: Grid, bottom: Callable | np.ndarray) -> GridFittedBottom:
    ny, nx = grid.ny, grid.nx
    if callable(bottom):
        x = grid.x_c()[None, :]
        y = grid.y_c()[:, None]
        h = np.asarray(bottom(x, y), np.float64) * np.ones((ny, nx))
    else:
        h = np.asarray(bottom, np.float64)

    z_c = np.asarray(grid.z_c, np.float64)[:, None, None]
    fluid = z_c > h[None]                               # (nz, ny, nx) bool

    mask_c = fluid
    mask_u = fluid & np.roll(fluid, 1, axis=2)          # face i: cells i-1, i
    mask_v = fluid & np.roll(fluid, 1, axis=1)
    below = np.concatenate([np.zeros_like(fluid[:1]), fluid[:-1]], axis=0)
    mask_w = fluid & below                              # face k: cells k-1, k

    dt = grid.dtype
    return GridFittedBottom(
        bottom_height=jnp.asarray(h, dt),
        mask_c=jnp.asarray(mask_c, dt),
        mask_u=jnp.asarray(mask_u, dt),
        mask_v=jnp.asarray(mask_v, dt),
        mask_w=jnp.asarray(mask_w, dt),
    )


def mask_state(ib: GridFittedBottom, state):
    """Zero momenta on solid-adjacent faces (``mask_immersed_field!``)."""
    return state.replace(
        rho_u=state.rho_u * ib.mask_u,
        rho_v=state.rho_v * ib.mask_v,
        rho_w=state.rho_w * ib.mask_w,
    )


def mask_tendencies(ib: GridFittedBottom, G):
    """Zero tendencies inside the solid (momenta on faces, scalars at centers)."""
    out = G.replace(
        rho_u=G.rho_u * ib.mask_u,
        rho_v=G.rho_v * ib.mask_v,
        rho_w=G.rho_w * ib.mask_w,
        rho_theta=G.rho_theta * ib.mask_c,
    )
    if G.rho_qt is not None:
        out = out.replace(rho_qt=G.rho_qt * ib.mask_c)
    if G.tracers:
        out = out.replace(tracers={k: v * ib.mask_c for k, v in G.tracers.items()})
    return out
