"""Differentiability contracts: jax.grad through the dynamical cores vs
one-sided finite differences (reference
``test/reactant/weno_compilation_setup.jl:92-158`` — Enzyme/Reactant AD
gradients validated against FD at sampled cells and two step sizes).

The loss is the reference's pattern: J(θ₀) = Σ (ρθ)² after Ns steps from a
θ-perturbed initial state.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import breeze_tpu as bz
from breeze_tpu.dynamics.compressible import (acoustic_rk3_step,
                                              compressible_initial_state,
                                              make_compressible_model)
from breeze_tpu.model import initial_state, make_model
from breeze_tpu.timesteppers import ssp_rk3_step

DT = 0.5
NS = 2


def _anelastic_loss_fn(scheme):
    g = bz.make_grid(size=(8, 8, 8), extent=(800.0, 800.0, 800.0),
                     topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                     dtype=jnp.float64)
    model = make_model(g, advection=scheme, potential_temperature=300.0)

    def loss(theta_pert):
        state = initial_state(model, theta=lambda x, y, z: 300.0 + 0.0 * z)
        state = state.replace(
            rho_theta=state.rho_theta + model.reference.rho_col * theta_pert)
        for _ in range(NS):
            state = ssp_rk3_step(model, state, DT)
        return jnp.sum(state.rho_theta ** 2)

    return g, jax.jit(loss)


def _compressible_loss_fn(scheme):
    g = bz.make_grid(size=(8, 8, 8), extent=(800.0, 800.0, 800.0),
                     topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                     dtype=jnp.float64)
    model = make_compressible_model(g, advection=scheme)

    def loss(theta_pert):
        state = compressible_initial_state(
            model, theta=lambda x, y, z: 300.0 + 0.0 * z)
        state = state.replace(rho_theta=state.rho_theta
                              + state.rho * theta_pert)
        for _ in range(NS):
            state = acoustic_rk3_step(model, state, DT, substeps=4)
        return jnp.sum(state.rho_theta ** 2)

    return g, jax.jit(loss)


CASES = [
    ("anelastic-WENO5", _anelastic_loss_fn, bz.WENO(5)),
    ("anelastic-C2", _anelastic_loss_fn, bz.Centered(2)),
    ("compressible-WENO5", _compressible_loss_fn, bz.WENO(5)),
    ("compressible-C2", _compressible_loss_fn, bz.Centered(2)),
]


@pytest.mark.parametrize("label,make_loss,scheme",
                         CASES, ids=[c[0] for c in CASES])
def test_grad_matches_finite_difference(label, make_loss, scheme):
    g, loss = make_loss(scheme)
    # smooth nonzero perturbation so upwind/WENO weights are differentiable
    x, y, z = g.xyz_c()
    pert0 = (0.5 * jnp.sin(2 * jnp.pi * x / g.Lx)
             * jnp.cos(2 * jnp.pi * y / g.Ly)
             * jnp.sin(jnp.pi * z / g.Lz) * jnp.ones(g.shape, g.dtype))

    J0 = float(loss(pert0))
    assert np.isfinite(J0) and J0 > 0

    ad = np.asarray(jax.grad(loss)(pert0))
    assert np.isfinite(ad).all()
    assert np.abs(ad).max() > 0

    for eps in (1e-4, 1e-6):
        for (kc, jc, ic) in ((1, 1, 1), (4, 4, 4)):
            p = pert0.at[kc, jc, ic].add(eps)
            fd = (float(loss(p)) - J0) / eps
            rel = abs(ad[kc, jc, ic] - fd) / max(abs(fd), 1e-12)
            assert rel < 2e-3, (label, eps, (kc, jc, ic), ad[kc, jc, ic], fd)


@pytest.mark.nightly
def test_grad_through_kessler():
    """Gradient flows through the DCMIP2016 Kessler operator-split update
    (autoconversion/accretion/rain fall with data-dependent selects) —
    reference pattern ``test/reactant/weno_compilation_setup.jl:92-158``
    extended to prognostic-condensate microphysics."""
    from breeze_tpu.physics.kessler import KesslerMicrophysics

    g = bz.make_grid(size=(8, 1, 12), extent=(800.0, 1.0, 3000.0),
                     topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                     dtype=jnp.float64)
    model = make_model(g, advection=bz.WENO(5), potential_temperature=300.0,
                       microphysics=KesslerMicrophysics())

    def loss(qv_scale):
        # saturated boundary layer (qᵛ⁺(290 K, p₀) ≈ 12 g/kg < 20 g/kg)
        # so condensation → autoconversion fire within the first steps
        state = initial_state(
            model, theta=lambda x, y, z: 290.0 - 1e-3 * z,
            qt=lambda x, y, z: 0.020 * jnp.exp(-z / 1500.0))
        state = state.replace(rho_qt=state.rho_qt * qv_scale)
        for _ in range(3):
            state = ssp_rk3_step(model, state, 2.0)
        # rain + cloud water produced by the scheme
        return jnp.sum(state.tracers["rho_qr"] + state.tracers["rho_qcl"])

    loss = jax.jit(loss)
    J0 = float(loss(1.0))
    assert J0 > 0, "Kessler produced no condensate — test config is inert"
    g0 = float(jax.grad(loss)(1.0))
    assert np.isfinite(g0)
    for eps in (1e-5, 1e-7):
        fd = (float(loss(1.0 + eps)) - J0) / eps
        assert abs(g0 - fd) / max(abs(fd), 1e-12) < 5e-3, (eps, g0, fd)


def test_grad_through_terrain_compressible():
    """Gradient through the σ-coordinate split-explicit core (J-scaled
    tridiagonal, slope PGF, contravariant transport)."""
    from breeze_tpu.dynamics.terrain import (make_terrain,
                                             terrain_initial_state)
    from breeze_tpu.thermo.constants import ThermodynamicConstants

    g = bz.make_grid(size=(16, 1, 10), extent=(8000.0, 1.0, 5000.0),
                     topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                     dtype=jnp.float64)
    t = make_terrain(g, ThermodynamicConstants(),
                     lambda x, y: 150.0 / (1.0 + ((x - 4000.0) / 1000.0) ** 2))
    model = make_compressible_model(g, advection=bz.Centered(2), terrain=t)

    def loss(amp):
        state = terrain_initial_state(
            model, t,
            theta=lambda x, y, z: 300.0
            + amp * jnp.exp(-((x - 4000.0) / 1500.0) ** 2 - ((z - 2000.0) / 800.0) ** 2))
        for _ in range(NS):
            state = acoustic_rk3_step(model, state, DT, substeps=4)
        return jnp.sum(state.rho_w ** 2)

    loss = jax.jit(loss)
    g0 = float(jax.grad(loss)(0.5))
    assert np.isfinite(g0) and abs(g0) > 0
    J0 = float(loss(0.5))
    for eps in (1e-4, 1e-6):
        fd = (float(loss(0.5 + eps)) - J0) / eps
        assert abs(g0 - fd) / max(abs(fd), 1e-12) < 2e-3, (eps, g0, fd)


def test_grad_through_static_energy_compressible():
    """Gradient through the ρe formulation's fast loop (C_ρ coupling +
    perturbation-form T recovery)."""
    g = bz.make_grid(size=(8, 8, 8), extent=(800.0, 800.0, 800.0),
                     topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                     dtype=jnp.float64)
    model = make_compressible_model(g, advection=bz.WENO(5),
                                    formulation="static_energy")

    def loss(amp):
        state = compressible_initial_state(
            model, theta=lambda x, y, z: 300.0
            + amp * jnp.sin(2 * jnp.pi * x / 800.0) * jnp.sin(jnp.pi * z / 800.0))
        for _ in range(NS):
            state = acoustic_rk3_step(model, state, DT, substeps=4)
        # well-conditioned loss: ρw² is O(1) (Σ(ρe)² ~ 1e13 would put the
        # eps=1e-6 FD below f64 cancellation noise)
        return jnp.sum(state.rho_w ** 2)

    loss = jax.jit(loss)
    g0 = float(jax.grad(loss)(0.5))
    assert np.isfinite(g0) and abs(g0) > 0
    J0 = float(loss(0.5))
    for eps in (1e-4, 1e-6):
        fd = (float(loss(0.5 + eps)) - J0) / eps
        assert abs(g0 - fd) / max(abs(fd), 1e-12) < 2e-3, (eps, g0, fd)


def test_grad_through_moist_physics():
    """Gradient flows through saturation adjustment + surface fluxes."""
    g = bz.make_grid(size=(8, 1, 8), extent=(800.0, 1.0, 800.0),
                     topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                     dtype=jnp.float64)
    from breeze_tpu.physics.surface import PrescribedSurfaceFluxes
    model = make_model(g, advection=bz.WENO(5), potential_temperature=300.0,
                       microphysics=bz.SaturationAdjustment(
                           equilibrium=bz.WarmPhaseEquilibrium()),
                       boundary_fluxes=PrescribedSurfaceFluxes(
                           theta_flux=0.01, qt_flux=1e-5))

    def loss(qt_scale):
        state = initial_state(
            model, theta=lambda x, y, z: 300.0 - 2e-3 * z,
            qt=lambda x, y, z: 0.019 * jnp.exp(-z / 400.0))
        state = state.replace(rho_qt=state.rho_qt * qt_scale)
        for _ in range(NS):
            state = ssp_rk3_step(model, state, DT)
        from breeze_tpu.model import diagnose
        aux = diagnose(model, state)
        return jnp.sum(aux.q.liquid)

    loss = jax.jit(loss)
    g0 = float(jax.grad(loss)(1.0))
    assert np.isfinite(g0)
    eps = 1e-6
    fd = (float(loss(1.0 + eps)) - float(loss(1.0))) / eps
    assert abs(g0 - fd) / max(abs(fd), 1e-12) < 5e-3, (g0, fd)
