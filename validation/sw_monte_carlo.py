"""Independent Monte-Carlo reference for the SW two-stream solver.

Round-5 VERDICT item 6: the all-sky shortwave checks previously used
envelope asserts (albedo/absorption ranges) and the clear-sky anchor was
partially circular (the water-vapor bands ARE the LH74 k-distribution, so
testing total absorption against the LH74/Yamamoto absorption function
anchors the fit to its own source).  With no network egress, published
intercomparison tables cannot be (re)fetched — instead this module
provides a TRULY independent numeric reference by a different algorithm:
analog Monte-Carlo photon transport through the same plane-parallel
optical-property columns (Henyey-Greenstein scattering, Lambertian
surface).  MC converges to the exact 1-D radiative-transfer solution for
the given (τ, ω₀, g), so solver-vs-MC differences measure the two-stream
approximation error itself; the published accuracy of δ-scaled two-stream
families (Meador & Weaver 1980; King & Harshvardhan 1986) is a few × 0.01
absolute in plane albedo, worst at low sun — the test tolerances encode
that envelope.  What this does NOT anchor: the band-model spectroscopy
(k-distribution coefficients), which remains sourced from LH74 — stated
in ``tests/test_spectral_radiation.py``.

Reference analogue: RRTMGP's all-sky checks against line-by-line/ICRCCM
columns (``ext/BreezeRRTMGPExt/all_sky_radiative_transfer_model.jl:76-330``).

Run standalone for the comparison table:
    python validation/sw_monte_carlo.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mc_layers(tau_layers, omega_layers, g_layers, mu0: float,
              surface_albedo: float = 0.0, n_photons: int = 400_000,
              seed: int = 0, max_events: int = 200_000):
    """Analog MC for a stack of homogeneous layers (index 0 = TOP);
    returns (R, A_atm, A_sfc).

    Position is tracked in CUMULATIVE optical depth t ∈ [0, τ_total]
    (free paths are exponential in optical depth regardless of the layer
    structure); the interaction layer picks the local (ω₀, g).
    ``mu0`` is the incident beam's |cos zenith|; mu > 0 travels DOWNWARD.
    R = fraction escaping the top (plane albedo), A_atm = absorbed in the
    layers, A_sfc = absorbed by the (Lambertian, ``surface_albedo``)
    surface.  Analog absorption sampling; statistical error ~ sqrt(R/n).
    """
    tau_layers = np.asarray(tau_layers, np.float64)
    omega_layers = np.asarray(omega_layers, np.float64)
    g_layers = np.asarray(g_layers, np.float64)
    edges = np.concatenate([[0.0], np.cumsum(tau_layers)])
    tau = float(edges[-1])

    rng = np.random.default_rng(seed)
    t = np.zeros(n_photons)
    mu = np.full(n_photons, float(mu0))
    alive = np.ones(n_photons, bool)
    n_top = n_atm = n_sfc = 0

    for _ in range(max_events):
        if not alive.any():
            break
        idx = np.flatnonzero(alive)
        m = mu[idx]
        step = rng.exponential(size=idx.size)
        t_new = t[idx] + step * m

        out_top = t_new < 0.0
        hit_sfc = t_new > tau
        interact = ~(out_top | hit_sfc)

        n_top += int(out_top.sum())
        alive[idx[out_top]] = False

        # surface: Lambertian reflection with prob albedo
        sfc = idx[hit_sfc]
        if sfc.size:
            refl = rng.random(sfc.size) < surface_albedo
            n_sfc += int((~refl).sum())
            alive[sfc[~refl]] = False
            up = sfc[refl]
            t[up] = tau
            mu[up] = -np.sqrt(rng.random(up.size))   # cosine-weighted up

        # interaction: absorb with prob 1-omega(layer), else HG scatter
        ia = idx[interact]
        if ia.size:
            t[ia] = t_new[interact]
            lay = np.clip(np.searchsorted(edges, t[ia], side="right") - 1,
                          0, len(tau_layers) - 1)
            omega = omega_layers[lay]
            killed = rng.random(ia.size) >= omega
            n_atm += int(killed.sum())
            alive[ia[killed]] = False
            sc = ia[~killed]
            g_sc = g_layers[lay[~killed]]
            if sc.size:
                u = rng.random(sc.size)
                gg = g_sc
                iso = np.abs(gg) < 1e-6
                gg_safe = np.where(iso, 0.5, gg)
                inner = (1.0 - gg_safe ** 2) / (1.0 - gg_safe
                                                + 2.0 * gg_safe * u)
                ct_hg = (1.0 + gg_safe ** 2 - inner ** 2) / (2.0 * gg_safe)
                ct = np.where(iso, 2.0 * u - 1.0, ct_hg)
                ct = np.clip(ct, -1.0, 1.0)
                st = np.sqrt(1.0 - ct * ct)
                phi = 2.0 * np.pi * rng.random(sc.size)
                m_old = mu[sc]
                s_old = np.sqrt(np.maximum(1.0 - m_old * m_old, 0.0))
                m_new = m_old * ct + s_old * st * np.cos(phi)
                mu[sc] = np.clip(m_new, -1.0, 1.0)
                # avoid exactly-horizontal photons (infinite path)
                small = np.abs(mu[sc]) < 1e-9
                mu[sc] = np.where(small, 1e-9, mu[sc])
    else:  # pragma: no cover - event cap
        n_atm += int(alive.sum())

    n = float(n_photons)
    return n_top / n, n_atm / n, n_sfc / n


def mc_slab(tau: float, omega: float, g: float, mu0: float,
            surface_albedo: float = 0.0, n_photons: int = 400_000,
            seed: int = 0, max_events: int = 200_000):
    """Homogeneous-slab convenience wrapper around :func:`mc_layers`."""
    return mc_layers([tau], [omega], [g], mu0, surface_albedo,
                     n_photons, seed, max_events)


def two_stream_slab(tau: float, omega: float, g: float, mu0: float,
                    surface_albedo: float = 0.0, nz: int = 20):
    """The model's δ-two-stream + adding on the same homogeneous slab,
    returning (R, A_atm, A_sfc) for direct comparison with :func:`mc_slab`.
    """
    import jax.numpy as jnp

    from breeze_tpu.physics.spectral_radiation import _two_stream_adding

    shape = (nz, 1, 1)
    tau_l = jnp.full(shape, tau / nz, jnp.float32)
    om = jnp.full(shape, omega, jnp.float32)
    ga = jnp.full(shape, g, jnp.float32)
    F0 = 1.0
    dn, up = _two_stream_adding(tau_l, om, ga, jnp.float32(mu0),
                                surface_albedo, surface_albedo,
                                jnp.float32(F0))
    R = float(up[-1, 0, 0])
    A_sfc = float(dn[0, 0, 0] - up[0, 0, 0])
    return R, 1.0 - R - A_sfc, A_sfc


CASES = [
    # (name, tau, omega, g, mu0, sfc_albedo)
    ("stratus-like τ=10 cons.  μ0=1.0", 10.0, 0.9999, 0.85, 1.0, 0.0),
    ("stratus-like τ=10 cons.  μ0=0.5", 10.0, 0.9999, 0.85, 0.5, 0.0),
    ("absorbing   τ=10 ω=0.99 μ0=1.0", 10.0, 0.99, 0.85, 1.0, 0.0),
    ("thick       τ=40 ω=0.995 μ0=0.8", 40.0, 0.995, 0.85, 0.8, 0.0),
    ("cirrus-like τ=2  ω=0.98 μ0=0.5", 2.0, 0.98, 0.80, 0.5, 0.0),
    ("Rayleigh    τ=0.25 ω=1  μ0=0.5", 0.25, 1.0, 0.0, 0.5, 0.0),
    ("Rayleigh+sfc α=0.2       μ0=1.0", 0.25, 1.0, 0.0, 1.0, 0.2),
]


def main():
    print(f"{'case':34s} {'R_mc':>6s} {'R_2s':>6s} {'dR':>6s} "
          f"{'Aatm_mc':>8s} {'Aatm_2s':>8s} {'dA':>6s}")
    for name, tau, om, g, mu0, alb in CASES:
        Rm, Am, Sm = mc_slab(tau, om, g, mu0, alb)
        Rt, At, St = two_stream_slab(tau, om, g, mu0, alb)
        print(f"{name:34s} {Rm:6.3f} {Rt:6.3f} {Rt - Rm:+6.3f} "
              f"{Am:8.3f} {At:8.3f} {At - Am:+6.3f}")


if __name__ == "__main__":
    main()
