"""Pallas fused WENO kernel vs the jnp reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import breeze_tpu as bz
from breeze_tpu import advection as adv
from breeze_tpu import fields as fl
from breeze_tpu.ops import StencilOps
from breeze_tpu.pallas_kernels import advection as padv


def make_inputs(nz=8, ny=32, nx=128, seed=0):
    g = bz.make_grid(size=(nx, ny, nz), extent=(1000.0, 500.0, 300.0),
                     topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                     halo=3, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    c = jnp.asarray(rng.normal(300.0, 1.0, g.shape).astype(np.float32))
    u = jnp.asarray(rng.normal(0.0, 2.0, g.shape).astype(np.float32))
    v = jnp.asarray(rng.normal(0.0, 2.0, g.shape).astype(np.float32))
    w = jnp.asarray(rng.normal(0.0, 1.0, g.shape).astype(np.float32))
    w = fl.enforce_impenetrability(w, g)
    rho = jnp.asarray((1.0 + 0.1 * rng.normal(size=g.shape)).astype(np.float32))
    return g, c, u, v, w, rho


class TestFusedWENO:
    def test_matches_jnp_path(self):
        g, c, u, v, w, rho = make_inputs()
        so = StencilOps(g)
        scheme = adv.WENO(5)

        ref = -adv.div_rho_u_c(
            so, scheme, fl.pad(rho, g, fl.CCC), fl.pad(u, g, fl.CCF),
            fl.pad(v, g, fl.CFC), fl.pad(w, g, fl.FCC), fl.pad(c, g, fl.CCC))

        pz = lambda a, loc: padv.pad_zy(a, g, loc)
        got = padv.div_rho_u_c_pallas(
            g, pz(c, fl.CCC), pz(u, fl.CCF), pz(v, fl.CFC), pz(w, fl.FCC),
            pz(rho, fl.CCC), interpret=True)

        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=5e-4, atol=5e-4)

    def test_supported_predicate(self):
        g, *_ = make_inputs()
        assert padv.supported(g, adv.WENO(5))
        assert not padv.supported(g, adv.WENO(9))
        assert not padv.supported(g, adv.Centered(2))
        g2 = bz.make_grid(size=(64, 17, 8), extent=(1.0, 1.0, 1.0),
                          topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED))
        assert not padv.supported(g2, adv.WENO(5))  # ny=17 unblockable


class TestFusedMomentum:
    def _check(self, nz=8, ny=32, nx=128, ztopo=None):
        from breeze_tpu.pallas_kernels import momentum as pmom
        g, c, u, v, w, rho = make_inputs(nz=nz, ny=ny, nx=nx)
        so = StencilOps(g)
        scheme = adv.WENO(5)
        rng = np.random.default_rng(3)
        ru = jnp.asarray(rng.normal(0.0, 1.0, g.shape).astype(np.float32))
        rv = jnp.asarray(rng.normal(0.0, 1.0, g.shape).astype(np.float32))
        rw = fl.enforce_impenetrability(
            jnp.asarray(rng.normal(0.0, 1.0, g.shape).astype(np.float32)), g)

        ref = adv.momentum_flux_divergence(
            so, scheme,
            fl.pad(ru, g, fl.CCF), fl.pad(rv, g, fl.CFC), fl.pad(rw, g, fl.FCC),
            fl.pad(u, g, fl.CCF), fl.pad(v, g, fl.CFC), fl.pad(w, g, fl.FCC))

        pz = lambda a, loc: padv.pad_zy(a, g, loc)
        got = pmom.momentum_div_pallas(
            g, pz(ru, fl.CCF), pz(rv, fl.CFC), pz(rw, fl.FCC),
            pz(u, fl.CCF), pz(v, fl.CFC), pz(w, fl.FCC), interpret=True)

        for name, a, b in zip("uvw", got, ref):
            a, b = np.asarray(a), np.asarray(b)
            if name == "w":
                a, b = a[1:], b[1:]   # wall row k=0 overwritten by stepper
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4,
                                       err_msg=f"momentum component {name}")

    def test_matches_jnp_path(self):
        self._check()

    def test_matches_jnp_path_larger(self):
        self._check(nz=16, ny=64, nx=128)

    def test_supported_predicate(self):
        from breeze_tpu.pallas_kernels import momentum as pmom
        g, *_ = make_inputs()
        assert pmom.supported(g, adv.WENO(5))
        assert not pmom.supported(g, adv.WENO(5, bounds_preserving=True))
        assert not pmom.supported(g, adv.Centered(2))

    def test_cols_variant_matches_jnp_path(self):
        """ρᵣ(z)-column variant (the anelastic hot path: momenta formed
        in VMEM) against the jnp path with ρu = ρᵣ·u."""
        from breeze_tpu.model import _padded_reference_columns, make_model
        from breeze_tpu.pallas_kernels import momentum as pmom
        g, c, u, v, w, rho = make_inputs(nz=8, ny=32, nx=128)
        model = make_model(g, advection=adv.WENO(5),
                           potential_temperature=300.0)
        so = StencilOps(g)
        scheme = adv.WENO(5)

        colc_g, colf_g = _padded_reference_columns(model)   # grid halo
        u_pad, v_pad, w_pad = (fl.pad(u, g, fl.CCF), fl.pad(v, g, fl.CFC),
                               fl.pad(w, g, fl.FCC))
        ref = adv.momentum_flux_divergence(
            so, scheme, u_pad * colc_g, v_pad * colc_g, w_pad * colf_g,
            u_pad, v_pad, w_pad)

        pz = lambda a, loc: padv.pad_zy(a, g, loc)
        colc, colf = _padded_reference_columns(model, halo=pmom.H)
        got = pmom.momentum_div_pallas_cols(
            g, pz(u, fl.CCF), pz(v, fl.CFC), pz(w, fl.FCC), colc, colf,
            interpret=True)

        for name, a, b in zip("uvw", got, ref):
            a, b = np.asarray(a), np.asarray(b)
            if name == "w":
                a, b = a[1:], b[1:]
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4,
                                       err_msg=f"momentum component {name}")


class TestFusedAcousticSubstep:
    """Fused two-kernel acoustic substep (pallas_kernels/acoustic.py)
    against the jnp loop, interpret mode."""

    def setup(self, damping_coefficient=0.1, substeps=4, ny=8,
              damping=None, formulation="potential_temperature",
              terrain=False):
        from breeze_tpu.dynamics.compressible import (
            SplitExplicitTimeDiscretization, compressible_diagnose,
            compressible_initial_state, make_compressible_model,
            slow_tendencies, stage_caches)
        g = bz.make_grid(size=(128, ny, 16),
                         extent=(12800.0, 100.0 * ny, 1600.0),
                         topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                         halo=3, dtype=jnp.float32)
        td = SplitExplicitTimeDiscretization(
            substeps=substeps, damping_coefficient=damping_coefficient,
            damping=damping)
        terr = None
        if terrain:
            from breeze_tpu.dynamics.terrain import make_terrain
            sleve_kw = ({"large_scale_height": 800.0,
                         "small_scale_height": 400.0}
                        if terrain == "sleve" else {})
            terr = make_terrain(
                g, bz.ThermodynamicConstants(),
                lambda x, y, _Ly=100.0 * ny: 120.0
                / (1.0 + ((x - 6400.0) / 1500.0) ** 2)
                * (1.0 + 0.3 * jnp.sin(2 * jnp.pi * y / _Ly)), **sleve_kw)
        model = make_compressible_model(g, advection=bz.Centered(2),
                                        time_discretization=td,
                                        formulation=formulation,
                                        terrain=terr)
        state = compressible_initial_state(
            model, theta=lambda x, y, z: 300.0 + 1.0 * jnp.exp(
                -((x - 6400.0) ** 2 / 1500.0 ** 2
                  + (z - 800.0) ** 2 / 300.0 ** 2)),
            u=lambda x, y, z: 3.0 + 0 * x, pressure_balanced=False)
        aux = compressible_diagnose(model, state)
        return (g, model, stage_caches(model, state, aux),
                slow_tendencies(model, state, aux))

    def _pert(self, g):
        from breeze_tpu.dynamics.compressible import Perturbations
        rng = np.random.default_rng(0)
        r = lambda: jnp.asarray(rng.normal(size=g.shape) * 1e-3, jnp.float32)
        zero = jnp.zeros(g.shape, jnp.float32)
        return Perturbations(rho=r(), rho_u=r(), rho_v=r(),
                             rho_w=r().at[0].set(0.0), rho_theta=r(),
                             sum_rho_u=zero, sum_rho_v=zero, sum_rho_w=zero)

    def _compare(self, damping, gate_first):
        from breeze_tpu.dynamics.compressible import acoustic_substep_loop
        from breeze_tpu.pallas_kernels.acoustic import (
            acoustic_substep_loop_pallas, supported)
        g, model, caches, G = self.setup(damping_coefficient=damping)
        assert supported(model)
        pert = self._pert(g)
        ref = acoustic_substep_loop(model, caches, G, pert, 0.5, 3,
                                    gate_first=gate_first)
        got = acoustic_substep_loop_pallas(model, caches, G, pert, 0.5, 3,
                                           gate_first=gate_first,
                                           interpret=True)
        for name in ("rho", "rho_u", "rho_v", "rho_w", "rho_theta",
                     "sum_rho_u", "sum_rho_v", "sum_rho_w"):
            a = np.asarray(getattr(got, name))
            b = np.asarray(getattr(ref, name))
            scale = max(np.abs(b).max(), 1e-10)
            assert np.abs(a - b).max() / scale < 5e-5, (
                f"{name}: rel {np.abs(a - b).max() / scale:.2e}")

    def test_thermal_damping_gated(self):
        self._compare(damping=0.1, gate_first=True)

    def test_no_damping_ungated(self):
        self._compare(damping=0.0, gate_first=False)

    def test_wide_halo_small_ny(self):
        """K3 4-substep chunk at ny=8: the window needs MORE periodic wrap
        rows above than ny (wy=24, above=11) — the y pad must tile full
        periods (regression: a 3-piece concat under-padded → OOB DMA)."""
        from breeze_tpu.dynamics.compressible import acoustic_substep_loop
        from breeze_tpu.pallas_kernels.acoustic import (
            acoustic_substep_loop_pallas, supported)
        g, model, caches, G = self.setup(damping_coefficient=0.1)
        assert supported(model)
        pert = self._pert(g)
        ref = acoustic_substep_loop(model, caches, G, pert, 0.5, 4,
                                    gate_first=True)
        got = acoustic_substep_loop_pallas(model, caches, G, pert, 0.5, 4,
                                           gate_first=True, interpret=True)
        for name in ("rho", "rho_u", "rho_v", "rho_w", "rho_theta",
                     "sum_rho_u", "sum_rho_v", "sum_rho_w"):
            a = np.asarray(getattr(got, name))
            b = np.asarray(getattr(ref, name))
            scale = max(np.abs(b).max(), 1e-10)
            assert np.abs(a - b).max() / scale < 5e-5, (
                f"{name}: rel {np.abs(a - b).max() / scale:.2e}")

    def _compare_cfg(self, n_tau=3, **setup_kw):
        from breeze_tpu.dynamics.compressible import acoustic_substep_loop
        from breeze_tpu.pallas_kernels.acoustic import (
            acoustic_substep_loop_pallas, supported)
        g, model, caches, G = self.setup(**setup_kw)
        assert supported(model)
        pert = self._pert(g)
        ref = acoustic_substep_loop(model, caches, G, pert, 0.5, n_tau,
                                    gate_first=True, terrain=model.terrain)
        got = acoustic_substep_loop_pallas(model, caches, G, pert, 0.5,
                                           n_tau, gate_first=True,
                                           interpret=True)
        for name in ("rho", "rho_u", "rho_v", "rho_w", "rho_theta",
                     "sum_rho_u", "sum_rho_v", "sum_rho_w"):
            a = np.asarray(getattr(got, name))
            b = np.asarray(getattr(ref, name))
            scale = max(np.abs(b).max(), 1e-10)
            assert np.abs(a - b).max() / scale < 5e-5, (
                f"{name}: rel {np.abs(a - b).max() / scale:.2e}")

    def test_direct_divergence_damping_matches_jnp(self):
        """K3 with KSH18 eq. 36 DirectDivergenceDamping (δ from the
        updated perturbation momenta) vs the jnp loop — round-5 VERDICT
        item 5 envelope widening."""
        from breeze_tpu.dynamics.compressible import DirectDivergenceDamping
        self._compare_cfg(damping=DirectDivergenceDamping(0.1),
                          damping_coefficient=0.0)

    def test_static_energy_formulation_matches_jnp(self):
        """K3 with the ρe (moist static energy) formulation: the
        p′ = C_L(ρe)′ + C_ρρ′ coupling (extra window + unit-face-weight
        tridiagonal terms) vs the jnp loop."""
        self._compare_cfg(formulation="static_energy")

    def test_static_energy_direct_damping_matches_jnp(self):
        from breeze_tpu.dynamics.compressible import DirectDivergenceDamping
        self._compare_cfg(formulation="static_energy",
                          damping=DirectDivergenceDamping(0.15),
                          damping_coefficient=0.0, n_tau=4)

    def test_terrain_matches_jnp(self):
        """K3 with σ-coordinate terrain (slope PGF + Jacobian-weighted
        divergences + contravariant ρw̃′ split + kinematic bottom) vs the
        jnp fast loop — round-5 terrain-K3 (the measured 1.66× terrain
        fast-loop penalty justified building it)."""
        self._compare_cfg(terrain=True)

    def test_terrain_no_damping_matches_jnp(self):
        self._compare_cfg(terrain=True, damping_coefficient=0.0, n_tau=2)

    def test_terrain_sleve_matches_jnp(self):
        """SLEVE (TwoLevelDecay) terrain: ζ-DEPENDENT Jacobians ride
        full-z metric windows (k=1 chunks on hardware)."""
        self._compare_cfg(terrain="sleve")

    def test_prefetch_rotation_multi_yblock(self):
        """ny=16 with by=8 → 2 y-block grid instances and, at a k<=2 chunk,
        the window-prefetch double-buffer auto-enables: the j>=1 path
        (wait on the previous instance's DMA, alternate-slot rem(j,2)
        indexing) runs in interpret mode, not just on hardware (round-4
        advisor finding)."""
        from breeze_tpu.dynamics.compressible import acoustic_substep_loop
        from breeze_tpu.pallas_kernels.acoustic import (
            acoustic_substep_loop_pallas, supported)
        g, model, caches, G = self.setup(damping_coefficient=0.1,
                                         substeps=2, ny=16)
        assert supported(model)
        pert = self._pert(g)
        # n_tau=2 → one k=2 chunk → prefetch auto-on under the k<=2 guard
        ref = acoustic_substep_loop(model, caches, G, pert, 0.5, 2,
                                    gate_first=True)
        got = acoustic_substep_loop_pallas(model, caches, G, pert, 0.5, 2,
                                           gate_first=True, interpret=True)
        for name in ("rho", "rho_u", "rho_v", "rho_w", "rho_theta",
                     "sum_rho_u", "sum_rho_v", "sum_rho_w"):
            a = np.asarray(getattr(got, name))
            b = np.asarray(getattr(ref, name))
            scale = max(np.abs(b).max(), 1e-10)
            assert np.abs(a - b).max() / scale < 5e-5, (
                f"{name}: rel {np.abs(a - b).max() / scale:.2e}")

    def test_supported_envelope(self):
        from breeze_tpu.dynamics.compressible import (
            SplitExplicitTimeDiscretization, make_compressible_model)
        from breeze_tpu.pallas_kernels.acoustic import supported
        g = bz.make_grid(size=(128, 8, 16), extent=(12800.0, 800.0, 1600.0),
                         topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                         halo=3, dtype=jnp.float32)
        ok = make_compressible_model(
            g, time_discretization=SplitExplicitTimeDiscretization(substeps=4))
        assert supported(ok)
        bf16 = make_compressible_model(
            g, time_discretization=SplitExplicitTimeDiscretization(
                substeps=4, substep_floattype="bfloat16"))
        assert supported(bf16)   # bf16 carries are in-scope
        from breeze_tpu.dynamics.compressible import UpperSponge
        sponged = make_compressible_model(
            g, time_discretization=SplitExplicitTimeDiscretization(
                substeps=4, sponge=UpperSponge()))
        # round-4: the sponge (incl. default damp_full) is in the K3
        # envelope — the default sponge config must not lose the kernel
        assert supported(sponged)
        # ... except on the measurement-only K1/K2 split path
        import os
        os.environ["BREEZE_TPU_PALLAS_ACOUSTIC_SPLIT"] = "1"
        try:
            assert not supported(sponged)
        finally:
            del os.environ["BREEZE_TPU_PALLAS_ACOUSTIC_SPLIT"]

    def test_upper_sponge_matches_jnp(self):
        """K3 with the implicit Rayleigh sponge (perturbation-only AND the
        default KDH08 full-field form) vs the jnp loop."""
        from breeze_tpu.dynamics.compressible import (
            SplitExplicitTimeDiscretization, UpperSponge,
            acoustic_substep_loop, compressible_diagnose,
            compressible_initial_state, make_compressible_model,
            slow_tendencies, stage_caches)
        from breeze_tpu.pallas_kernels.acoustic import (
            acoustic_substep_loop_pallas, supported)
        for damp_full in (False, True):
            g = bz.make_grid(size=(128, 8, 16),
                             extent=(12800.0, 800.0, 1600.0),
                             topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                             halo=3, dtype=jnp.float32)
            td = SplitExplicitTimeDiscretization(
                substeps=4, damping_coefficient=0.1,
                sponge=UpperSponge(depth=400.0, damping_rate=0.05,
                                   damp_full=damp_full))
            model = make_compressible_model(g, advection=bz.Centered(2),
                                            time_discretization=td)
            assert supported(model)
            state = compressible_initial_state(
                model, theta=lambda x, y, z: 300.0 + 1.0 * jnp.exp(
                    -((x - 6400.0) ** 2 / 1500.0 ** 2
                      + (z - 800.0) ** 2 / 300.0 ** 2)),
                u=lambda x, y, z: 3.0 + 0 * x, pressure_balanced=False)
            aux = compressible_diagnose(model, state)
            caches = stage_caches(model, state, aux)
            G = slow_tendencies(model, state, aux)
            pert = self._pert(g)
            rho_w_L = state.rho_w if damp_full else None
            ref = acoustic_substep_loop(model, caches, G, pert, 0.5, 3,
                                        gate_first=True, rho_w_L=rho_w_L)
            got = acoustic_substep_loop_pallas(model, caches, G, pert,
                                               0.5, 3, gate_first=True,
                                               interpret=True,
                                               rho_w_L=rho_w_L)
            for name in ("rho", "rho_u", "rho_v", "rho_w", "rho_theta",
                         "sum_rho_u", "sum_rho_v", "sum_rho_w"):
                a = np.asarray(getattr(got, name))
                b = np.asarray(getattr(ref, name))
                scale = max(np.abs(b).max(), 1e-10)
                assert np.abs(a - b).max() / scale < 5e-5, (
                    f"damp_full={damp_full} {name}: "
                    f"rel {np.abs(a - b).max() / scale:.2e}")

    def test_bf16_substep_storage(self):
        """bf16-carry variant tracks the jnp loop's substep_floattype
        semantics (compare against the jnp bf16 loop, tight; and against
        the f32 loop, loose)."""
        from breeze_tpu.dynamics.compressible import (
            SplitExplicitTimeDiscretization, acoustic_substep_loop,
            compressible_diagnose, compressible_initial_state,
            make_compressible_model, slow_tendencies, stage_caches)
        from breeze_tpu.pallas_kernels.acoustic import (
            acoustic_substep_loop_pallas, supported)
        g = bz.make_grid(size=(128, 8, 16), extent=(12800.0, 800.0, 1600.0),
                         topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                         halo=3, dtype=jnp.float32)
        td = SplitExplicitTimeDiscretization(substeps=4,
                                             substep_floattype="bfloat16")
        model = make_compressible_model(g, advection=bz.Centered(2),
                                        time_discretization=td)
        assert supported(model)
        state = compressible_initial_state(
            model, theta=lambda x, y, z: 300.0 + 1.0 * jnp.exp(
                -((x - 6400.0) ** 2 / 1500.0 ** 2
                  + (z - 800.0) ** 2 / 300.0 ** 2)),
            pressure_balanced=False)
        aux = compressible_diagnose(model, state)
        caches = stage_caches(model, state, aux)
        G = slow_tendencies(model, state, aux)
        pert = self._pert(g)
        ref = acoustic_substep_loop(model, caches, G, pert, 0.5, 3,
                                    gate_first=True)
        got = acoustic_substep_loop_pallas(model, caches, G, pert, 0.5, 3,
                                           gate_first=True, interpret=True)
        for name in ("rho", "rho_u", "rho_v", "rho_w", "rho_theta"):
            a = np.asarray(getattr(got, name), np.float64)
            b = np.asarray(getattr(ref, name), np.float64)
            scale = max(np.abs(b).max(), 1e-10)
            # both paths quantize to bf16 between substeps but with
            # different intermediate rounding: agree to bf16 epsilon-ish
            assert np.abs(a - b).max() / scale < 3e-2, (
                f"{name}: rel {np.abs(a - b).max() / scale:.2e}")


    def test_stretched_z_substep(self):
        """Stretched vertical grid through the fused substep kernels."""
        from breeze_tpu.dynamics.compressible import (
            SplitExplicitTimeDiscretization, acoustic_substep_loop,
            compressible_diagnose, compressible_initial_state,
            make_compressible_model, slow_tendencies, stage_caches)
        from breeze_tpu.pallas_kernels.acoustic import (
            acoustic_substep_loop_pallas, supported)
        z_faces = bz.piecewise_stretched_z(16, surface_layer_height=400.0,
                                           surface_layer_spacing=50.0,
                                           top=1600.0)
        g = bz.make_grid(size=(128, 8, len(z_faces) - 1),
                         x=(0.0, 12800.0), y=(0.0, 800.0), z=z_faces,
                         topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                         halo=3, dtype=jnp.float32)
        td = SplitExplicitTimeDiscretization(substeps=4)
        model = make_compressible_model(g, advection=bz.Centered(2),
                                        time_discretization=td)
        assert supported(model)
        state = compressible_initial_state(
            model, theta=lambda x, y, z: 300.0 + 1.0 * jnp.exp(
                -((x - 6400.0) ** 2 / 1500.0 ** 2
                  + (z - 800.0) ** 2 / 300.0 ** 2)),
            pressure_balanced=False)
        aux = compressible_diagnose(model, state)
        caches = stage_caches(model, state, aux)
        G = slow_tendencies(model, state, aux)
        pert = self._pert(g)
        ref = acoustic_substep_loop(model, caches, G, pert, 0.5, 3,
                                    gate_first=True)
        got = acoustic_substep_loop_pallas(model, caches, G, pert, 0.5, 3,
                                           gate_first=True, interpret=True)
        for name in ("rho", "rho_u", "rho_v", "rho_w", "rho_theta"):
            a = np.asarray(getattr(got, name))
            b = np.asarray(getattr(ref, name))
            scale = max(np.abs(b).max(), 1e-10)
            assert np.abs(a - b).max() / scale < 5e-5, (
                f"{name}: rel {np.abs(a - b).max() / scale:.2e}")


class TestFusedProjection:
    """Fused divergence + gradient-correct kernels vs the jnp projection
    path (interpret mode)."""

    def setup_fields(self):
        from breeze_tpu.model import make_model
        g = bz.make_grid(size=(128, 16, 16), extent=(12800.0, 1600.0, 1600.0),
                         topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                         halo=3, dtype=jnp.float32)
        model = make_model(g, advection=adv.WENO(5),
                           potential_temperature=300.0)
        rng = np.random.default_rng(1)
        r = lambda: jnp.asarray(rng.normal(size=g.shape), jnp.float32)
        return g, model, r(), r(), r().at[0].set(0.0), r()

    def test_divergence_matches(self):
        from breeze_tpu.pallas_kernels.projection import (divergence_pallas,
                                                          supported)
        g, model, ru, rv, rw, _ = self.setup_fields()
        assert supported(g)
        so = StencilOps(g)
        ref = so.div_c(fl.pad(ru, g, fl.CCF), fl.pad(rv, g, fl.CFC),
                       fl.pad(rw, g, fl.FCC))
        got = divergence_pallas(g, ru, rv, rw, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=1e-5)

    def test_gradient_correct_matches(self):
        from breeze_tpu.pallas_kernels.projection import (
            gradient_correct_pallas)
        g, model, ru, rv, rw, phi = self.setup_fields()
        so = StencilOps(g)
        ref_st = model.reference
        dt = 0.5
        phi_pad = fl.pad(phi, g, fl.CCC)
        ru_r = ru - dt * ref_st.rho_col * so.dx_cf(phi_pad)
        rv_r = rv - dt * ref_st.rho_col * so.dy_cf(phi_pad)
        rw_r = rw - dt * ref_st.rho_f_col * so.dz_cf(phi_pad)
        ru_r, rv_r, rw_r = fl.enforce_wall_normals(g, ru_r, rv_r, rw_r)
        gu, gv, gw = gradient_correct_pallas(
            g, phi, ru, rv, rw, ref_st.rho_col[:, 0, 0],
            ref_st.rho_f_col[: g.nz, 0, 0], dt, interpret=True)
        for a, b in ((gu, ru_r), (gv, rv_r), (gw, rw_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)

    def test_stretched_z_divergence(self):
        from breeze_tpu.pallas_kernels.projection import (divergence_pallas,
                                                          supported)
        z_faces = bz.piecewise_stretched_z(16, surface_layer_height=400.0,
                                           surface_layer_spacing=50.0,
                                           top=1600.0)
        g = bz.make_grid(size=(128, 16, len(z_faces) - 1),
                         x=(0.0, 12800.0), y=(0.0, 1600.0), z=z_faces,
                         topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                         halo=3, dtype=jnp.float32)
        assert supported(g)
        so = StencilOps(g)
        rng = np.random.default_rng(2)
        r = lambda: jnp.asarray(rng.normal(size=g.shape), jnp.float32)
        ru, rv, rw = r(), r(), r().at[0].set(0.0)
        ref = so.div_c(fl.pad(ru, g, fl.CCF), fl.pad(rv, g, fl.CFC),
                       fl.pad(rw, g, fl.FCC))
        got = divergence_pallas(g, ru, rv, rw, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-4)


class TestCompressibleSlowTendencyWiring:
    def test_pallas_wiring_matches_jnp(self):
        """The compressible slow_tendencies Pallas dispatch (true-ρ
        momentum + θ kernels) equals the jnp path — exercises the exact
        production wiring via BREEZE_TPU_PALLAS_INTERPRET."""
        import os
        from breeze_tpu.dynamics.compressible import (
            SplitExplicitTimeDiscretization, compressible_diagnose,
            compressible_initial_state, make_compressible_model,
            slow_tendencies)
        g = bz.make_grid(size=(128, 8, 16), extent=(12800.0, 800.0, 1600.0),
                         topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                         halo=3, dtype=jnp.float32)
        model = make_compressible_model(
            g, advection=adv.WENO(5), coriolis=bz.FPlane(1e-4),
            time_discretization=SplitExplicitTimeDiscretization(substeps=4))
        state = compressible_initial_state(
            model, theta=lambda x, y, z: 300.0 + 1.0 * jnp.exp(
                -((x - 6400.0) ** 2 / 1500.0 ** 2
                  + (z - 800.0) ** 2 / 300.0 ** 2)),
            u=lambda x, y, z: 3.0 + 0 * x, pressure_balanced=False)
        aux = compressible_diagnose(model, state)
        ref = slow_tendencies(model, state, aux)
        os.environ["BREEZE_TPU_PALLAS_INTERPRET"] = "1"
        try:
            got = slow_tendencies(model, state, aux)
        finally:
            del os.environ["BREEZE_TPU_PALLAS_INTERPRET"]
        for name in ("rho", "rho_u", "rho_v", "rho_w", "rho_theta"):
            a = np.asarray(getattr(got, name))
            b = np.asarray(getattr(ref, name))
            if name == "rho_w":
                a, b = a[1:], b[1:]      # wall row overwritten downstream
            scale = max(np.abs(b).max(), 1e-10)
            err = np.abs(a - b).max()
            # the θ tendency is a small residual of large canceling
            # fluxes (|ρuθ|/Δx ~ 10): allow f32 cancellation noise
            assert err / scale < 5e-4 or err < 1e-5, (
                f"{name}: rel {err / scale:.2e} abs {err:.2e}")

    def test_scalar_advance_wiring_matches_jnp(self):
        """_advance_scalars' Pallas dispatch equals the jnp path through a
        full moist acoustic step (BREEZE_TPU_PALLAS_INTERPRET)."""
        import os
        from breeze_tpu.dynamics.compressible import (
            SplitExplicitTimeDiscretization, acoustic_rk3_step,
            compressible_initial_state, make_compressible_model)
        from breeze_tpu.physics.microphysics import SaturationAdjustment
        g = bz.make_grid(size=(128, 8, 16), extent=(12800.0, 800.0, 1600.0),
                         topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                         halo=3, dtype=jnp.float32)
        model = make_compressible_model(
            g, advection=adv.WENO(5),
            microphysics=SaturationAdjustment(),
            time_discretization=SplitExplicitTimeDiscretization(substeps=4))
        state = compressible_initial_state(
            model, theta=lambda x, y, z: 300.0 + 1.0 * jnp.exp(
                -((x - 6400.0) ** 2 / 1500.0 ** 2
                  + (z - 800.0) ** 2 / 300.0 ** 2)),
            qt=lambda x, y, z: 0.008 * jnp.exp(-z / 2000.0),
            u=lambda x, y, z: 3.0 + 0 * x)
        ref = acoustic_rk3_step(model, state, 1.0)
        os.environ["BREEZE_TPU_PALLAS_INTERPRET"] = "1"
        try:
            got = acoustic_rk3_step(model, state, 1.0)
        finally:
            del os.environ["BREEZE_TPU_PALLAS_INTERPRET"]
        for name in ("rho", "rho_u", "rho_theta", "rho_qt"):
            a = np.asarray(getattr(got, name), np.float64)
            b = np.asarray(getattr(ref, name), np.float64)
            scale = max(np.abs(b).max(), 1e-10)
            err = np.abs(a - b).max()
            assert err / scale < 1e-4 or err < 1e-5, (
                f"{name}: rel {err / scale:.2e} abs {err:.2e}")


def test_pallas_disabled_inside_shard_map_context():
    """The plain kernels' whole-axis x rolls are wrong on a sharded axis;
    ``enabled()`` must force fallbacks inside shard_axes contexts.  The
    sharded kernel mode (``sharded_kernel_mode``) is the sanctioned path —
    x-prepad when x is mesh-sharded (1-D x or 2-D), hx=0 for y-only, and
    still off under the blanket disables."""
    import os
    from breeze_tpu.parallel.halo import shard_axes
    g = bz.make_grid(size=(128, 8, 16), extent=(12800.0, 800.0, 1600.0),
                     topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                     halo=3, dtype=jnp.float32)
    os.environ["BREEZE_TPU_PALLAS_INTERPRET"] = "1"
    try:
        assert padv.enabled()
        assert not padv.xpad_active()
        assert padv.sharded_kernel_mode(g) is None   # not in a context
        with shard_axes({2: "x"}):
            assert not padv.enabled()
            assert padv.xpad_active()
            assert padv.sharded_kernel_mode(g) == padv.HX
            with padv.disabled():
                assert not padv.xpad_active()
                assert padv.sharded_kernel_mode(g) is None
            os.environ["BREEZE_TPU_DISABLE_PALLAS_XPAD"] = "1"
            try:
                assert not padv.xpad_active()
                assert padv.sharded_kernel_mode(g) is None
            finally:
                del os.environ["BREEZE_TPU_DISABLE_PALLAS_XPAD"]
        with shard_axes({1: "y", 2: "x"}):
            # 2-D decomposition keeps the kernels (x-prepad + shard-aware
            # y pads) — round-4; was a jnp regression
            assert padv.xpad_active()
            assert padv.sharded_kernel_mode(g) == padv.HX
        with shard_axes({1: "y"}):
            # y-only decomposition: dense kernel body, shard-aware pads
            assert not padv.xpad_active()
            assert padv.sharded_kernel_mode(g) == 0
        assert padv.enabled()
    finally:
        del os.environ["BREEZE_TPU_PALLAS_INTERPRET"]


def test_weno_kernels_stretched_z():
    """Scalar + momentum fused kernels on a stretched vertical grid
    (BOMEX/RICO-style) match the jnp path in interpret mode."""
    from breeze_tpu.model import make_model
    z_faces = bz.piecewise_stretched_z(16, surface_layer_height=400.0,
                                       surface_layer_spacing=50.0,
                                       top=1600.0)
    g = bz.make_grid(size=(128, 8, len(z_faces) - 1),
                     x=(0.0, 12800.0), y=(0.0, 800.0), z=z_faces,
                     topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                     halo=3, dtype=jnp.float32)
    assert padv.supported(g, adv.WENO(5))
    from breeze_tpu.pallas_kernels import momentum as pmom
    assert pmom.supported(g, adv.WENO(5))
    so = StencilOps(g)
    rng = np.random.default_rng(4)
    r = lambda: jnp.asarray(rng.normal(size=g.shape), jnp.float32)
    c, u, v, w = r(), r(), r(), r().at[0].set(0.0)
    rho = 1.0 + 0.1 * jnp.abs(r())
    pz = lambda a, loc: padv.pad_zy(a, g, loc)
    got = padv.div_rho_u_c_pallas(g, pz(c, fl.CCC), pz(u, fl.CCF),
                                  pz(v, fl.CFC), pz(w, fl.FCC),
                                  pz(rho, fl.CCC), interpret=True)
    ref = -adv.div_rho_u_c(so, adv.WENO(5), fl.pad(rho, g, fl.CCC),
                           fl.pad(u, g, fl.CCF), fl.pad(v, g, fl.CFC),
                           fl.pad(w, g, fl.FCC), fl.pad(c, g, fl.CCC))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    ru, rv, rw = 1.1 * u, 1.1 * v, 1.1 * w
    a3 = pmom.momentum_div_pallas(g, pz(ru, fl.CCF), pz(rv, fl.CFC),
                                  pz(rw, fl.FCC), pz(u, fl.CCF),
                                  pz(v, fl.CFC), pz(w, fl.FCC),
                                  interpret=True)
    m3 = adv.momentum_flux_divergence(
        so, adv.WENO(5), fl.pad(ru, g, fl.CCF), fl.pad(rv, g, fl.CFC),
        fl.pad(rw, g, fl.FCC), fl.pad(u, g, fl.CCF), fl.pad(v, g, fl.CFC),
        fl.pad(w, g, fl.FCC))
    for n, (x1, x2) in enumerate(zip(a3, m3)):
        x1, x2 = np.asarray(x1), np.asarray(x2)
        if n == 2:
            x1, x2 = x1[1:], x2[1:]
        np.testing.assert_allclose(x1, x2, rtol=5e-4, atol=5e-4,
                                   err_msg=f"momentum[{n}]")


class TestFusedTendencyKernel:
    """The tendency mega-kernel (pallas_kernels/tendency.py) vs the jnp
    path through the exact production wiring (compute_tendencies)."""

    def _grid(self):
        return bz.make_grid(size=(128, 32, 16), extent=(12800.0, 3200.0, 1600.0),
                            topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                            halo=3, dtype=jnp.float32)

    def _state(self, model, moist=False, tracers=None):
        import jax
        g = model.grid
        theta = lambda x, y, z: 300.0 + 1.0 * jnp.exp(
            -((x - 6400.0) ** 2 / 1500.0 ** 2 + (z - 800.0) ** 2 / 300.0 ** 2))
        qt = (lambda x, y, z: 0.008 * jnp.exp(-z / 800.0)) if moist else None
        state = bz.initial_state(model, theta=theta, qt=qt,
                                 u=lambda x, y, z: 3.0 + 0.5 * jnp.sin(
                                     2 * jnp.pi * y / 3200.0),
                                 w=lambda x, y, z: 0.2 * jnp.sin(
                                     2 * jnp.pi * x / 12800.0) * jnp.sin(
                                     jnp.pi * z / 1600.0),
                                 tracers=tracers,
                                 enforce_mass_conservation=False)
        return state

    def _compare(self, model, state, rtol=5e-4):
        import os
        from breeze_tpu import model as M
        from breeze_tpu.pallas_kernels import tendency as ptend
        assert ptend.supported(model.grid, model.momentum_advection,
                               model.scalar_advection, model.coriolis)
        ref = M.compute_tendencies(model, state)
        os.environ["BREEZE_TPU_PALLAS_INTERPRET"] = "1"
        try:
            got = M.compute_tendencies(model, state)
        finally:
            del os.environ["BREEZE_TPU_PALLAS_INTERPRET"]
        names = ["rho_u", "rho_v", "rho_w", "rho_theta"]
        if state.rho_qt is not None:
            names.append("rho_qt")
        for name in names:
            a = np.asarray(getattr(got, name))
            b = np.asarray(getattr(ref, name))
            if name == "rho_w":
                a, b = a[1:], b[1:]      # wall row overwritten downstream
            scale = max(np.abs(b).max(), 1e-10)
            err = np.abs(a - b).max()
            assert err / scale < rtol or err < 1e-6, (
                f"{name}: rel {err / scale:.2e} abs {err:.2e}")
        for name in state.tracers:
            a = np.asarray(got.tracers[name])
            b = np.asarray(ref.tracers[name])
            scale = max(np.abs(b).max(), 1e-10)
            assert np.abs(a - b).max() / scale < rtol, name

    def test_dry_fplane(self):
        """Dry θˡⁱ path: in-kernel buoyancy + FPlane Coriolis."""
        model = bz.make_model(self._grid(), advection=adv.WENO(5),
                              potential_temperature=300.0,
                              coriolis=bz.FPlane(1e-4))
        self._compare(model, self._state(model))

    def test_dry_no_coriolis_with_tracer(self):
        model = bz.make_model(self._grid(), advection=adv.WENO(5),
                              potential_temperature=300.0)
        g = model.grid
        tr = {"c1": jnp.asarray(
            np.random.default_rng(3).normal(size=g.shape), jnp.float32)}
        self._compare(model, self._state(model, tracers=tr))

    def test_moist_saturation_adjustment(self):
        """Moist path: precomputed buoyancy window + shared mass fluxes
        across θ and qᵗ."""
        model = bz.make_model(
            self._grid(), advection=adv.WENO(5), potential_temperature=300.0,
            coriolis=bz.FPlane(1e-4),
            microphysics=bz.SaturationAdjustment(
                equilibrium=bz.WarmPhaseEquilibrium()))
        self._compare(model, self._state(model, moist=True))

    def test_bounds_preserving_scalars(self):
        """Bounds-preserving WENO clips scalar interface values in-kernel
        (momentum advection non-bounds, the usual pairing)."""
        model = bz.make_model(
            self._grid(),
            momentum_advection=adv.WENO(5),
            scalar_advection=adv.WENO(5, bounds_preserving=True),
            potential_temperature=300.0,
            microphysics=bz.SaturationAdjustment(
                equilibrium=bz.WarmPhaseEquilibrium()))
        self._compare(model, self._state(model, moist=True))

    def test_rest_state_fused(self):
        """20 fused-kernel steps from rest stay at rest (the anelastic
        rest-state contract through the mega-kernel path)."""
        import os
        from breeze_tpu.timesteppers import ssp_rk3_step
        model = bz.make_model(self._grid(), advection=adv.WENO(5),
                              potential_temperature=300.0)
        state = bz.initial_state(model)
        os.environ["BREEZE_TPU_PALLAS_INTERPRET"] = "1"
        try:
            for _ in range(20):
                state = ssp_rk3_step(model, state, 0.5)
        finally:
            del os.environ["BREEZE_TPU_PALLAS_INTERPRET"]
        assert float(jnp.abs(state.rho_u).max()) < 1e-8
        assert float(jnp.abs(state.rho_w).max()) < 1e-8
        theta = state.rho_theta / model.reference.rho_col
        assert float(jnp.abs(theta - 300.0).max()) < 1e-4


class TestClosureKernel:
    """Fused Smagorinsky-Lilly kernel vs physics.closures.closure_tendencies
    (interpret mode)."""

    def _setup(self, moist):
        from breeze_tpu.physics.closures import SmagorinskyLilly
        g = bz.make_grid(size=(128, 32, 16), extent=(12800.0, 3200.0, 1600.0),
                         topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                         halo=3, dtype=jnp.float32)
        micro = (bz.SaturationAdjustment(equilibrium=bz.WarmPhaseEquilibrium())
                 if moist else None)
        model = bz.make_model(g, advection=adv.WENO(5),
                              potential_temperature=300.0,
                              closure=SmagorinskyLilly(), microphysics=micro)
        import jax
        theta = lambda x, y, z: 300.0 + 1.0 * jnp.exp(
            -((x - 6400.0) ** 2 / 1500.0 ** 2 + (z - 800.0) ** 2 / 300.0 ** 2))
        state = bz.initial_state(
            model, theta=theta,
            qt=(lambda x, y, z: 0.012 * jnp.exp(-z / 800.0)) if moist else None,
            u=lambda x, y, z: 3.0 + 0.5 * jnp.sin(2 * jnp.pi * y / 3200.0)
            + 0.3 * jnp.sin(2 * jnp.pi * z / 1600.0),
            w=lambda x, y, z: 0.2 * jnp.sin(2 * jnp.pi * x / 12800.0)
            * jnp.sin(jnp.pi * z / 1600.0),
            enforce_mass_conservation=False)
        return g, model, state

    def _compare(self, moist):
        from breeze_tpu import model as M
        from breeze_tpu.pallas_kernels import closure as pclo
        from breeze_tpu.physics.closures import closure_tendencies
        g, model, state = self._setup(moist)
        assert pclo.supported(g, model.closure)
        aux = M.diagnose(model, state)
        so = model.stencil_ops()
        ref = closure_tendencies(model, so, aux,
                                 fl.pad(aux.u, g, fl.CCF),
                                 fl.pad(aux.v, g, fl.CFC),
                                 fl.pad(aux.w, g, fl.FCC))
        pz = lambda a, loc: padv.pad_zy(a, g, loc)
        thb_pad = None
        if moist:
            c = model.constants
            drv = c.Rv / c.Rd - 1.0
            th_b = aux.theta * (1.0 + drv * aux.q.vapor
                                - aux.q.liquid - aux.q.ice)
            thb_pad = pz(th_b, fl.CCC)
        got = pclo.closure_tendencies_pallas(
            model, pz(aux.u, fl.CCF), pz(aux.v, fl.CFC), pz(aux.w, fl.FCC),
            pz(aux.theta, fl.CCC),
            pz(aux.qt, fl.CCC) if moist else None, thb_pad, interpret=True)
        names = ["G_u", "G_v", "G_w", "G_theta"] + (["G_qt"] if moist else [])
        for k, name in enumerate(names):
            a = np.asarray(got[k])
            b = np.asarray(getattr(ref, name))
            if name == "G_w":
                a, b = a[1:], b[1:]
            scale = max(np.abs(b).max(), 1e-12)
            err = np.abs(a - b).max()
            assert err / scale < 2e-4, f"{name}: rel {err / scale:.2e}"

    def test_dry(self):
        self._compare(moist=False)

    def test_moist(self):
        self._compare(moist=True)

    def test_production_wiring(self):
        """compute_tendencies with the fused closure equals the jnp path."""
        import os
        from breeze_tpu import model as M
        g, model, state = self._setup(moist=True)
        ref = M.compute_tendencies(model, state)
        os.environ["BREEZE_TPU_PALLAS_INTERPRET"] = "1"
        try:
            got = M.compute_tendencies(model, state)
        finally:
            del os.environ["BREEZE_TPU_PALLAS_INTERPRET"]
        for name in ("rho_u", "rho_v", "rho_w", "rho_theta", "rho_qt"):
            a = np.asarray(getattr(got, name))
            b = np.asarray(getattr(ref, name))
            if name == "rho_w":
                a, b = a[1:], b[1:]
            scale = max(np.abs(b).max(), 1e-10)
            err = np.abs(a - b).max()
            assert err / scale < 5e-4, f"{name}: rel {err / scale:.2e}"

    def test_merged_equals_split(self):
        """The SGS stage fused into the mega-kernel epilogue is bitwise-equal
        to the separate closure kernel + jnp output add (same kernel code on
        the same windows, same f32 add operands)."""
        import os
        from breeze_tpu import model as M
        g, model, state = self._setup(moist=True)
        os.environ["BREEZE_TPU_PALLAS_INTERPRET"] = "1"
        try:
            merged = M.compute_tendencies(model, state)
            os.environ["BREEZE_TPU_SPLIT_PALLAS_CLOSURE"] = "1"
            try:
                split = M.compute_tendencies(model, state)
            finally:
                del os.environ["BREEZE_TPU_SPLIT_PALLAS_CLOSURE"]
        finally:
            del os.environ["BREEZE_TPU_PALLAS_INTERPRET"]
        for name in ("rho_u", "rho_v", "rho_w", "rho_theta", "rho_qt"):
            np.testing.assert_array_equal(
                np.asarray(getattr(merged, name)),
                np.asarray(getattr(split, name)), err_msg=name)


class TestFusedSubstep:
    """The fused SSP-RK3 substep epilogue (tendency mega-kernel
    ``substep`` mode) vs compute_tendencies + the explicit jnp blend."""

    def _grid(self):
        return bz.make_grid(size=(128, 32, 16),
                            extent=(12800.0, 3200.0, 1600.0),
                            topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                            halo=3, dtype=jnp.float32)

    def _state(self, model, moist=False):
        theta = lambda x, y, z: 300.0 + 1.0 * jnp.exp(
            -((x - 6400.0) ** 2 / 1500.0 ** 2 + (z - 800.0) ** 2 / 300.0 ** 2))
        qt = (lambda x, y, z: 0.008 * jnp.exp(-z / 800.0)) if moist else None
        return bz.initial_state(
            model, theta=theta, qt=qt,
            u=lambda x, y, z: 3.0 + 0.5 * jnp.sin(2 * jnp.pi * y / 3200.0),
            w=lambda x, y, z: 0.2 * jnp.sin(2 * jnp.pi * x / 12800.0)
            * jnp.sin(jnp.pi * z / 1600.0),
            enforce_mass_conservation=False)

    def _compare_stage(self, model, state, rtol=2e-6, alpha=0.25, dt=0.5):
        import os
        from breeze_tpu import model as M
        # distinct stage-0 state so the (1-alpha) branch is exercised
        state0 = state.replace(rho_u=state.rho_u + 0.1,
                               rho_theta=state.rho_theta * 1.001)
        ref = M.stage_update(model, state, state0, dt, alpha)
        os.environ["BREEZE_TPU_PALLAS_INTERPRET"] = "1"
        try:
            got = M.stage_update(model, state, state0, dt, alpha)
        finally:
            del os.environ["BREEZE_TPU_PALLAS_INTERPRET"]
        names = ["rho_u", "rho_v", "rho_w", "rho_theta"]
        if state.rho_qt is not None:
            names.append("rho_qt")
        for name in names:
            a = np.asarray(getattr(got, name))
            b = np.asarray(getattr(ref, name))
            if name == "rho_w":
                a, b = a[1:], b[1:]
            scale = max(np.abs(b).max(), 1e-10)
            err = np.abs(a - b).max()
            # the G term enters at O(dt*G) against O(1) state values, so
            # relative-to-state agreement is tight even where the kernel's
            # WENO arithmetic differs from jnp in the last ulps
            assert err / scale < rtol, f"{name}: rel {err / scale:.2e}"

    def test_dry_fplane_stage(self):
        model = bz.make_model(self._grid(), advection=adv.WENO(5),
                              potential_temperature=300.0,
                              coriolis=bz.FPlane(1e-4))
        self._compare_stage(model, self._state(model))

    def test_moist_closure_stage(self):
        from breeze_tpu.physics.closures import SmagorinskyLilly
        model = bz.make_model(self._grid(), advection=adv.WENO(5),
                              potential_temperature=300.0,
                              microphysics=bz.SaturationAdjustment(
                                  equilibrium=bz.WarmPhaseEquilibrium()),
                              closure=SmagorinskyLilly())
        self._compare_stage(model, self._state(model, moist=True), rtol=1e-5)

    def test_full_step_matches_jnp(self):
        """ssp_rk3_step with the fused substep == the jnp path end-to-end
        (projection included on both sides)."""
        import os
        from breeze_tpu.timesteppers import ssp_rk3_step
        model = bz.make_model(self._grid(), advection=adv.WENO(5),
                              potential_temperature=300.0,
                              coriolis=bz.FPlane(1e-4))
        state = self._state(model)
        ref = ssp_rk3_step(model, state, 0.5)
        os.environ["BREEZE_TPU_PALLAS_INTERPRET"] = "1"
        try:
            got = ssp_rk3_step(model, state, 0.5)
        finally:
            del os.environ["BREEZE_TPU_PALLAS_INTERPRET"]
        for name in ("rho_u", "rho_v", "rho_w", "rho_theta"):
            a = np.asarray(getattr(got, name))
            b = np.asarray(getattr(ref, name))
            scale = max(np.abs(b).max(), 1e-10)
            err = np.abs(a - b).max()
            # abs floor: rho_w is O(1e-4) here, so last-ulp kernel-vs-jnp
            # rounding amplified through the projection reads as large rel
            assert err / scale < 5e-5 or err < 1e-6, (
                f"{name}: rel {err / scale:.2e} abs {err:.2e}")

    def test_forcing_bc_config(self):
        """Extras path: surface fluxes + forcings collected as +alpha*dt*dG
        on top of the fused-substepped fields (BOMEX-style config)."""
        from breeze_tpu.physics.forcings import GeostrophicForcing
        from breeze_tpu.physics.surface import PrescribedSurfaceFluxes
        model = bz.make_model(
            self._grid(), advection=adv.WENO(5), potential_temperature=300.0,
            microphysics=bz.SaturationAdjustment(
                equilibrium=bz.WarmPhaseEquilibrium()),
            coriolis=bz.FPlane(1e-4),
            boundary_fluxes=PrescribedSurfaceFluxes(theta_flux=8e-3,
                                                    qt_flux=5.2e-5),
            forcings=(GeostrophicForcing(f=1e-4, u_g=-10.0),))
        self._compare_stage(model, self._state(model, moist=True), rtol=1e-5)


class TestColumnarFixNegative:
    """Single-VMEM-pass negative-moisture borrowing vs the jnp closed form."""

    def _case(self, nz, ny, nx, seed, stretch=False):
        from breeze_tpu.pallas_kernels import columnar as pcol
        from breeze_tpu.physics.microphysics import fix_negative_moisture
        rng = np.random.default_rng(seed)
        # mostly-positive field with scattered negatives (advection
        # undershoot pattern), plus a few columns driven entirely negative
        rq = rng.normal(2e-3, 3e-3, (nz, ny, nx)).astype(np.float32)
        rq[:, 0, :2] = -np.abs(rq[:, 0, :2]) - 1e-3
        rq = jnp.asarray(rq)
        if stretch:
            dz = jnp.asarray(
                20.0 * 1.04 ** np.arange(nz), jnp.float32).reshape(-1, 1, 1)
        else:
            dz = jnp.full((nz, 1, 1), 25.0, jnp.float32)
        ref = fix_negative_moisture(rq, dz)
        got = pcol.fix_negative_moisture_pallas(rq, dz, interpret=True)
        # atol: the kernel multiplies by 1/dz where the closed form
        # divides; near-zero entries differ by last-ulp rounding
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=1e-8)
        # conservation: column integral of m = rho_q*dz preserved exactly
        np.testing.assert_allclose(
            np.asarray(jnp.sum(got * dz, axis=0)),
            np.asarray(jnp.sum(rq * dz, axis=0)), rtol=1e-5, atol=1e-7)

    def test_uniform(self):
        self._case(8, 16, 128, 0)

    def test_stretched(self):
        self._case(12, 8, 128, 1, stretch=True)

    def test_none_dz(self):
        from breeze_tpu.pallas_kernels import columnar as pcol
        from breeze_tpu.physics.microphysics import fix_negative_moisture
        rng = np.random.default_rng(2)
        rq = jnp.asarray(rng.normal(1e-3, 2e-3, (8, 8, 128)).astype(np.float32))
        ref = fix_negative_moisture(rq, None)
        got = pcol.fix_negative_moisture_pallas(rq, None, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=1e-9)

    def test_wired_into_correction(self):
        """apply_negative_moisture_correction dispatches the kernel under
        BREEZE_TPU_PALLAS_INTERPRET and matches the jnp path."""
        import os
        from breeze_tpu.physics.microphysics import (
            apply_negative_moisture_correction)
        g = bz.make_grid(size=(128, 16, 8), extent=(1000.0, 500.0, 300.0),
                         topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                         halo=3, dtype=jnp.float32)
        model = bz.make_model(
            g, advection=adv.WENO(5), potential_temperature=300.0,
            microphysics=bz.SaturationAdjustment(
                equilibrium=bz.WarmPhaseEquilibrium()))
        rng = np.random.default_rng(3)
        state = bz.initial_state(
            model, theta=lambda x, y, z: jnp.full_like(x, 300.0),
            qt=lambda x, y, z: jnp.full_like(x, 1e-3))
        rq = rng.normal(1e-3, 2e-3, g.shape).astype(np.float32)
        state = state.replace(rho_qt=jnp.asarray(rq))
        ref = apply_negative_moisture_correction(model, state)
        os.environ["BREEZE_TPU_PALLAS_INTERPRET"] = "1"
        try:
            got = apply_negative_moisture_correction(model, state)
        finally:
            del os.environ["BREEZE_TPU_PALLAS_INTERPRET"]
        np.testing.assert_allclose(np.asarray(got.rho_qt),
                                   np.asarray(ref.rho_qt),
                                   rtol=2e-5, atol=1e-8)


class TestForcingColumns:
    """Column-linear forcings fused into the kernel epilogue vs the
    post-kernel extras pass vs the jnp path (BOMEX-class config)."""

    def test_all_four_forcings(self):
        import os
        from breeze_tpu.model import diagnose, stage_update
        from breeze_tpu.physics.forcings import (DrySubsidenceTendency,
                                                 GeostrophicForcing,
                                                 SubsidenceForcing,
                                                 UpperSponge)
        g = bz.make_grid(size=(128, 16, 16), extent=(6400.0, 800.0, 2000.0),
                         topology=(bz.PERIODIC, bz.PERIODIC, bz.BOUNDED),
                         halo=3, dtype=jnp.float32)
        model = bz.make_model(
            g, advection=adv.WENO(5), potential_temperature=300.0,
            microphysics=bz.SaturationAdjustment(
                equilibrium=bz.WarmPhaseEquilibrium()),
            coriolis=bz.FPlane(1e-4),
            forcings=(
                GeostrophicForcing(f=1e-4, u_g=lambda z: -10.0 + 1.8e-3 * z),
                SubsidenceForcing(w_profile=lambda z: -0.004 * z / 1500.0),
                DrySubsidenceTendency(tendency_profile=lambda z: -1.2e-8
                                      * jnp.ones_like(z)),
                UpperSponge(rate=0.05, bottom=1500.0, damp_scalars=True),
            ))
        rng = np.random.default_rng(7)
        state = bz.initial_state(
            model,
            theta=lambda x, y, z: 300.0 + 3e-3 * z,
            qt=lambda x, y, z: 12e-3 * jnp.exp(-z / 1200.0),
            u=lambda x, y, z: -8.0 + 0 * z)
        state = state.replace(rho_theta=state.rho_theta + jnp.asarray(
            rng.normal(0, 0.1, g.shape).astype(np.float32)))
        aux = diagnose(model, state)

        def run(env):
            saved = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                return stage_update(model, state, state, 2.0, 0.25, aux=aux)
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v

        base = {"BREEZE_TPU_PALLAS_INTERPRET": "1"}
        fused = run(base)
        extras = run({**base, "BREEZE_TPU_DISABLE_PALLAS_FCOL": "1"})
        jnp_ref = run({"BREEZE_TPU_DISABLE_PALLAS": "1"})
        for name in ("rho_u", "rho_v", "rho_w", "rho_theta", "rho_qt"):
            for tag, other in (("extras", extras), ("jnp", jnp_ref)):
                a = np.asarray(getattr(fused, name))
                b = np.asarray(getattr(other, name))
                scale = max(np.abs(b).max(), 1e-10)
                err = np.abs(a - b).max()
                assert err / scale < 5e-5 or err < 1e-6, (
                    f"{name} vs {tag}: rel {err / scale:.2e} abs {err:.2e}")
