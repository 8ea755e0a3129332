"""Kinematic driver + parcel model tests (reference test/kinematic_driver.jl,
test/parcel_dynamics.jl)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

import breeze_tpu as bz
from breeze_tpu.kinematic import PrescribedDynamics, kinematic_step
from breeze_tpu.model import initial_state, make_model
from breeze_tpu.parcel import ParcelDynamics
from breeze_tpu.physics.kessler import KesslerMicrophysics


class TestKinematicDriver:
    def test_prescribed_advection_translates_scalar(self):
        g = bz.make_grid(size=(32, 1, 8), extent=(3200.0, 1.0, 800.0),
                         topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                         dtype=jnp.float64)
        model = make_model(g, advection=bz.WENO(5), potential_temperature=300.0)
        dyn = PrescribedDynamics(u=10.0)

        state = initial_state(model, theta=lambda x, y, z: 300.0 + jnp.exp(
            -(x - 1600.0) ** 2 / 200.0 ** 2))
        theta0 = np.asarray(state.rho_theta / model.reference.rho_col)

        # advect for 1600 m / 10 m/s = 160 s → half-domain translation
        for _ in range(80):
            state = kinematic_step(model, dyn, state, 2.0)
        theta1 = np.asarray(state.rho_theta / model.reference.rho_col)

        peak0 = np.argmax(theta0[2, 0])
        peak1 = np.argmax(theta1[2, 0])
        shift = (peak1 - peak0) % 32
        assert abs(shift - 16) <= 1, f"expected ~16-cell shift, got {shift}"
        # WENO preserves extrema reasonably
        assert theta1.max() > 300.5

    def test_kinematic_with_kessler(self):
        g = bz.make_grid(size=(16, 1, 16), extent=(1600.0, 1.0, 3200.0),
                         topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                         dtype=jnp.float64)
        model = make_model(g, advection=bz.WENO(5), potential_temperature=300.0,
                          microphysics=KesslerMicrophysics())
        # updraft column carries moisture upward where it condenses
        dyn = PrescribedDynamics(
            w=lambda x, y, z, t: 2.0 * jnp.sin(jnp.pi * z / 3200.0)
            * jnp.sin(jnp.pi * x / 1600.0) ** 2)
        state = initial_state(model, qt=lambda x, y, z: 0.015 * jnp.exp(-z / 1500.0))
        for _ in range(20):
            state = kinematic_step(model, dyn, state, 10.0)
        assert bool(jnp.all(jnp.isfinite(state.rho_qt)))
        cloud = float(state.tracers["rho_qcl"].max() + state.tracers["rho_qr"].max())
        assert cloud > 1e-7, "updraft should form condensate"


class TestParcelModel:
    def test_dry_parcel_conserves_theta(self):
        pd = ParcelDynamics(vertical_velocity=2.0)
        s0 = pd.initial_state(theta=300.0, qt=0.0)
        final, traj = pd.integrate(s0, dt=1.0, n_steps=500)
        # parcel rose 1 km
        np.testing.assert_allclose(float(final.z), 1000.0, rtol=1e-5)
        # temperature follows the dry adiabat
        expected_T = float(s0.T) - 9.81 / 1005.0 * 1000.0
        np.testing.assert_allclose(float(final.T), expected_T, atol=0.2)

    def test_moist_parcel_condenses_at_lcl(self):
        pd = ParcelDynamics(vertical_velocity=2.0)
        s0 = pd.initial_state(theta=300.0, qt=0.012)
        final, traj = pd.integrate(s0, dt=1.0, n_steps=1200)
        ql_traj = np.asarray(traj.ql)
        assert ql_traj[-1] > 1e-4, "parcel should condense above the LCL"
        # LCL: first level with liquid, expect between 300 m and 1.8 km
        lcl_idx = np.argmax(ql_traj > 1e-6)
        lcl_z = float(np.asarray(traj.z)[lcl_idx])
        assert 300.0 < lcl_z < 1800.0, f"LCL at {lcl_z} m?"

    def test_prognostic_w_buoyant_parcel_accelerates(self):
        pd = ParcelDynamics(vertical_velocity="prognostic",
                            environment_theta=300.0)
        s0 = pd.initial_state(theta=302.0, qt=0.0, w=0.0)
        final, traj = pd.integrate(s0, dt=0.5, n_steps=100)
        assert float(final.w) > 0.5, "warm parcel should accelerate upward"
        assert float(final.z) > 10.0


class TestKinematicDivergenceAndDensity:
    """Reference kinematic_driver_time_stepping.jl:60-96 options:
    divergence correction + prognostic continuity density."""

    def _grid(self):
        return bz.make_grid(size=(32, 1, 16), extent=(3200.0, 1.0, 1600.0),
                            topology=(bz.PERIODIC, bz.FLAT, bz.BOUNDED),
                            dtype=jnp.float64)

    def test_divergence_correction_keeps_uniform_scalar_uniform(self):
        """Under a DIVERGENT prescribed flow a uniform scalar drifts in
        flux form but stays uniform with the +c∇·(ρU) correction."""
        from breeze_tpu.kinematic import PrescribedDynamics, kinematic_step
        from breeze_tpu.model import initial_state, make_model
        g = self._grid()
        model = make_model(g, advection=bz.Centered(2),
                           potential_temperature=300.0,
                           microphysics=bz.SaturationAdjustment())
        # divergent: u = sin(2πx/L) → ∂u/∂x ≠ 0
        dyn_nc = PrescribedDynamics(
            u=lambda x, y, z, t: 2.0 * jnp.sin(2 * jnp.pi * x / 3200.0))
        dyn_c = dataclasses.replace(dyn_nc, divergence_correction=True)
        state0 = initial_state(model, qt=jnp.full(g.shape, 0.004))
        s_nc, s_c = state0, state0
        for _ in range(10):
            s_nc = kinematic_step(model, dyn_nc, s_nc, 5.0)
            s_c = kinematic_step(model, dyn_c, s_c, 5.0)
        qt_nc = np.asarray(s_nc.rho_qt / model.reference.rho_col)
        qt_c = np.asarray(s_c.rho_qt / model.reference.rho_col)
        spread_nc = qt_nc.max() - qt_nc.min()
        spread_c = qt_c.max() - qt_c.min()
        assert spread_nc > 1e-5, "flux form must drift under divergence"
        assert spread_c < 1e-2 * spread_nc, (spread_c, spread_nc)

    def test_prognostic_density_continuity(self):
        """ρ evolves by continuity: total mass conserved; a convergent
        flow piles density up where ∇·U < 0."""
        from breeze_tpu.kinematic import PrescribedDynamics, kinematic_step
        from breeze_tpu.model import initial_state, make_model
        g = self._grid()
        model = make_model(g, advection=bz.Centered(2),
                           potential_temperature=300.0)
        dyn = PrescribedDynamics(
            u=lambda x, y, z, t: 1.0 * jnp.sin(2 * jnp.pi * x / 3200.0),
            prognostic_density=True)
        state = initial_state(model)
        m0 = None
        for _ in range(10):
            state = kinematic_step(model, dyn, state, 5.0)
            rho = state.diagnostics["kd_rho"]
            if m0 is None:
                m0 = float(jnp.sum(rho * g.dz_c_col))
        rho = np.asarray(state.diagnostics["kd_rho"])
        m1 = float(jnp.sum(state.diagnostics["kd_rho"] * g.dz_c_col))
        np.testing.assert_allclose(m1, m0, rtol=1e-12)
        # convergence zone at x = L/2 (du/dx < 0): density increases there
        rho_ref = np.asarray(jnp.broadcast_to(model.reference.rho_col,
                                              g.shape))
        d = rho - rho_ref
        assert d[:, 0, 16].mean() > 0.0 > d[:, 0, 0].mean()


class TestParcelMicrophysicsCoupling:
    """Round-5 VERDICT item 4 (reference parcel_dynamics.jl:245-283,
    578-584): the parcel materializes any scheme's prognostics and steps
    them with the GRID scheme's own rate functions; activation sees the
    PARCEL's vertical velocity."""

    def test_1m_warm_parcel_condenses_and_rains(self):
        from breeze_tpu.physics.one_moment import OneMomentMicrophysics
        sch = OneMomentMicrophysics(warm_phase=True)
        pd = ParcelDynamics(microphysics=sch, vertical_velocity=2.0)
        s0 = pd.initial_state(z=0.0, theta=299.0, qt=0.016)
        assert set(s0.micro) == {"qcl", "qr"}
        final, traj = pd.integrate(s0, 1.0, 900)
        qcl = np.asarray(traj.micro["qcl"])
        qr = np.asarray(traj.micro["qr"])
        assert qcl.max() > 1e-4, "parcel should condense above the LCL"
        assert qr[-1] > 1e-6, "autoconversion + accretion should form rain"
        # closed moisture budget every step: qv + categories == qt
        np.testing.assert_allclose(
            np.asarray(traj.qv) + qcl + qr, float(s0.qt), rtol=2e-6)

    def test_1m_parcel_step_matches_grid_rates(self):
        """One parcel step == forward-Euler with the grid scheme's
        _process_rates at the parcel's exact (qv, T, rho) — the coupling
        feeds the scheme the same state the grid update would."""
        from breeze_tpu.physics.one_moment import (OneMomentMicrophysics,
                                                   _process_rates)
        from breeze_tpu.thermo.constants import MoistureMassFractions
        from breeze_tpu.thermo.states import temperature_from_theta_li
        sch = OneMomentMicrophysics(warm_phase=True)
        pd = ParcelDynamics(microphysics=sch, vertical_velocity=2.0)
        s = pd.initial_state(z=0.0, theta=299.0, qt=0.016)
        for _ in range(600):
            s = pd.step(s, 1.0)
        assert float(s.micro["qcl"]) > 1e-5
        dt = 1.0
        s2 = pd.step(s, dt)
        c = pd.constants
        # replicate the coupling's inputs
        p_new = pd.environment_pressure(s.z + dt * 2.0)
        qcl, qr = s.micro["qcl"], s.micro["qr"]
        qv = jnp.maximum(s.qt - qcl - qr, 0.0)
        rho = p_new / (c.mixture_gas_constant(
            MoistureMassFractions(qv, qcl + qr, 0.0 * qv)) * s.T)
        T = temperature_from_theta_li(
            s.theta_li, MoistureMassFractions(qv, qcl + qr, 0.0 * qv),
            p_new, c, pd.p_standard)
        dqv, dqcl, dqci, dqr, dqs = _process_rates(
            sch, qv, qcl, 0.0 * qv, qr, 0.0 * qv, rho, T, c,
            c.gravitational_acceleration, min_timescale=dt)
        np.testing.assert_allclose(float(s2.micro["qcl"]),
                                   max(float(qcl + dt * dqcl), 0.0),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(s2.micro["qr"]),
                                   max(float(qr + dt * dqr), 0.0), rtol=1e-6)

    def test_2m_arg_activation_uses_parcel_w(self):
        """ARG2000 activation inside the parcel: droplet number appears
        once the parcel saturates, scales with the activated fraction of
        the aerosol reservoir, and depends on the parcel's w (faster
        updraft -> higher smax -> more activation) — reference
        parcel_dynamics.jl:578-584."""
        from breeze_tpu.physics.two_moment import (AerosolActivation,
                                                   AerosolMode,
                                                   TwoMomentMicrophysics)
        aa = AerosolActivation(modes=(AerosolMode(N=200.0e6),))
        sch = TwoMomentMicrophysics(activation=aa)

        def ncl_after(w):
            pd = ParcelDynamics(microphysics=sch, vertical_velocity=w)
            s0 = pd.initial_state(z=0.0, theta=299.0, qt=0.016)
            assert set(s0.micro) == {"qcl", "qr", "ncl", "nr"}
            n_steps = int(1200 / w)     # same final height
            final, _ = pd.integrate(s0, 1.0, n_steps)
            return float(final.micro["ncl"]), final

        ncl_slow, f_slow = ncl_after(1.0)
        ncl_fast, f_fast = ncl_after(4.0)
        assert ncl_slow > 0.0, "activation should have fired"
        # all activated droplet numbers bounded by the aerosol reservoir
        rho_approx = 1.0
        assert ncl_fast <= 200.0e6 / 0.9  # per-mass bound (rho ~ 0.9-1.2)
        assert ncl_fast > ncl_slow, (
            "stronger parcel updraft must activate more aerosol "
            f"({ncl_fast:.3e} !> {ncl_slow:.3e})")

    def test_2m_parcel_step_matches_grid_process_step(self):
        """One parcel 2M step == the grid's two_moment_process_step at the
        parcel's exact (theta, rho, p, w) — including the parcel w fed to
        activation."""
        from breeze_tpu.physics.two_moment import (AerosolActivation,
                                                   TwoMomentMicrophysics,
                                                   two_moment_process_step)
        from breeze_tpu.thermo.constants import MoistureMassFractions
        sch = TwoMomentMicrophysics(activation=AerosolActivation())
        pd = ParcelDynamics(microphysics=sch, vertical_velocity=1.5)
        s = pd.initial_state(z=0.0, theta=299.0, qt=0.016)
        for _ in range(700):
            s = pd.step(s, 1.0)
        assert float(s.micro["ncl"]) > 0.0
        dt = 1.0
        s2 = pd.step(s, dt)
        c = pd.constants
        p_new = pd.environment_pressure(s.z + dt * 1.5)
        mu = s.micro
        qv = jnp.maximum(s.qt - mu["qcl"] - mu["qr"], 0.0)
        rho = p_new / (c.mixture_gas_constant(MoistureMassFractions(
            qv, mu["qcl"] + mu["qr"], 0.0 * qv)) * s.T)
        qv1, qcl1, qr1, ncl1, nr1 = two_moment_process_step(
            sch, qv, mu["qcl"], mu["qr"], mu["ncl"], mu["nr"],
            s.theta_li, rho, p_new, jnp.float32(1.5), dt, c, pd.p_standard)
        np.testing.assert_allclose(float(s2.micro["qcl"]), float(qcl1),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(s2.micro["ncl"]), float(ncl1),
                                   rtol=1e-6)
        np.testing.assert_allclose(float(s2.micro["nr"]), float(nr1),
                                   rtol=1e-6)

    def test_1m_mixed_phase_parcel_grows_ice(self):
        """Mixed-phase 4-category parcel: a cold ascent deposits cloud
        ice through the scheme's deposition rate."""
        from breeze_tpu.physics.one_moment import OneMomentMicrophysics
        sch = OneMomentMicrophysics()
        pd = ParcelDynamics(microphysics=sch, vertical_velocity=3.0,
                            environment_theta=260.0)
        s0 = pd.initial_state(z=0.0, theta=260.0, qt=0.003)
        assert set(s0.micro) == {"qcl", "qci", "qr", "qs"}
        final, traj = pd.integrate(s0, 1.0, 800)
        assert float(np.asarray(traj.micro["qci"]).max()) > 1e-6, \
            "cold parcel should deposit cloud ice"
        budget = (np.asarray(traj.qv) + np.asarray(traj.micro["qcl"])
                  + np.asarray(traj.micro["qci"]) + np.asarray(traj.micro["qr"])
                  + np.asarray(traj.micro["qs"]))
        np.testing.assert_allclose(budget, float(s0.qt), rtol=2e-6)
