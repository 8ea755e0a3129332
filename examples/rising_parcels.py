"""Rising adiabatic parcels: dry vs moist ascent (reference
examples/rising_parcels.jl).

Two 0-D parcels rise at 1 m/s through the reference atmosphere: the dry
parcel cools at the dry-adiabatic rate; the moist parcel condenses above
its lifting condensation level and cools more slowly (latent heating
through the θˡⁱ-invariant saturation adjustment).

Run:  python examples/rising_parcels.py [--quick]
"""

import argparse

import numpy as np

import breeze_tpu as bz
from breeze_tpu.parcel import ParcelDynamics


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    n_steps = 1000 if args.quick else 1800   # up to 30 min at 1 m/s
    pd = ParcelDynamics(vertical_velocity=1.0)

    dry0 = pd.initial_state(z=0.0, w=1.0, theta=300.0, qt=0.0)
    moist0 = pd.initial_state(z=0.0, w=1.0, theta=300.0, qt=0.015)

    dry_f, dry_traj = pd.integrate(dry0, dt=1.0, n_steps=n_steps)
    moist_f, moist_traj = pd.integrate(moist0, dt=1.0, n_steps=n_steps)

    zf = float(dry_f.z)
    print(f"parcels reached z = {zf:.0f} m")
    print(f"  dry   : T = {float(dry_f.T):6.1f} K   qˡ = 0")
    print(f"  moist : T = {float(moist_f.T):6.1f} K   "
          f"qˡ = {float(moist_f.ql)*1e3:.2f} g/kg")

    # dry parcel: dT/dz = -g/cp ≈ -9.8 K/km (from the trajectory itself —
    # T(0) = θ·Π(p₀) ≠ θ since p₀ > p_standard)
    Tz = np.asarray(dry_traj.T)
    zz = np.asarray(dry_traj.z)
    lapse_dry = (Tz[0] - Tz[-1]) / (zz[-1] - zz[0]) * 1000.0
    print(f"  dry lapse rate ≈ {lapse_dry:.1f} K/km (adiabatic 9.8)")
    assert 9.0 < lapse_dry < 10.5

    # moist parcel condenses and stays warmer
    ql = np.asarray(moist_traj.ql)
    z = np.asarray(moist_traj.z)
    lcl = float(z[(ql > 1e-6).argmax()])
    print(f"  moist LCL ≈ {lcl:.0f} m")
    assert float(moist_f.ql) > 1e-4
    assert float(moist_f.T) > float(dry_f.T)


if __name__ == "__main__":
    main()
