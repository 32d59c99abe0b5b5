"""Storm-time plasmasphere dynamics (models/storm.py)."""

import numpy as np
import pytest

from raytrace_tpu.models import make_env, plasmasphere, storm


def _storm_kp():
    """A canonical 72 h storm: quiet Kp 2, main phase to Kp 7 at 24-30 h,
    recovery back to 2."""
    hours = np.arange(0.0, 72.1, 3.0)
    kp = np.full_like(hours, 2.0)
    kp[(hours >= 24.0) & (hours < 30.0)] = 7.0
    kp[(hours >= 30.0) & (hours < 36.0)] = 4.0
    return hours, kp


def test_kp_max_24h_window():
    hours, kp = _storm_kp()
    # before the storm: 2; just after main phase: 7; a full day after the
    # last Kp-7 sample: the 7 has left the window
    got = storm.kp_max_24h([12.0, 31.0, 55.0, 70.0], hours, kp)
    np.testing.assert_allclose(got, [2.0, 7.0, 4.0, 2.0])


def test_plasmapause_erodes_fast_refills_slow():
    hours, kp = _storm_kp()
    t = np.arange(0.0, 72.0, 1.0)
    lpp = storm.plasmapause_history(t, hours, kp)
    quiet = plasmasphere.lppi_from_kp(2.0)     # 4.68
    storm_eq = plasmasphere.lppi_from_kp(7.0)  # 2.38
    # starts at the quiet equilibrium
    assert lpp[0] == pytest.approx(quiet, abs=1e-6)
    # 6 h into the main phase (tau_erode = 3 h): most of the way in
    i30 = np.searchsorted(t, 30.0)
    assert lpp[i30] < storm_eq + 0.4
    # the Kp-7 interval holds the 24 h window until t = 51, so at t = 54
    # the plasmapause is still fully eroded...
    i54 = np.searchsorted(t, 54.0)
    assert lpp[i54] < quiet - 0.4
    # ...and recovery after release is real but slow: by t = 71 it has
    # climbed, yet is still far from quiet (days to refill)
    i71 = np.searchsorted(t, 71.0)
    assert lpp[i71] > lpp[i54] + 0.3
    assert lpp[i71] < quiet - 0.5
    # erosion rate beats refill rate by a wide margin
    erode_rate = (lpp[24] - lpp[27]) / 3.0
    refill_rate = (lpp[i71] - lpp[i71 - 3]) / 3.0
    assert erode_rate > 3.0 * abs(refill_rate)


def test_storm_sequence_builds_envs_at_dynamic_lpp():
    hours, kp = _storm_kp()
    epochs = [0.0, 30.0, 71.0]
    envs, lpp = storm.storm_sequence(epochs, hours, kp)
    assert len(envs) == 3
    for env, L in zip(envs, lpp):
        assert float(env.lppi) == pytest.approx(float(L), abs=1e-9)
        assert float(env.lppo) > float(env.lppi)
    # eroded epoch has the innermost plasmapause
    assert float(envs[1].lppi) < float(envs[0].lppi)
    assert float(envs[1].lppi) < float(envs[2].lppi)
    # env kwargs pass through (e.g. a duct riding the storm sequence)
    envs_d, _ = storm.storm_sequence(
        [0.0], hours, kp, duct_amp=0.5, duct_l0=3.0, duct_w=0.2
    )
    assert envs_d[0].duct_amp == 0.5


def test_storm_epoch_env_traces():
    """The eroded-epoch env drives an actual ray to a different landing
    than the quiet env (the plasmapause moved across the ray's path)."""
    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
    from raytrace_tpu.ops import rhs

    hours, kp = _storm_kp()
    envs, _ = storm.storm_sequence([0.0, 30.0], hours, kp, b0=3.0696381e-5)
    u0 = np.array([[(RE + 1.0e6) / RE, 1.0, 0.0, 0.0]])  # high-lat launch
    f = np.array([1000.0])

    def land(env):
        res = trace(
            lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, f,
            cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
            spec=StopSpec(r_floor=1.0, t_max=5e8 / RE), max_steps=8000,
        )
        return np.asarray(res.u[0])

    u_quiet, u_storm = land(envs[0]), land(envs[1])
    assert np.all(np.isfinite(u_quiet)) and np.all(np.isfinite(u_storm))
    assert abs(u_quiet[1] - u_storm[1]) > 1e-3
