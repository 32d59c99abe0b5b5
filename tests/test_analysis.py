"""Whistler dispersion analysis (analysis.py) against traced physics.

The Eckersley check is a genuine end-to-end physics validation: the
traced group delays of a low-band frequency sweep through the full
medium must follow T ~ D0/sqrt(f) to within a few percent -- an
emergent property of the dispersion relation + ray equations +
integrator, not anything the code asserts directly.
"""

import numpy as np
import pytest

from raytrace_tpu import analysis
from raytrace_tpu.constants import RE
from raytrace_tpu.integrate import SolverConfig, StopSpec, events, trace
from raytrace_tpu.models import make_env_lat
from raytrace_tpu.ops import rhs

R0 = (RE + 1.0e6) / RE


def test_dispersion_measure_and_fit_roundtrip():
    f = np.geomspace(1000.0, 8000.0, 12)
    d_true = 40.0
    T = d_true / np.sqrt(f)
    out = analysis.fit_eckersley(T, f)
    assert out["d0"] == pytest.approx(d_true, rel=1e-12)
    assert out["rms_rel"] < 1e-12
    assert out["n_used"] == 12
    np.testing.assert_allclose(
        analysis.dispersion_measure(T, f), d_true, rtol=1e-12
    )


def test_fit_filters_non_hits():
    f = np.array([1000.0, 2000.0, 3000.0])
    T = np.array([1.0, 0.7, np.nan])
    st = np.array([1, 0, 1])
    out = analysis.fit_eckersley(T, f, status=st)
    assert out["n_used"] == 1
    assert out["d0"] == pytest.approx(1.0 * np.sqrt(1000.0))


def test_traced_sweep_obeys_eckersley():
    """Low-band sweep along one launch: T sqrt(f) constant to a few %."""
    env = make_env_lat()
    freqs = np.geomspace(1000.0, 4000.0, 8)
    n = freqs.size
    u0 = np.zeros((n, 4))
    u0[:, 0] = R0
    u0[:, 1] = np.pi / 4
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, freqs,
        cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5.0e9 / RE), max_steps=20000,
    )
    st = np.asarray(res.status)
    T = np.asarray(res.u)[:, 3]
    assert (st == 1).sum() >= 6  # the band lands
    out = analysis.fit_eckersley(T, freqs, status=st)
    assert out["rms_rel"] < 0.08, out
    # D0 in the plausible mid-latitude range (tens of s Hz^1/2)
    assert 10.0 < out["d0"] < 200.0

    fh, Th = analysis.hop_delays(res, freqs, group_idx=3)
    assert fh.size == (st == 1).sum()
    assert np.all(Th > 0)


def test_resonance_energy_matches_dense_plasma_formula():
    """E_res from the exact cold dispersion reduces to the textbook
    E_B (fce/f)(1 - f/fce)^3 in the dense-plasma limit."""
    from raytrace_tpu.constants import FCE_E

    b, ne = 1.0e-6, 1.0e9  # fpe >> fce: dense
    fce = FCE_E * b
    f = np.array([0.1, 0.25, 0.45]) * fce
    got = analysis.cyclotron_resonance_energy_ev(f, b, ne)
    mu0 = 4.0e-7 * np.pi
    e_b_ev = b * b / (2.0 * mu0 * ne) / 1.602e-19
    want = e_b_ev * (fce / f) * (1.0 - f / fce) ** 3
    np.testing.assert_allclose(got, want, rtol=2e-2)
    # monotone: lower frequency resonates with harder electrons
    assert got[0] > got[1] > got[2]


def test_kp_threshold_limits():
    from raytrace_tpu.constants import FCE_E

    b = 1.0e-6
    fce = FCE_E * b
    a = analysis.kp_critical_anisotropy(np.array([0.1, 0.5, 0.9]) * fce, b)
    np.testing.assert_allclose(a, [1.0 / 9.0, 1.0, 9.0], rtol=1e-12)


def test_resonance_profile_along_canonical_ray():
    """E_res along the traced canonical ray dips at the |B| minimum of
    the path (the equator-most point), as it must."""
    env = make_env_lat()
    u0 = np.zeros((1, 4))
    u0[0, 0] = R0
    u0[0, 1] = np.pi / 4
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, np.array([2000.0]),
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE), max_steps=6000,
        save_every=32,
    )
    u_t = np.asarray(res.traj["u"])[:, 0]
    keep = np.diff(np.asarray(res.traj["t"])[:, 0], prepend=-1.0) > 0
    prof = analysis.resonance_profile_2d_lat(u_t[keep], 2000.0, env)
    e = prof["e_res_ev"]
    assert np.all(np.isfinite(e)) and np.all(e > 0)
    fce = prof["fce_hz"]
    # E_res dips near (not exactly at) the |B| minimum: ne shifts it a
    # little; require the dip to sit in the low-|B| part of the path
    fce_at_dip = fce[e.argmin()]
    assert fce_at_dip < fce.min() + 0.35 * (fce.max() - fce.min())
    assert np.all(prof["a_crit"] > 0)


def test_landing_footprint_conjugate_mapping():
    """Northern-hemisphere launches that reach the surface land in the
    conjugate (southern) hemisphere with L near the launch field line."""
    import jax.numpy as jnp

    from raytrace_tpu.analysis import landing_footprint
    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, events, trace
    from raytrace_tpu.models import make_env_lat
    from raytrace_tpu.ops import rhs

    env = make_env_lat()
    lats = np.linspace(0.6, 0.8, 3)
    u0 = np.zeros((3, 4))
    u0[:, 0] = (RE + 1.0e6) / RE
    u0[:, 1] = lats
    f = np.full(3, 1000.0)
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env),
        jnp.asarray(u0), jnp.asarray(f),
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e9 / RE), max_steps=8192,
    )
    fp = landing_footprint(u0, f, res)
    assert fp["launch_lat"].shape == (3,)
    assert fp["hit"].any()
    h = fp["hit"]
    # whistlers at these launch latitudes land near the equator at far
    # lower |latitude| than the launch (the canonical 45-deg ray lands
    # at +2.7 deg); r is event-refined to the surface exactly
    assert (np.abs(fp["landing_lat"][h]) < fp["launch_lat"][h]).all()
    assert np.allclose(fp["landing_l"][h] * np.cos(fp["landing_lat"][h]) ** 2,
                       1.0, atol=1e-6)
    assert (fp["group_delay_s"][h] > 0).all()
    # the conjugate flag is consistent with the latitude signs
    np.testing.assert_array_equal(
        fp["conjugate"][h],
        np.sign(fp["landing_lat"][h]) != np.sign(fp["launch_lat"][h]),
    )


def test_count_equator_crossings_one_hop_is_odd():
    """A surface-hitting one-hop whistler crosses the equator an odd
    number of times; a synthetic non-crossing path counts zero."""
    import jax.numpy as jnp

    from raytrace_tpu.analysis import count_equator_crossings
    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, events, trace
    from raytrace_tpu.models import make_env_lat
    from raytrace_tpu.ops import rhs

    env = make_env_lat()
    u0 = jnp.array([[(RE + 1.0e6) / RE, np.pi / 4, 0.0, 0.0]])
    f = jnp.array([1000.0])
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, f,
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e9 / RE),
        max_steps=8192, save_every=8,
    )
    assert int(res.status[0]) == events.HIT_EARTH
    n_cross = int(count_equator_crossings(res.traj["u"][:, 0, :]))
    # parity invariant: crossing count is odd iff the ray lands in the
    # conjugate hemisphere (the canonical ray reflects southward past
    # the equator and comes back -- 2 crossings, same-hemisphere landing
    # at +2.7 deg)
    assert n_cross >= 1
    same_hemisphere = float(res.u[0, 1]) > 0.0
    assert (n_cross % 2 == 0) == same_hemisphere
    # synthetic stay-north path: zero crossings
    fake = np.zeros((10, 4))
    fake[:, 1] = 0.5
    assert int(count_equator_crossings(fake)) == 0


def test_footprint_spreading():
    """Ray-tube spreading from a chi fan: finite, positive, normalized
    amplitude, non-hit pairs dropped, and the secant agrees with an
    independently recomputed adjacent-pair difference."""
    import jax.numpy as jnp

    env = make_env_lat()
    chis = np.linspace(-3e-3, 3e-3, 5)
    u0 = np.zeros((5, 4))
    u0[:, 0] = (RE + 1.0e6) / RE
    u0[:, 1] = np.pi / 4
    u0[:, 2] = chis
    f = np.full(5, 1000.0)
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env),
        jnp.asarray(u0), jnp.asarray(f),
        cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e9 / RE), max_steps=20000,
    )
    assert (np.asarray(res.status) == events.HIT_EARTH).all()
    fp = analysis.landing_footprint(u0, f, res)
    sp = analysis.footprint_spreading(fp, chis)
    assert sp["spreading"].shape == (4,)
    assert np.isfinite(sp["spreading"]).all() and (sp["spreading"] > 0).all()
    assert np.isclose(sp["rel_amplitude"].max(), 1.0)
    # secant consistency with a direct recomputation
    lat1 = fp["landing_lat"]
    direct = np.abs(np.diff(lat1)) / np.abs(np.diff(chis))
    np.testing.assert_allclose(sp["spreading"], direct, rtol=1e-12)
    # a non-hit member kills its two adjacent pairs
    fp2 = dict(fp)
    fp2["hit"] = fp["hit"].copy()
    fp2["hit"][2] = False
    sp2 = analysis.footprint_spreading(fp2, chis)
    assert sp2["spreading"].shape == (2,)


def test_relativistic_resonance_energy():
    """relativistic=True solves the exact v_perp=0 resonance
    w - k v = wce/gamma. Checks: (a) exact root -- the returned energy's
    velocity satisfies the UNSQUARED resonance equation to 1e-12;
    (b) converges to the nonrelativistic value at low energy (<1% at
    ~1 keV); (c) is strictly BELOW it, with the gap growing with energy
    (the standard outer-belt correction: the nonrel formula
    overestimates E_res as it approaches m_e c^2)."""
    from raytrace_tpu.constants import C_LIGHT, FCE_E, M_E, Q_E
    from raytrace_tpu.ops import dispersion

    bmag, ne = 3.12e-5 / 216.0, 1.0e7     # L=6 trough, 10/cc
    freqs = np.array([2000.0, 500.0, 100.0])
    e_nr = analysis.cyclotron_resonance_energy_ev(freqs, bmag, ne)
    e_r = analysis.cyclotron_resonance_energy_ev(
        freqs, bmag, ne, relativistic=True
    )
    # (a) exact resonance residual
    for f, e in zip(freqs, e_r):
        gamma_rel = 1.0 + e * Q_E / (M_E * C_LIGHT**2)
        x = np.sqrt(1.0 - 1.0 / gamma_rel**2)
        n = np.sqrt(float(dispersion.stix_rlp(ne, bmag, f)[0]))
        y = FCE_E * bmag / f
        # counter-streaming: v < 0 relative to k
        resid = (1.0 + n * x) - y / gamma_rel
        assert abs(resid) < 1e-10, (f, resid)
    # (b) low-energy agreement
    assert e_r[0] / e_nr[0] == pytest.approx(1.0, abs=0.01)
    # (c) strictly below, gap growing with energy
    ratio = e_r / e_nr
    assert np.all(ratio < 1.0)
    assert ratio[0] > ratio[1] > ratio[2]
