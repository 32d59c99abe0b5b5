"""Multi-ion composition (He+/O+ fractions; ops/dispersion.ion_species).

The reference is protons-only (n_p = n_e, RayMain.jl:154); the
composition extension must (a) reduce exactly to the reference algebra
at zero fractions, (b) produce the classic multi-ion structure (the L
resonance at each ion gyrofrequency that creates the He+-band EMIC
stop/pass structure), and (c) keep every gradient path exact.
"""

import numpy as np
import pytest

from raytrace_tpu.constants import FCE_HE, FCE_P, FPE2_E, FPE2_P, RE
from raytrace_tpu.models import make_env, make_env_lat
from raytrace_tpu.ops import dispersion, fused, gradients

R0 = (RE + 1.0e6) / RE


def test_zero_fractions_reduce_to_reference_algebra():
    ne, b, f = 1.0e9, 1.0e-6, 3000.0
    r, l, p = (float(x) for x in dispersion.stix_rlp(ne, b, f))
    # hand-written 2-species ratio form (the reference algebra)
    ncm = ne * 1e-6
    xe = FPE2_E * ncm / f**2
    xp = FPE2_P * ncm / f**2
    from raytrace_tpu.constants import FCE_E

    ye = FCE_E * b / f
    yp = FCE_P * b / f
    assert r == pytest.approx(1 - xe / (1 - ye) - xp / (1 + yp), rel=1e-14)
    assert l == pytest.approx(1 - xe / (1 + ye) - xp / (1 - yp), rel=1e-14)
    assert p == pytest.approx(1 - xe - xp, rel=1e-14)
    # and fractions=0 passed explicitly changes nothing
    r2, l2, p2 = (
        float(x) for x in dispersion.stix_rlp(ne, b, f, 0.0, 0.0)
    )
    assert (r2, l2, p2) == (r, l, p)


def test_helium_resonance_in_l():
    """L has a pole at the He+ gyrofrequency: the signature multi-ion
    structure (He+-band EMIC waves live just below it)."""
    ne, b = 1.0e9, 1.0e-6
    fc_he = FCE_HE * b
    f_lo = fc_he * 0.999
    f_hi = fc_he * 1.001
    f_far = fc_he * 2.0
    _, l_lo, _ = dispersion.stix_rlp(ne, b, f_lo, eta_he=0.1)
    _, l_hi, _ = dispersion.stix_rlp(ne, b, f_hi, eta_he=0.1)
    _, l_far, _ = dispersion.stix_rlp(ne, b, f_far, eta_he=0.1)
    # pole: opposite signs across fc_He, magnitudes diverging
    assert float(l_lo) * float(l_hi) < 0.0
    assert abs(float(l_lo)) > 50.0 * abs(float(l_far))
    # without He+ there is no structure at fc_He
    _, l0_lo, _ = dispersion.stix_rlp(ne, b, f_lo)
    _, l0_hi, _ = dispersion.stix_rlp(ne, b, f_hi)
    assert float(l0_lo) * float(l0_hi) > 0.0


@pytest.mark.parametrize("freq", [30.0, 400.0, 3000.0],
                         ids=["emic_band", "ion_whistler", "whistler"])
def test_fused_matches_autodiff_multiion(freq):
    env = make_env(eta_he=0.15, eta_o=0.05)
    rng = np.random.default_rng(31)
    for _ in range(40):
        r = float(rng.uniform(R0, 5.0))
        lat = float(rng.uniform(-1.0, 1.0))
        chi = float(rng.uniform(-1.5, 1.5))
        ad = gradients.mu_grads_2d_lat(r, lat, chi, freq, env,
                                       grad_mode=gradients.AUTODIFF)
        fz = fused.mu_and_grads_2d_lat(r, lat, chi, freq, env)
        for i, (a, b) in enumerate(zip(ad, fz)):
            assert float(b) == pytest.approx(float(a), rel=1e-8,
                                             abs=1e-12), (i, r, lat, freq)


def test_native_oracle_multiion_parity():
    from raytrace_tpu import native

    try:
        native.ensure_built()
    except Exception:
        pytest.skip("native oracle unavailable")
    env = make_env(b0=3.0696381e-5, eta_he=0.2, eta_o=0.1)
    rng = np.random.default_rng(5)
    r = rng.uniform(1.5, 4.5, 40)
    lat = rng.uniform(-1.0, 1.0, 40)
    chi = rng.uniform(-1.5, 1.5, 40)
    f = rng.uniform(20.0, 8000.0, 40)
    got = native.mu_2d_lat_batch(r, lat, chi, f, env)
    want = np.array([
        float(dispersion.mu_2d_lat(*args, env))
        for args in zip(r, lat, chi, f)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_make_env_validation_and_reference_guard():
    with pytest.raises(ValueError):
        make_env(eta_he=0.7, eta_o=0.4)   # fractions sum >= 1
    with pytest.raises(ValueError):
        make_env(eta_he=-0.1)
    env = make_env(eta_he=0.1)
    with pytest.raises(ValueError):
        gradients.mu_grads_2d_lat(2.0, 0.5, 0.0, 1000.0, env,
                                  grad_mode=gradients.REFERENCE)


def test_emic_trace_in_multiion_plasma():
    """He+-band EMIC ray (root = -1, f just below fc_He at the launch
    point) integrates cleanly through the multi-ion medium."""
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
    from raytrace_tpu.ops import rhs

    env = make_env(eta_he=0.1)
    # equatorial launch at L = 2: fc_He there ~ FCE_HE * b0/8
    b_eq = float(env.b0) / 8.0
    f_emic = 0.7 * FCE_HE * b_eq
    u0 = np.array([[2.0, 0.0, 0.1, 0.0]])
    du = np.asarray(
        rhs.rhs_2d_lat(u0[0], f_emic, env, root=-1.0)
    )
    assert np.all(np.isfinite(du))
    res = trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env, root=-1.0), u0,
        np.array([f_emic]),
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=50.0), max_steps=2000,
    )
    assert np.all(np.isfinite(np.asarray(res.u)))
    assert int(res.n_accept[0]) > 50
    assert float(res.t[0]) > 0.1  # made real phase-path progress
