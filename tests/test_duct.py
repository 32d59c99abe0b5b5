"""Field-aligned density ducts (models/plasmasphere.py::duct_factor).

The classic whistler duct (Smith 1961; Helliwell 1965) -- the guided-
propagation medium the reference's planned frequency ensembles point at
(RayMain.jl:32-52). Covers: the profile itself, its composition into the
medium, float64 native-oracle parity, and an end-to-end trace showing the
duct actually steers rays.
"""

import numpy as np
import pytest

from raytrace_tpu.constants import RE
from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
from raytrace_tpu.models import make_env, medium, plasmasphere
from raytrace_tpu.ops import dispersion, rhs

R0 = (RE + 1.0e6) / RE


def test_duct_factor_profile():
    L = np.linspace(2.0, 4.0, 401)
    g = np.asarray(plasmasphere.duct_factor(L, 0.5, 3.0, 0.2))
    assert g.max() == pytest.approx(1.5, rel=1e-12)
    assert L[g.argmax()] == pytest.approx(3.0, abs=1e-6)
    # symmetric, unit far from the duct
    assert g[0] == pytest.approx(1.0, abs=1e-5)
    assert g[-1] == pytest.approx(1.0, abs=1e-5)
    trough = np.asarray(plasmasphere.duct_factor(L, -0.3, 3.0, 0.2))
    assert trough.min() == pytest.approx(0.7, rel=1e-12)


def test_duct_composes_into_medium():
    """ne(with duct) - ne(without) equals amp * gaussian * plasmasphere
    part, at the duct center on the equator."""
    amp, l0, w = 0.6, 2.8, 0.15
    env_d = make_env(duct_amp=amp, duct_l0=l0, duct_w=w)
    env_0 = make_env()
    env_iono = make_env(plasmasphere_on=False)
    r, lat = l0, 0.0  # equator: L == r
    ne_d = float(medium.ne_total_m3(r, lat, env_d))
    ne_0 = float(medium.ne_total_m3(r, lat, env_0))
    ne_i = float(medium.ne_total_m3(r, lat, env_iono))
    assert ne_d - ne_0 == pytest.approx(amp * (ne_0 - ne_i), rel=1e-10)


def test_duct_mu_peak_on_equator():
    """A crest duct raises mu (whistler branch) with a maximum at the duct
    center -- the refraction structure that traps rays."""
    amp, l0, w = 0.5, 2.8, 0.15
    env_d = make_env(duct_amp=amp, duct_l0=l0, duct_w=w)
    env_0 = make_env()
    rs = np.linspace(l0 - 3 * w, l0 + 3 * w, 61)
    ratio = np.array([
        float(dispersion.mu_2d_lat(r, 0.0, 0.0, 2000.0, env_d))
        / float(dispersion.mu_2d_lat(r, 0.0, 0.0, 2000.0, env_0))
        for r in rs
    ])
    assert rs[ratio.argmax()] == pytest.approx(l0, abs=w / 4)
    assert ratio.max() > 1.1
    assert ratio[0] == pytest.approx(1.0, abs=1e-2)
    assert ratio[-1] == pytest.approx(1.0, abs=1e-2)


def test_duct_native_oracle_parity():
    from raytrace_tpu import native

    try:
        native.ensure_built()
    except Exception:
        pytest.skip("native oracle unavailable")
    env = make_env(b0=3.0696381e-5, duct_amp=0.4, duct_l0=3.0, duct_w=0.2)
    rng = np.random.default_rng(7)
    r = rng.uniform(1.5, 4.5, 50)
    lat = rng.uniform(-1.0, 1.0, 50)
    chi = rng.uniform(-1.5, 1.5, 50)
    f = rng.uniform(800.0, 8000.0, 50)
    got = native.mu_2d_lat_batch(r, lat, chi, f, env)
    want = np.array([
        float(dispersion.mu_2d_lat(*args, env))
        for args in zip(r, lat, chi, f)
    ])
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_duct_steers_the_ray():
    """End-to-end: the duct changes the landing state of a canonical ray
    (same ICs, duct on vs off), and the ducted run completes cleanly."""
    common = dict(kp_max=3.0)
    env_d = make_env(duct_amp=0.8, duct_l0=2.6, duct_w=0.25, **common)
    env_0 = make_env(**common)
    u0 = np.array([[R0, np.pi / 4, 0.0, 0.0]])
    f = np.array([5000.0])
    cfg = SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4)
    spec = StopSpec(r_floor=1.0, t_max=5.0e9 / RE)

    def run(env):
        res = trace(
            lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, f,
            cfg=cfg, spec=spec, max_steps=20000,
        )
        return np.asarray(res.u[0]), int(res.status[0])

    u_d, st_d = run(env_d)
    u_0, st_0 = run(env_0)
    assert st_d == st_0  # both terminate the same way (surface hit)
    assert np.all(np.isfinite(u_d))
    # the duct bends the path: landing latitude moves by a finite amount
    assert abs(u_d[1] - u_0[1]) > 1.0e-3
