"""Tabulated plasmasphere surrogate (ops/tabulated.py): interpolation
accuracy vs the closed form, gradient-chain consistency, and the RHS hook."""

import jax
import jax.numpy as jnp
import numpy as np

from raytrace_tpu.constants import RE
from raytrace_tpu.integrate import SolverConfig, StopSpec, events, trace
from raytrace_tpu.models import make_env, make_env_lat, medium
from raytrace_tpu.ops import fused, rhs
from raytrace_tpu.ops.tabulated import (
    NeTable, build_ne_table, interp_error_bound, ne_and_grads_tab,
)

R0 = (RE + 1.0e6) / RE


def test_interp_error_bound_below_tolerance():
    """Sup-norm relative density error of the default table vs the closed
    form sits far below the production rtol (1e-5): the smooth branches
    interpolate at ~1e-10 and the C0 kinks ride the exact select."""
    env = make_env_lat()
    tab = build_ne_table(env)
    err = interp_error_bound(tab, env)
    assert err < 1.0e-8, err


def test_tabulated_ne_and_grads_match_closed_form():
    """Value AND hand-chained gradients of the tabulated medium match the
    closed-form _ne_and_grads to the interpolation error."""
    env = make_env_lat()
    tab = build_ne_table(env)
    rng = np.random.default_rng(5)
    r = rng.uniform(1.05, 5.5, 256)
    lat = rng.uniform(-1.1, 1.1, 256)
    ne_c, ner_c, nel_c = jax.vmap(
        lambda a, b: fused._ne_and_grads(a, b, env))(jnp.asarray(r),
                                                     jnp.asarray(lat))
    ne_t, ner_t, nel_t = jax.vmap(
        lambda a, b: ne_and_grads_tab(a, b, env, tab))(jnp.asarray(r),
                                                       jnp.asarray(lat))
    np.testing.assert_allclose(ne_t, ne_c, rtol=5e-7)
    # gradients: relative to the density scale over the local length scale
    sc_r = np.abs(ner_c) + np.asarray(ne_c)
    sc_l = np.abs(nel_c) + np.asarray(ne_c)
    assert float(jnp.max(jnp.abs(ner_t - ner_c) / sc_r)) < 5e-6
    assert float(jnp.max(jnp.abs(nel_t - nel_c) / sc_l)) < 5e-6


def test_tabulated_grads_are_exact_for_interpolant():
    """The hand chain is the EXACT derivative of the interpolated medium:
    autodiff of ne_and_grads_tab's value output reproduces its gradient
    outputs to roundoff (the fused-vs-autodiff identity, table edition)."""
    env = make_env_lat()
    tab = build_ne_table(env, n=512)  # coarse: interpolant != closed form
    val = lambda a, b: ne_and_grads_tab(a, b, env, tab)[0]
    g = jax.grad(val, argnums=(0, 1))
    for (r, lat) in [(2.3, 0.4), (4.4, -0.8), (1.2, 0.05)]:
        ne, ner, nel = ne_and_grads_tab(r, lat, env, tab)
        ar, al = g(r, lat)
        np.testing.assert_allclose(float(ner), float(ar), rtol=1e-9)
        np.testing.assert_allclose(float(nel), float(al), rtol=1e-9)


def test_tabulated_trace_matches_closed_form_landing():
    """End-to-end: the canonical 2D ray traced on the tabulated medium
    lands with the closed-form ray (well inside tolerance noise)."""
    env = make_env_lat()
    tab = build_ne_table(env)
    u0 = jnp.asarray([[R0, np.pi / 4, 0.0, 0.0]])
    f = jnp.asarray([1000.0])
    kw = dict(cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4),
              spec=StopSpec(r_floor=1.0, t_max=5e9 / RE), max_steps=40000)
    a = trace(lambda u, ff: rhs.rhs_2d_lat(u, ff, env), u0, f, **kw)
    b = trace(lambda u, ff: rhs.rhs_2d_lat(u, ff, env, ne_fn=(
        lambda rr, ll, ee: ne_and_grads_tab(rr, ll, ee, tab))), u0, f, **kw)
    assert int(a.status[0]) == int(b.status[0]) == events.HIT_EARTH
    np.testing.assert_allclose(float(b.u[0][1]), float(a.u[0][1]), atol=2e-5)
    np.testing.assert_allclose(float(b.u[0][3]), float(a.u[0][3]), rtol=2e-5)


def test_tabulated_refusals():
    import pytest

    env_g = make_env(ps_model="gcpm")
    with pytest.raises(ValueError, match="GCPM"):
        build_ne_table(env_g)
    env_m = make_env(ps_mlt=True)
    with pytest.raises(ValueError, match="MLT"):
        build_ne_table(env_m)
