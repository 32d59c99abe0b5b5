"""Diagnostics trace, visualization, run-record tests (SURVEY.md 5.5/5.6)."""

import json

import jax.numpy as jnp
import numpy as np

from raytrace_tpu.constants import RE
from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
from raytrace_tpu.integrate.saving import make_save_fn_2d_lat, trajectory_xy
from raytrace_tpu.models import make_env_lat
from raytrace_tpu.ops import rhs
from raytrace_tpu.utils import write_run_record
from raytrace_tpu.viz import (
    plot_density_profile,
    plot_diagnostics,
    plot_environment,
    plot_ray_paths,
    plot_refractive_surface,
)

R0 = (RE + 1.0e6) / RE


def _short_trace(env, save_fn=None):
    return trace(
        lambda u, ff: rhs.rhs_2d_lat(u, ff, env),
        jnp.array([[R0, np.pi / 4, 0.0, 0.0]]), jnp.array([1000.0]),
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE),
        max_steps=256, save_every=16, save_fn=save_fn,
    )


def test_save_fn_matches_reference_savedvalues():
    """Snapshot extras carry (mu, dmudpsi, dip, psi) like the reference's
    SavedValues (RayTrace_lat.jl:318-327), with dip/psi consistent."""
    env = make_env_lat()
    res = _short_trace(env, save_fn=make_save_fn_2d_lat(env))
    e = np.asarray(res.traj["extras"])  # (S, B, 4)
    assert e.shape[-1] == 4
    u = np.asarray(res.traj["u"])
    lat, chi = u[..., 1], u[..., 2]
    np.testing.assert_allclose(
        e[..., 2], np.arctan(2 * np.tan(lat)), rtol=1e-10
    )
    np.testing.assert_allclose(
        e[..., 3], np.pi / 2 + e[..., 2] + chi, rtol=1e-10
    )
    assert np.all(e[..., 0] > 1.0)  # mu of a propagating whistler


def test_trajectory_xy_frames():
    u = np.array([[2.0, 0.5, 0.0, 0.0]])
    x, y = trajectory_xy(jnp.asarray(u), "2d_lat")
    assert float(x[0]) == np.float64(2.0 * np.cos(0.5))
    x2, y2 = trajectory_xy(jnp.asarray(u), "2d_colat")
    assert float(x2[0]) == np.float64(2.0 * np.sin(0.5))


def test_plots_render(tmp_path):
    env = make_env_lat()
    res = _short_trace(env, save_fn=make_save_fn_2d_lat(env))
    p1 = tmp_path / "rays.png"
    plot_ray_paths(res.traj["u"], path=str(p1))
    p2 = tmp_path / "diag.png"
    plot_diagnostics(
        np.asarray(res.traj["t"])[:, 0],
        np.asarray(res.traj["extras"])[:, 0, :],
        path=str(p2),
    )
    p3 = tmp_path / "surface.png"
    plot_refractive_surface(2.0, 0.24, 5000.0, env, path=str(p3), n_psi=500)
    p4 = tmp_path / "envmap.png"
    plot_environment(env, path=str(p4), n=80)
    p5 = tmp_path / "profile.png"
    plot_density_profile(env, path=str(p5))
    for p in (p1, p2, p3, p4, p5):
        assert p.exists() and p.stat().st_size > 5000


def test_run_record(tmp_path):
    env = make_env_lat()
    cfg = SolverConfig()
    spec = StopSpec(r_floor=1.0, t_max=5e8 / RE)
    res = _short_trace(env)
    path = tmp_path / "run.json"
    rec = write_run_record(str(path), env=env, cfg=cfg, spec=spec,
                           result=res, extra={"note": "test"})
    loaded = json.loads(path.read_text())
    assert loaded["env"]["lppi"] == 4.22
    assert loaded["solver"]["rtol"] == 1e-7
    assert loaded["result"]["n_rays"] == 1
    assert loaded["extra"]["note"] == "test"
    assert rec["backend"] == "cpu"


def test_stream_trajectory_matches_single_shot():
    """Chunked host-offloaded trajectory == one-shot trajectory (exact
    resume from the carry), with device memory bounded per chunk."""
    from raytrace_tpu.integrate.saving import stream_trajectory
    from raytrace_tpu.integrate import SolverConfig, StopSpec

    env = make_env_lat()
    u0 = jnp.array([[R0, np.pi / 4, 0.0, 0.0]])
    f = jnp.array([1000.0])
    cfg = SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4)
    spec = StopSpec(r_floor=1.0, t_max=5e8 / RE)
    from raytrace_tpu.ops import rhs as rhs_mod

    rhs_fn = lambda u, ff: rhs_mod.rhs_2d_lat(u, ff, env)
    one = trace(rhs_fn, u0, f, cfg=cfg, spec=spec, max_steps=512,
                save_every=16)
    res, traj = stream_trajectory(
        rhs_fn, u0, f, cfg=cfg, spec=spec, chunk_steps=128, n_chunks=4,
        save_every=16,
    )
    np.testing.assert_allclose(
        traj["u"], np.asarray(one.traj["u"]), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(res.u), np.asarray(one.u), rtol=1e-12
    )
