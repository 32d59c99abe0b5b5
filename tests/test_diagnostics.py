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


def test_save_fn_colat_and_3d_frames():
    """The SavedValues channel exists for every frame (the reference only
    built it for the lat script; 3D was TODO at RayTrace_3D.jl:374-387)."""
    from raytrace_tpu.integrate.saving import save_fn_for
    from raytrace_tpu.models import make_env, make_env_raymain
    from raytrace_tpu.ops import dispersion

    env = make_env_raymain()
    res = trace(
        lambda u, ff: rhs.rhs_2d_colat(u, ff, env),
        jnp.array([[R0, np.pi / 4, 0.0, 0.0]]), jnp.array([5000.0]),
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE, lat_sign=-1.0,
                      lat_offset=np.pi / 2),
        max_steps=128, save_every=16, save_fn=save_fn_for("2d_colat", env),
    )
    e = np.asarray(res.traj["extras"])
    u = np.asarray(res.traj["u"])
    theta, chi = u[..., 1], u[..., 2]
    np.testing.assert_allclose(
        e[..., 2], np.arctan(2.0 / np.tan(theta)), rtol=1e-10
    )
    np.testing.assert_allclose(
        e[..., 3], np.pi / 2 + e[..., 2] + chi, rtol=1e-10
    )

    env3 = make_env()
    u0 = jnp.array([[R0, np.pi / 4, 0.0, 1.0, 1.0, 0.0, 0.0]])
    res3 = trace(
        lambda u, ff: rhs.rhs_3d(u, ff, env3),
        u0, jnp.array([1000.0]),
        cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE, lat_sign=-1.0,
                      lat_offset=np.pi / 2),
        group_idx=6, max_steps=128, save_every=16,
        save_fn=save_fn_for("3d", env3),
    )
    e3 = np.asarray(res3.traj["extras"])
    u3 = np.asarray(res3.traj["u"])
    assert np.all(np.isfinite(e3))
    # psi channel equals the vector geometry at the snapshot states
    psi_direct = np.asarray(
        jnp.vectorize(
            lambda r, th, ph, rr_, rt_, rp_: dispersion.psi_3d(
                r, th, ph, rr_, rt_, rp_, env3),
        )(u3[..., 0], u3[..., 1], u3[..., 2], u3[..., 3], u3[..., 4],
          u3[..., 5])
    )
    np.testing.assert_allclose(e3[..., 3], psi_direct, rtol=1e-10)


def test_save_fn_3d_tilted_and_igrf_fields():
    """The 3D diagnostics channel works for the non-dipole field models:
    |B| from the vector field + magnetic latitude (the dipole-only
    b_mag/geographic-latitude version raised for exactly the field models
    that make the 3D frame interesting)."""
    from raytrace_tpu.integrate.saving import save_fn_for
    from raytrace_tpu.models import make_env
    from raytrace_tpu.ops import dispersion

    for kw in (
        dict(b_model="tilted", b_tilt=0.2007, b_tilt_phi=1.0),
        dict(b_model="igrf"),
    ):
        env3 = make_env(**kw)
        rhs_fn = lambda u, ff: rhs.rhs_3d(u, ff, env3)  # noqa: E731
        u0 = jnp.array([[R0, np.pi / 4, 0.3, 1.0, 1.0, 0.0, 0.0]])
        res3 = trace(
            rhs_fn, u0, jnp.array([1000.0]),
            cfg=SolverConfig(rtol=1e-6, atol=1e-10, dt0=1e-4),
            spec=StopSpec(r_floor=1.0, t_max=5e8 / RE, lat_sign=-1.0,
                          lat_offset=np.pi / 2),
            group_idx=6, max_steps=96, save_every=16,
            save_fn=save_fn_for("3d", env3),
        )
        e3 = np.asarray(res3.traj["extras"])
        u3 = np.asarray(res3.traj["u"])
        assert np.all(np.isfinite(e3)), kw
        assert np.all(e3[..., 0] > 1.0), kw  # propagating whistler
        # psi channel equals the b_vec-aware vector geometry
        psi_direct = np.asarray(
            jnp.vectorize(
                lambda r, th, ph, a, b, c: dispersion.psi_3d(
                    r, th, ph, a, b, c, env3),
            )(u3[..., 0], u3[..., 1], u3[..., 2], u3[..., 3], u3[..., 4],
              u3[..., 5])
        )
        np.testing.assert_allclose(e3[..., 3], psi_direct, rtol=1e-10)
        # mu channel consistent with the traced 3D dispersion relation
        mu_direct = np.asarray(
            jnp.vectorize(
                lambda r, th, ph, a, b, c: dispersion.mu_3d(
                    r, th, ph, a, b, c, 1000.0, env3),
            )(u3[..., 0], u3[..., 1], u3[..., 2], u3[..., 3], u3[..., 4],
              u3[..., 5])
        )
        np.testing.assert_allclose(e3[..., 0], mu_direct, rtol=1e-8)


def test_trajectory_mode_sharded_matches_unsharded():
    """run() trajectory mode (save_every>0) shards over the mesh; output
    must match the unsharded trace bitwise-ish (round-1 weak item: it
    silently ran single-device)."""
    from raytrace_tpu.config import preset
    from raytrace_tpu.run import run

    cfg = preset(
        "lat_fan", max_steps=96, save_every=32, dtype="float64",
        lats=tuple(np.linspace(0.5, 1.0, 8)), chis=(0.0,), freqs=(1000.0,),
        t_max=5e8 / RE, save_diagnostics=True,
    )
    out = run(cfg)
    traj_u = np.asarray(out["result"].traj["u"])
    valid = np.asarray(out["valid"])

    import jax

    from raytrace_tpu.models import cast_env
    from raytrace_tpu.parallel import build_launch, make_ray_mesh, pad_batch

    env = cast_env(make_env_lat(), jnp.float64)
    u0, f = build_launch(cfg.launch(), np.float64)
    u0, f, _ = pad_batch(u0, f, make_ray_mesh())
    # same whole-program jit, no sharding annotation: the only difference
    # from run()'s tracer is the partitioning
    ref = jax.jit(
        lambda uu, ff: trace(
            lambda u, fff: rhs.rhs_2d_lat(u, fff, env),
            uu, ff, cfg=cfg.solver(), spec=cfg.stop(), max_steps=96,
            save_every=32,
        )
    )(jnp.asarray(u0), jnp.asarray(f))
    np.testing.assert_allclose(
        traj_u[:, valid], np.asarray(ref.traj["u"])[:, valid], rtol=1e-12
    )


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


def test_resample_trajectory_dense_output():
    """Cubic-Hermite resampling (the sol(t) dense-output interface):
    exact at snapshot points, O(h^4)-accurate between them (validated
    against a 4x-finer snapshot cadence), clamping outside the span."""
    import jax
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
    from raytrace_tpu.integrate.saving import resample_trajectory
    from raytrace_tpu.models import make_env_lat
    from raytrace_tpu.ops import rhs

    env = make_env_lat()
    rhs_fn = lambda u, ff: rhs.rhs_2d_lat(u, ff, env)
    u0 = np.array([[(RE + 1.0e6) / RE, np.pi / 4, 0.0, 0.0],
                   [(RE + 1.0e6) / RE, 0.6, 0.1, 0.0]])
    f = np.array([1000.0, 2000.0])
    kw = dict(
        cfg=SolverConfig(rtol=1e-7, atol=1e-12, dt0=1e-4),
        spec=StopSpec(r_floor=1.0, t_max=5e8 / RE), max_steps=4000,
    )
    coarse = trace(rhs_fn, u0, f, save_every=64, **kw)
    mid = trace(rhs_fn, u0, f, save_every=16, **kw)
    fine = trace(rhs_fn, u0, f, save_every=4, **kw)

    t_f = np.asarray(fine.traj["t"])
    u_f = np.asarray(fine.traj["u"])
    # query both interpolants at the fine run's snapshot times (identical
    # integration, so the fine snapshots are ground truth); the Hermite
    # error must drop steeply (~h^4) with the snapshot cadence
    for b in range(2):
        keep = np.nonzero(np.diff(t_f[:, b]) > 0)[0][8:300]
        tq = t_f[keep, b]
        errs = []
        for tr in (coarse, mid):
            got = resample_trajectory(rhs_fn, tr.traj, f,
                                      tq[None, :].repeat(2, 0), u0=u0)
            scale = np.maximum(np.abs(u_f[keep, b]), 1.0)
            errs.append(np.abs(got[b] - u_f[keep, b]) / scale)
        # O(h^4): a 4x cadence refinement cuts the median error ~256x
        # (measured 250-400x; the max is dominated by isolated sharp
        # reflection features, so the order is asserted at the median)
        med_c, med_m = np.median(errs[0]), np.median(errs[1])
        assert med_m < 1e-6, med_m
        assert med_c > 20.0 * med_m

    # exactness at the coarse snapshots themselves
    t_c = np.asarray(coarse.traj["t"])
    u_c = np.asarray(coarse.traj["u"])
    for b in range(2):
        keep = np.nonzero(np.diff(t_c[:, b]) > 0)[0][:10] + 1
        got = resample_trajectory(
            rhs_fn, coarse.traj, f, t_c[keep, b][None, :].repeat(2, 0)
        )
        np.testing.assert_allclose(got[b], u_c[keep, b], rtol=1e-10,
                                   atol=1e-12)

    # clamping far past the span returns the last recorded state per ray
    got = resample_trajectory(rhs_fn, coarse.traj, f, np.array([1e9]))
    for b in range(2):
        tb = t_c[:, b]
        last = int(np.searchsorted(np.diff(tb) <= 0, True)) + 1
        np.testing.assert_allclose(got[b, 0], u_c[min(last - 1,
                                                      len(tb) - 1), b])
