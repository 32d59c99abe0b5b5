"""High-level runner: RunConfig in, traced ensemble + artifacts out.

The user-facing replacement for executing the reference's script cells:
build the medium, build the launch grid, trace on whatever devices exist
(sharded over 'rays' if more than one), then persist final states,
optional trajectories, a JSON run record, and optional plots.
"""

import os

import numpy as np

from .config import RunConfig
from .integrate import events, trace
from .integrate.saving import save_fn_for
from .models import medium as medium_mod
from .ops import rhs as rhs_mod
from .parallel import (
    build_launch,
    ensemble_stats,
    make_ray_mesh,
    pad_batch,
)
from .parallel.ensemble import make_ensemble_tracer, make_rounds_tracer
from .utils import write_run_record


def _build_u0(config: RunConfig, dtype):
    """Launch states for the configured frame."""
    import itertools

    if config.frame in ("2d_lat", "2d_colat"):
        if tuple(config.phis) != (0.0,):
            raise ValueError("phis launch fan is 3D-only (the 2D state "
                             "carries no longitude)")
        if config.rays:
            from .parallel.ensemble import build_launch_list

            u0, f = build_launch_list(config.rays, r0=config.r0, dtype=dtype)
        else:
            u0, f = build_launch(config.launch(), dtype)
        if config.frame == "2d_colat":
            # launch grids are specified as latitudes in every frame;
            # state slot 1 of the colatitude frame is theta = pi/2 - lat
            u0[:, 1] = np.pi / 2 - u0[:, 1]
        return u0, f
    if config.rays:
        raise ValueError("explicit ray lists are 2D-only (the 3D state "
                         "needs rho0, which the grid builder supplies)")
    rows = []
    fs = []
    # chis fan the 3D frame too: each chi rotates the rho0 direction
    # within the launch meridional plane (positive chi tilts from r-hat
    # toward theta-hat, i.e. equatorward for a northern launch). chi = 0
    # keeps rho0 exactly, so the lats x freqs presets are unchanged; a
    # (lats x chis x freqs) grid is the 3D analogue of the 2D wave-
    # normal fan (the reference pins rho0 = (1,1,0), RayTrace_3D.jl:391).
    for lat, phi, chi, fr in itertools.product(
        config.lats, config.phis, config.chis, config.freqs
    ):
        c, s = np.cos(chi), np.sin(chi)
        pr, pt, pp = config.rho0
        rows.append(
            [config.r0, np.pi / 2 - lat, phi,
             c * pr - s * pt, s * pr + c * pt, pp, 0.0]
        )
        fs.append(fr)
    u0 = np.asarray(rows, dtype)
    f = np.asarray(fs, dtype)
    if config.rho_on_shell:
        # rho0 is a direction: solve |rho| = mu(psi) per ray so the
        # launch sits ON the dispersion surface. One vmapped call pinned
        # to the CPU backend -- a per-ray loop would dispatch every jnp
        # op through the TPU tunnel at 10-30 ms each, and the tunneled
        # chip's emulated float64 is not oracle-grade anyway.
        import jax
        import jax.numpy as jnp

        from .ops.dispersion import consistent_rho_3d

        env_host = config.medium.build()
        with jax.default_device(jax.devices("cpu")[0]):
            rho = jax.jit(jax.vmap(lambda th, ph, khat, fq: jnp.stack(
                consistent_rho_3d(config.r0, th, ph, tuple(khat), fq,
                                  env_host, config.root)
            )))(
                jnp.asarray(u0[:, 1]),
                jnp.asarray(u0[:, 2].astype(np.float64)),
                jnp.asarray(u0[:, 3:6].astype(np.float64)),
                jnp.asarray(f),
            )
            u0[:, 3:6] = np.asarray(rho, dtype)
    return u0, f


def run(config: RunConfig, out_dir=None, plots=False):
    """Execute a RunConfig. Returns dict(result, stats, valid, paths)."""
    # persist compiled programs across processes: the tunneled chip pays
    # 20-40 s per program compile (a cold ensemble CLI run ~345 s total);
    # the cache replays a 13.7 s compile in 0.27 s (utils/cache.py)
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    env = config.medium.build()
    dtype = np.float32 if config.dtype == "float32" else np.float64
    # pass the continuous medium scalars as traced device values (not
    # python-float constants): the compiled program is then independent of
    # the medium parameters, so one compile serves every env and re-runs
    # hit the compile cache. The STRUCTURAL fields (ps_weight, de_weight,
    # ps_smooth) stay python floats: they gate code paths at trace time,
    # and tracing ps_smooth=0.0 would send the smooth-blend path a zero
    # width (1/0 -> NaN gradients).
    env_host = env  # python-float copy: tracer-cache keys read THIS one
    # (float() on a tunneled device scalar is a ~30 ms round-trip; 18 of
    # them per call cost ~0.5 s before this split)
    env = medium_mod.cast_env(env, dtype)
    mesh = make_ray_mesh()
    u0, f = _build_u0(config, dtype)
    u0, f, valid = pad_batch(u0, f, mesh)

    cfg = config.solver()
    spec = config.stop()
    # "auto" is a rounds-tracer policy (per-ray DP5 <-> ros2x switching);
    # single-program paths integrate every ray with one method
    fixed_stepper = "dopri5" if config.stepper == "auto" else config.stepper
    common = dict(
        frame=config.frame, cfg=cfg, spec=spec, adaptive=config.adaptive,
        stepper=config.stepper, max_steps=config.max_steps,
        grad_mode=config.grad_mode, root=config.root,
    )
    # run() persists result columns, never the solver-internal carry, so
    # the rounds path can take the light final fetch. base_stepper only
    # exists on the rounds tracer (auto mode's non-stiff pool method).
    rounds_kw = dict(
        common, want_carry=False, base_stepper=config.base_stepper
    )
    if config.round_steps:
        rounds_kw["round_steps"] = tuple(config.round_steps)
    # tiny batches cannot re-bucket profitably (they are already at or
    # below the bucket floor) but still pay ~10-30 ms tunnel dispatch
    # PER ROUND; run them as one full-budget round (measured: the
    # single-ray raymain preset spends most of its 0.13-0.32 s wall on
    # round dispatches). Device-side wedge retirement (n_tiny counter)
    # still guards them; only the host-side round-granularity stall
    # check is forgone.
    if int(np.asarray(valid).sum()) <= 64:
        rounds_kw["round_steps"] = (config.max_steps,)

    if config.save_every > 0 and config.use_rounds:
        # PRODUCTION trajectory mode: the rounds tracer's snapshot
        # channel (per-round decimated blocks, host-assembled) -- device
        # memory bounded by one round's block instead of the full
        # max_steps history, so 10k-ray trajectory runs fit on chip
        # (VERDICT r3 #3; the reference records SavedValues on every
        # solve, RayTrace_lat.jl:318-330). Requires round lengths and
        # max_steps to be multiples of save_every.
        save_fn = (
            save_fn_for(config.frame, env) if config.save_diagnostics
            else None
        )
        tracer = _cached_tracer(
            config, env, env_host, mesh,
            dict(rounds_kw, save_every=config.save_every,
                 save_fn=save_fn),
            rounds=True,
        )
        result = tracer(u0, f, valid)
    elif config.save_every > 0:
        # single-program trajectory mode (use_rounds=False): scan tracer
        # (fixed shapes), sharded over the ray axis like the final-state
        # tracers; the whole snapshot history lives on device
        from .parallel.mesh import ray_sharding

        rhs_fn, group_idx = _rhs_for(config, env)
        save_fn = (
            save_fn_for(config.frame, env) if config.save_diagnostics
            else None
        )
        import jax

        sh = ray_sharding(mesh)
        traj_tracer = jax.jit(
            lambda uu, ff: trace(
                rhs_fn, uu, ff, cfg=cfg, spec=spec,
                group_idx=group_idx, adaptive=config.adaptive,
                stepper=fixed_stepper, max_steps=config.max_steps,
                save_every=config.save_every, save_fn=save_fn,
            ),
            in_shardings=(sh, sh),
        )
        result = traj_tracer(jnp.asarray(u0), jnp.asarray(f))
    elif config.use_rounds:
        if config.continue_until_done:
            # need the full carry back to chain continuations from it
            rounds_kw = dict(rounds_kw, want_carry=True)
        tracer = _cached_tracer(
            config, env, env_host, mesh, rounds_kw, rounds=True
        )
        result = tracer(u0, f, valid)
        if config.continue_until_done:
            import jax

            from .parallel.ensemble import _bucket_size

            rhs_fn, group_idx = _rhs_for(config, env)
            v = np.asarray(valid)
            u0_np, f_np = np.asarray(u0), np.asarray(f)
            for _ in range(config.max_continuations):
                st_full = np.asarray(result.status)
                idx = np.nonzero((st_full == events.MAX_STEPS) & v)[0]
                if len(idx) == 0:
                    break
                # gather the stragglers into a floor-sized bucket (the
                # rounds tracer's re-bucketing applied to continuations):
                # the continuation wall scales with the straggler count,
                # not the padded batch -- mr_fan's ~19 genuine stragglers
                # ride a 256-lane program instead of re-dispatching all
                # 2,048. trace(carry0=...) re-arms exactly the MAX_STEPS
                # rays and per-ray stepping is vmapped, so the gathered
                # resume takes the identical step sequence (statuses and
                # accept counts equal step for step; final u to the
                # event-refinement floor -- XLA fuses the Hermite
                # bisection differently per dispatch width).
                # test_mr.py::test_mr_fan_tail_resumes_from_rounds_carry
                # pins the carry semantics;
                # test_continue_until_done_bucketed_matches_full_width
                # pins the gather/scatter path against full-width resume.
                b = _bucket_size(len(idx), len(st_full), 256)
                sel = np.concatenate([idx, np.repeat(idx[:1], b - len(idx))])
                carry = jax.tree.map(
                    lambda a: jnp.asarray(np.asarray(a)[sel]), result.carry
                )
                # padding duplicates retire instantly: a terminal status
                # is not re-armed and masks the lane from step one
                pad = np.zeros(len(sel), bool)
                pad[len(idx):] = True
                carry = carry._replace(status=jnp.where(
                    jnp.asarray(pad), events.HIT_EARTH, carry.status
                ).astype(jnp.int32))
                sub = trace(
                    rhs_fn, jnp.asarray(u0_np[sel]), jnp.asarray(f_np[sel]),
                    cfg=cfg, spec=spec, group_idx=group_idx,
                    adaptive=config.adaptive, stepper=fixed_stepper,
                    max_steps=config.max_steps, carry0=carry,
                )

                def scatter(full, part, idx=idx):
                    out = np.asarray(full).copy()
                    out[idx] = np.asarray(part)[: len(idx)]
                    return out

                result = result._replace(
                    u=scatter(result.u, sub.u),
                    t=scatter(result.t, sub.t),
                    status=scatter(result.status, sub.status),
                    n_accept=scatter(result.n_accept, sub.n_accept),
                    n_reject=scatter(result.n_reject, sub.n_reject),
                    carry=jax.tree.map(scatter, result.carry, sub.carry),
                )
    else:
        tracer = _cached_tracer(
            config, env, env_host, mesh,
            {**common, "stepper": fixed_stepper}, rounds=False,
        )
        result = tracer(jnp.asarray(u0), jnp.asarray(f))

    # host-resident results (rounds tracer) reduce in numpy: each jnp
    # scalar would cost a ~30 ms device round-trip on the tunneled chip
    xp = np if isinstance(result.u, np.ndarray) else jnp
    stats = {
        k: np.asarray(v)
        for k, v in ensemble_stats(
            result, valid, lat_sign=spec.lat_sign,
            lat_offset=spec.lat_offset, xp=xp,
        ).items()
    }
    if config.sensitivity_rays > 0:
        # landing-sensitivity channel (sensitivity.py): event-projected
        # variational Jacobian for the first N valid rays, surfaced as
        # per-ray amplification |d lat_land / d lat_0| in stats + record
        from .sensitivity import landing_sensitivity_batch

        rhs_fn, group_idx = _rhs_for(config, env)
        idx = np.nonzero(np.asarray(valid))[0][: config.sensitivity_rays]
        sens = landing_sensitivity_batch(
            rhs_fn, np.asarray(u0)[idx], np.asarray(f)[idx],
            cfg=cfg, spec=spec, group_idx=group_idx,
            max_steps=config.max_steps,
        )
        stats["sensitivity_amplification"] = sens["amplification"]
        stats["sensitivity_status"] = sens["status"]

    paths = {}
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        fs_path = os.path.join(out_dir, f"{config.name}_final.npz")
        np.savez(
            fs_path,
            u=np.asarray(result.u), t=np.asarray(result.t),
            status=np.asarray(result.status),
            n_accept=np.asarray(result.n_accept),
            n_reject=np.asarray(result.n_reject),
            valid=np.asarray(valid), f=np.asarray(f),
        )
        paths["final"] = fs_path
        if result.traj is not None:
            tr_path = os.path.join(out_dir, f"{config.name}_traj.npz")
            np.savez(
                tr_path,
                **{k: np.asarray(v) for k, v in result.traj.items()},
            )
            paths["traj"] = tr_path
        rec_path = os.path.join(out_dir, f"{config.name}_record.json")
        write_run_record(
            rec_path, env=env, cfg=cfg, spec=spec, launch=config.launch(),
            result=result, stats=stats,
            extra={"config": config.to_json(), "dtype": config.dtype},
        )
        paths["record"] = rec_path
        if plots and result.traj is not None:
            from .viz import plot_ray_paths

            p = os.path.join(out_dir, f"{config.name}_rays.png")
            plot_ray_paths(result.traj["u"], frame=config.frame, path=p)
            paths["rays_png"] = p
    return {"result": result, "stats": stats, "valid": valid, "paths": paths}


# tracers hold their compiled programs; rebuild only when the run
# description actually changes (repeat run() calls then measure execution,
# not compilation)
_TRACER_CACHE = {}


def _cached_tracer(config: RunConfig, env, env_host, mesh, common, rounds):
    # the key reads env_host (python floats) -- float() on the cast env's
    # device scalars would block on a tunnel round-trip per field
    key = (
        rounds, config.to_json(),
        tuple(
            v if isinstance(v, (str, tuple)) else float(v)
            for v in env_host
        ),
        mesh.devices.size,
    )
    if key not in _TRACER_CACHE:
        maker = make_rounds_tracer if rounds else make_ensemble_tracer
        _TRACER_CACHE[key] = maker(env, mesh=mesh, **common)
    return _TRACER_CACHE[key]


def _rhs_for(config: RunConfig, env: medium_mod.EnvParams):
    if config.frame == "2d_lat":
        return (
            lambda u, ff: rhs_mod.rhs_2d_lat(
                u, ff, env, grad_mode=config.grad_mode, root=config.root),
            3,
        )
    if config.frame == "2d_colat":
        return (
            lambda u, ff: rhs_mod.rhs_2d_colat(
                u, ff, env, grad_mode=config.grad_mode, root=config.root),
            3,
        )
    return (
        lambda u, ff: rhs_mod.rhs_3d(
            u, ff, env, grad_mode=config.grad_mode, root=config.root),
        6,
    )


def summarize(result, valid):
    """Human-readable status summary line."""
    status = np.asarray(result.status)[np.asarray(valid)]
    parts = []
    for code, name in enumerate(events.STATUS_NAMES):
        n = int((status == code).sum())
        if n:
            parts.append(f"{name}={n}")
    return " ".join(parts)
