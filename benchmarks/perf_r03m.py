"""Round-3 stiff-pool A/B, FORCED hand-off: ros2x vs ros3pr integrating.

First finding (this file's initial run, kept in perf_r03m.json under
"default_switch"): at the production threshold (stiff_switch = 0.5) the
knee fans NEVER trip the stiff hand-off under the BS3 base -- rejection
stays at 1.5-2.4%, every round runs on the non-stiff pool, and the two
stiff_stepper settings are bit-identical (statuses, steps, medians all
equal; stiff_rounds = 0). perf_r03l.py measures the same incidence on
the 10,240-ray headline. So the production A/B is moot by construction;
to compare the steppers where they actually INTEGRATE, this run forces
the hand-off with stiff_switch = 0.05 / stiff_unswitch = 0.0 (any
rejection burst migrates the ray, and it stays) -- the regime CVODE's
method switching would live in if the problem were as stiff as the
reference's CVODE_BDF choice assumed.

Workloads (auto over bs3 base, rtol 1e-5 / atol 1e-8 f32):
  knee2d -- the knee preset fan scaled to 384 rays (lats 0.9-1.15,
            chis +-0.2, f = 500/1000/2000 Hz): launches that traverse
            L ~ Lppi..Lppo, the rejection-burst region.
  knee3d -- the 7-state knee fan (12 lats x 3 freqs), exercising the
            ros*/7x7 unpivoted W-solve path.

For each: stiff_stepper in {ros2x, ros3pr}; identical everything else.
Records wall, attempted steps, the stiff-pool rounds specifically
(stepper field of tracer.last_rounds), per-ray status agreement, and
landing medians. Decision rule: the cheaper stiff-pool wall at equal
statuses and medians-within-noise wins the default.

Writes benchmarks/perf_r03m.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "perf_r03m.json")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec
    from raytrace_tpu.models import cast_env, make_env, make_env_lat
    from raytrace_tpu.ops.dispersion import consistent_rho_3d
    from raytrace_tpu.parallel import (
        LaunchSpec, build_launch, make_ray_mesh, pad_batch,
    )
    from raytrace_tpu.parallel.ensemble import (
        ensemble_stats, make_rounds_tracer,
    )

    mesh = make_ray_mesh()
    cfg = SolverConfig(rtol=1e-5, atol=1e-8, dt0=1e-4)

    # ---- 2D knee fan ----------------------------------------------------
    env2 = cast_env(make_env_lat(), jnp.float32)
    spec2 = LaunchSpec(
        lats=tuple(np.linspace(0.9, 1.15, 16)),
        chis=tuple(np.linspace(-0.2, 0.2, 8)),
        freqs=(500.0, 1000.0, 2000.0),
    )
    u2, f2, v2 = pad_batch(*build_launch(spec2, np.float32), mesh)
    stop2 = StopSpec(r_floor=1.0, t_max=5.0e9 / RE)

    # ---- 3D knee fan (on-shell launch, CPU-side setup) ------------------
    env3_64 = make_env(b0=3.12e-5)
    env3 = cast_env(env3_64, jnp.float32)
    lats3 = np.linspace(0.9, 1.15, 12)
    freqs3 = np.array([500.0, 1000.0, 2000.0])
    r0 = (RE + 1.0e6) / RE
    lat_g, fq_g = np.meshgrid(lats3, freqs3, indexing="ij")
    th_g = (np.pi / 2 - lat_g).ravel()
    fs3 = fq_g.ravel()
    with jax.default_device(jax.devices("cpu")[0]):
        rho = jax.jit(jax.vmap(
            lambda th, fq: jnp.stack(consistent_rho_3d(
                r0, th, 0.0, (1.0, 1.0, 0.0), fq, env3_64))
        ))(jnp.asarray(th_g), jnp.asarray(fs3))
        rho = np.asarray(rho)
    u3 = np.stack([
        np.full_like(th_g, r0), th_g, np.zeros_like(th_g),
        rho[:, 0], rho[:, 1], rho[:, 2], np.zeros_like(th_g),
    ], axis=1).astype(np.float32)
    u3, f3, v3 = pad_batch(u3, fs3.astype(np.float32), mesh)
    stop3 = StopSpec(r_floor=1.0, t_max=5.0e9 / RE, lat_sign=-1.0,
                     lat_offset=np.pi / 2)

    def run_case(tag, stiff, env, frame, u0, f, valid, stop, stats_kw):
        tracer = make_rounds_tracer(
            env, frame=frame, mesh=mesh, cfg=cfg, spec=stop,
            max_steps=20000, round_steps=(2048, 2048, 1024), chunk=512,
            bucket_floor=256, stepper="auto", base_stepper="bs3",
            stiff_stepper=stiff, stiff_switch=0.05, stiff_unswitch=0.0,
            want_carry=False,
        )
        tracer(u0, f, valid)  # compile + warm
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = tracer(u0, f, valid)
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        acc = np.asarray(res.n_accept)[valid]
        rej = np.asarray(res.n_reject)[valid]
        steps = int(acc.sum() + rej.sum())
        stats = ensemble_stats(res, valid, xp=np, **stats_kw)
        stiff_rounds = [r for r in tracer.last_rounds
                        if r.get("stepper") == stiff]
        rec = {
            "rays": int(np.asarray(valid).sum()),
            "wall_s": round(wall, 3),
            "walls_s": [round(w, 3) for w in walls],
            "steps": steps,
            "rejection_pct": round(
                100.0 * float(rej.sum()) / max(steps, 1), 2),
            "stiff_rounds": len(stiff_rounds),
            "stiff_attempted": sum(r.get("attempted", 0)
                                   for r in stiff_rounds),
            "stiff_wall_s": round(sum(r.get("wall_s", 0.0)
                                      for r in stiff_rounds), 3),
            "status_counts": {
                k: int(v) for k, v in stats.items() if k.startswith("n_")
            },
            "median_landing_l": round(float(stats["median_landing_l"]), 6),
            "median_group_delay_s": round(
                float(stats["median_group_delay_s"]), 6),
        }
        print(tag, json.dumps(rec), flush=True)
        return rec, np.asarray(res.status)[valid]

    results = {}
    for wl, (env, frame, u0, f, valid, stop, skw) in {
        "knee2d": (env2, "2d_lat", u2, f2, v2, stop2, {}),
        "knee3d": (env3, "3d", u3, f3, v3, stop3,
                   dict(lat_sign=-1.0, lat_offset=np.pi / 2)),
    }.items():
        recs = {}
        statuses = {}
        for stiff in ("ros2x", "ros3pr"):
            recs[stiff], statuses[stiff] = run_case(
                f"{wl}/{stiff}", stiff, env, frame, u0, f, valid, stop, skw)
        agree = float((statuses["ros2x"] == statuses["ros3pr"]).mean())
        recs["status_agreement_pct"] = round(100.0 * agree, 2)
        print(wl, "agreement", recs["status_agreement_pct"], flush=True)
        results[wl] = recs

    payload = {"forced_switch_0p05": results}
    # preserve the default-threshold run (stiff pool never entered) if
    # its results are already on disk from the first pass of this file
    if os.path.exists(OUT):
        with open(OUT) as fh:
            prior = json.load(fh)
        if "forced_switch_0p05" not in prior:
            payload["default_switch_0p5"] = prior
        else:
            payload["default_switch_0p5"] = prior.get("default_switch_0p5")
    with open(OUT, "w") as fh:
        json.dump(payload, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
