"""Round-3 dt-ceiling economics, part 2: the arc-length ceiling.

The headline ensemble rides dt_max (median accepted dt = 0.985 dt_max,
perf_r03.json), and the raw dt_max x2/x4 probes showed 0.451/0.381 s at
stable landing medians -- i.e. the reference's phase-path dtmax = 1e6 m
(RayTrace_lat.jl:338) is not what actually protects accuracy here. Its
physical job is resolving spatial structure of the medium, but the
spatial rate |dx/dtau| ~ 1/mu varies ~100x along a whistler ray, so a
fixed PHASE ceiling over-resolves space exactly where the plasma is
densest (mu large, ray spatially slow). SolverConfig.ds_max caps the
ARC LENGTH per step instead, computed from the FSAL carry at zero extra
cost per attempt.

Question: with the phase ceiling relaxed and the arc ceiling at the
medium's own gradient scale (plasmapause knee ~0.1 L ~ 6.4e5 m,
ionosphere scale height ~1.5e6 m), what happens to wall clock and to
the landing physics?

Cases (10,240-ray headline shape, BS3 base, reference tolerances):
  bs3_ctrl  -- phase ceiling 1e6 m (the round-3 headline control)
  arc1e6    -- ds_max = 1e6 m, phase ceiling relaxed to 16e6 m
  arc3e5    -- ds_max = 3e5 m, same relaxed phase ceiling
  phase4e6  -- raw phase ceiling 4e6 m (the earlier probe, re-run here
               for an apples-to-apples accuracy comparison)

Writes benchmarks/perf_r03f.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "perf_r03f.json")


def main():
    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec, events
    from raytrace_tpu.models import cast_env, make_env_lat
    from raytrace_tpu.parallel import (
        LaunchSpec, build_launch, make_ray_mesh, pad_batch,
    )
    from raytrace_tpu.parallel.ensemble import (
        ensemble_stats, make_rounds_tracer,
    )

    env = cast_env(make_env_lat(), jnp.float32)
    mesh = make_ray_mesh()
    spec10k = LaunchSpec(
        lats=tuple(np.linspace(0.45, 1.1, 40)),
        chis=tuple(np.linspace(-0.5, 0.5, 16)),
        freqs=tuple(np.geomspace(500.0, 8000.0, 16)),
    )
    u0, f, valid = pad_batch(*build_launch(spec10k, np.float32), mesh)
    stop = StopSpec(r_floor=1.0, t_max=5.0e9 / RE)

    def run_case(name, cfg):
        tracer = make_rounds_tracer(
            env, mesh=mesh, cfg=cfg, spec=stop, max_steps=20000,
            round_steps=(2048, 2048, 1024), chunk=512, bucket_floor=256,
            stepper="auto", base_stepper="bs3", want_carry=False,
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
        stats = ensemble_stats(res, valid, xp=np)
        rec = {
            "wall_s": round(wall, 3),
            "walls_s": [round(w, 3) for w in walls],
            "steps": steps,
            "steps_per_s_M": round(steps / wall / 1e6, 2),
            "rejection_pct": round(100.0 * float(rej.sum()) / max(steps, 1), 2),
            "status_counts": {
                k: int(v) for k, v in stats.items() if k.startswith("n_")
            },
            "median_landing_l": round(float(stats["median_landing_l"]), 6),
            "median_group_delay_s": round(
                float(stats["median_group_delay_s"]), 6
            ),
        }
        print(name, json.dumps(rec), flush=True)
        return rec, res

    def agreement(ref, res):
        sa = np.asarray(ref.status)[valid]
        sb = np.asarray(res.status)[valid]
        both_hit = (sa == events.HIT_EARTH) & (sb == events.HIT_EARTH)
        ua = np.asarray(ref.u)[valid]
        ub = np.asarray(res.u)[valid]
        la = ua[both_hit, 0] / np.cos(ua[both_hit, 1]) ** 2
        lb = ub[both_hit, 0] / np.cos(ub[both_hit, 1]) ** 2
        return {
            "status_agreement_pct": round(100.0 * float((sa == sb).mean()), 2),
            "n_both_hit": int(both_hit.sum()),
            "median_abs_rel_dlanding_l": round(
                float(np.median(np.abs(lb - la) / la)), 6
            ),
            "p90_abs_rel_dlanding_l": round(
                float(np.percentile(np.abs(lb - la) / la, 90)), 6
            ),
        }

    base = dict(rtol=1e-5, atol=1e-8, dt0=1e-4)
    results = {}
    results["bs3_ctrl"], ref = run_case(
        "bs3_ctrl", SolverConfig(dt_max=1.0e6 / RE, **base))
    for name, cfg in [
        ("arc1e6", SolverConfig(dt_max=16.0e6 / RE, ds_max=1.0e6 / RE,
                                **base)),
        ("arc3e5", SolverConfig(dt_max=16.0e6 / RE, ds_max=3.0e5 / RE,
                                **base)),
        ("phase4e6", SolverConfig(dt_max=4.0e6 / RE, **base)),
    ]:
        results[name], res = run_case(name, cfg)
        results[name + "_vs_ctrl"] = agreement(ref, res)
        print(name + "_vs_ctrl", json.dumps(results[name + "_vs_ctrl"]),
              flush=True)

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
