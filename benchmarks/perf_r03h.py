"""Round-3 ceiling combos: picking the production dt-ceiling setting.

perf_r03f.json measured the single-knob frontier: the arc ceiling
(ds_max = 1e6 m) cuts steps 4.4x but pays ~11% rejection when the
error estimator becomes the only brake; the raw phase-x4 probe
(dt_max = 4e6 m) keeps rejection at 6.9% and wins wall on this
dispatch-bound topology. This experiment measures the COMBINATION --
arc ceiling for the physics (spatial resolution tied to the medium),
modest phase ceiling on top to curb estimator-brake rejections -- to
pick the documented `ensemble10k_production` setting.

Cases (10,240-ray headline shape, auto over bs3 base):
  phase4e6      -- dt_max = 4e6 m (control; perf_r03f best wall)
  arc1e6_ph4e6  -- ds_max = 1e6 m + dt_max = 4e6 m
  arc2e6_ph8e6  -- ds_max = 2e6 m + dt_max = 8e6 m (scaled-up combo)

Writes benchmarks/perf_r03h.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "perf_r03h.json")


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
        return rec

    base = dict(rtol=1e-5, atol=1e-8, dt0=1e-4)
    results = {}
    results["phase4e6"] = run_case(
        "phase4e6", SolverConfig(dt_max=4.0e6 / RE, **base))
    results["arc1e6_ph4e6"] = run_case(
        "arc1e6_ph4e6",
        SolverConfig(dt_max=4.0e6 / RE, ds_max=1.0e6 / RE, **base))
    results["arc2e6_ph8e6"] = run_case(
        "arc2e6_ph8e6",
        SolverConfig(dt_max=8.0e6 / RE, ds_max=2.0e6 / RE, **base))

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
