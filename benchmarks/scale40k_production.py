"""40,960-ray scaling at the production ceiling (ensemble10k_production
solver settings: ds_max = 2e6 m arc ceiling + 8e6 m phase bound).

The 10k headline measured the ceiling economics (perf_r03h.json); this
records how they scale 4x: the saturated phase grows (more lanes per
round), so the step-count reduction should convert to wall more
directly than at 10k where rounds/dispatch dominate.

Cases:
  ref40k  -- reference ceiling dtmax = 1e6 m (refreshes scale40k_r03)
  prod40k -- production arc ceiling (ds_max 2e6 m, phase 8e6 m)

Writes benchmarks/scale40k_production.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "scale40k_production.json")


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
    spec40k = LaunchSpec(
        lats=tuple(np.linspace(0.45, 1.1, 80)),
        chis=tuple(np.linspace(-0.5, 0.5, 16)),
        freqs=tuple(np.geomspace(500.0, 8000.0, 32)),
    )
    u0, f, valid = pad_batch(*build_launch(spec40k, np.float32), mesh)
    stop = StopSpec(r_floor=1.0, t_max=5.0e9 / RE)

    def run_case(name, cfg):
        tracer = make_rounds_tracer(
            env, mesh=mesh, cfg=cfg, spec=stop, max_steps=20000,
            round_steps=(2048, 2048, 1024), chunk=512, bucket_floor=256,
            stepper="auto", base_stepper="bs3", want_carry=False,
        )
        tracer(u0, f, valid)  # compile + warm
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            res = tracer(u0, f, valid)
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        acc = np.asarray(res.n_accept)[valid]
        rej = np.asarray(res.n_reject)[valid]
        steps = int(acc.sum() + rej.sum())
        stats = ensemble_stats(res, valid, xp=np)
        rec = {
            "rays": int(np.asarray(valid).sum()),
            "wall_s": round(wall, 3),
            "walls_s": [round(w, 3) for w in walls],
            "steps": steps,
            "steps_per_s_M": round(steps / wall / 1e6, 2),
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
    results["ref40k"] = run_case(
        "ref40k", SolverConfig(dt_max=1.0e6 / RE, **base))
    results["prod40k"] = run_case(
        "prod40k",
        SolverConfig(dt_max=8.0e6 / RE, ds_max=2.0e6 / RE, **base))

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
