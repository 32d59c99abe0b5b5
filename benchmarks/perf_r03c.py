"""Round-3 third pass: re-tune the rounds schedule for the BS3 base.

The (2048, 2048, 1024) schedule was tuned on-chip for DP5 attempt costs
(round 2). BS3 halves the device time per attempt, so per-round fixed
costs (dispatch, bookkeeping, gather/scatter) take a larger share and
the optimal schedule may shift longer. Sweeps schedules and bucket
floors at the headline config; writes benchmarks/perf_r03c.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "perf_r03c.json")


def main():
    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.constants import RE
    from raytrace_tpu.integrate import SolverConfig, StopSpec
    from raytrace_tpu.models import cast_env, make_env_lat
    from raytrace_tpu.parallel import (
        LaunchSpec, build_launch, make_ray_mesh, pad_batch,
    )
    from raytrace_tpu.parallel.ensemble import make_rounds_tracer

    env = cast_env(make_env_lat(), jnp.float32)
    mesh = make_ray_mesh()
    spec10k = LaunchSpec(
        lats=tuple(np.linspace(0.45, 1.1, 40)),
        chis=tuple(np.linspace(-0.5, 0.5, 16)),
        freqs=tuple(np.geomspace(500.0, 8000.0, 16)),
    )
    u0, f, valid = pad_batch(*build_launch(spec10k, np.float32), mesh)
    stop = StopSpec(r_floor=1.0, t_max=5.0e9 / RE)
    cfg = SolverConfig(rtol=1e-5, atol=1e-8, dt0=1e-4)

    cases = [
        ("r2_tuned", dict(round_steps=(2048, 2048, 1024), bucket_floor=256)),
        ("long_first", dict(round_steps=(4096, 2048), bucket_floor=256)),
        ("longer_first", dict(round_steps=(6144, 2048), bucket_floor=256)),
        ("short_probe", dict(round_steps=(1024, 2048, 2048), bucket_floor=256)),
        ("floor128", dict(round_steps=(2048, 2048, 1024), bucket_floor=128)),
        ("floor512", dict(round_steps=(2048, 2048, 1024), bucket_floor=512)),
        ("chunk1024", dict(round_steps=(2048, 2048, 1024), bucket_floor=256,
                           chunk=1024)),
    ]
    results = {}
    for name, kw in cases:
        kw.setdefault("chunk", 512)
        tracer = make_rounds_tracer(
            env, mesh=mesh, cfg=cfg, spec=stop, max_steps=20000,
            stepper="auto", base_stepper="bs3", want_carry=False, **kw,
        )
        tracer(u0, f, valid)  # compile + warm
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = tracer(u0, f, valid)
            walls.append(time.perf_counter() - t0)
        steps = int(
            np.asarray(res.n_accept)[valid].sum()
            + np.asarray(res.n_reject)[valid].sum()
        )
        best = min(walls)
        results[name] = {
            "wall_s_best": round(best, 3),
            "wall_s_all": [round(w, 3) for w in walls],
            "steps_per_s_M": round(steps / best / 1e6, 2),
            "rounds": [
                {k: (round(v, 4) if isinstance(v, float) else v)
                 for k, v in r.items()}
                for r in tracer.last_rounds
            ],
        }
        print(name, results[name]["wall_s_best"],
              results[name]["steps_per_s_M"], "M/s", flush=True)

    with open(OUT, "w") as fh:
        json.dump(results, fh, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
