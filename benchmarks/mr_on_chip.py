"""On-chip measurement of the mr_fan preset (the straggler-heavy load).

The magnetospherically-reflecting fan is the OPPOSITE load shape from
the 10k headline: 2,048 rays whose median integrates ~5000 accepted
steps (multi-bounce, group delays of seconds) instead of a fan where
94% retire in the first round. Measures wall, attempted steps/s and the
census on the real chip; writes benchmarks/perf_r04_mr.json.

Usage: python benchmarks/mr_on_chip.py  (subprocess + timeout + retry,
see bench.py for why).
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

OUT = os.path.join(HERE, "perf_r04_mr.json")


def measure():
    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.config import preset
    from raytrace_tpu.models import cast_env
    from raytrace_tpu.parallel import make_ray_mesh, pad_batch
    from raytrace_tpu.parallel.ensemble import make_rounds_tracer
    from raytrace_tpu.run import _build_u0
    from raytrace_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = preset("mr_fan")
    env = cast_env(cfg.medium.build(), jnp.float32)
    mesh = make_ray_mesh()
    u0, f = _build_u0(cfg, np.float32)
    u0, f, valid = pad_batch(u0, f, mesh)
    tracer = make_rounds_tracer(
        env, mesh=mesh, frame=cfg.frame, cfg=cfg.solver(), spec=cfg.stop(),
        max_steps=cfg.max_steps, chunk=512, bucket_floor=256,
        stepper="auto", base_stepper=cfg.base_stepper, want_carry=False,
    )
    tracer(u0, f, valid)
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = tracer(u0, f, valid)
        walls.append(round(time.perf_counter() - t0, 4))
    v = np.asarray(valid)
    st = np.asarray(res.status)[v]
    na = np.asarray(res.n_accept)[v]
    steps = int(np.asarray(res.n_accept + res.n_reject)[v].sum())
    return {
        "walls_s": walls, "wall_s": sorted(walls)[1], "rays": int(v.sum()),
        "ray_steps": steps,
        "steps_per_s": round(steps / sorted(walls)[1], 1),
        "accepts_median": int(np.median(na)),
        "accepts_max": int(na.max()),
        "census": {int(k): int((st == k).sum()) for k in np.unique(st)},
    }


def main():
    if "--measure" in sys.argv:
        print(json.dumps(measure()))
        return
    got = None
    for _ in range(4):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--measure"],
                capture_output=True, text=True, cwd=REPO, timeout=1200)
            for line in reversed(r.stdout.strip().splitlines()):
                if line.startswith("{"):
                    got = json.loads(line)
                    break
        except subprocess.TimeoutExpired:
            continue
        if got:
            break
    out = {"study": "mr_fan: 2,048-ray magnetospherically-reflecting "
                    "ensemble (multi-bounce straggler-heavy load), one "
                    "TPU v5e chip, median-of-3 warm walls",
           "result": got}
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
