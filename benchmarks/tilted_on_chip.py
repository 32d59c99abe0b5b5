"""On-chip cost of the non-dipole field models at production scale.

Runs the ensemble10k_tilted and ensemble10k_igrf presets (the full
ps_mlt x tilted/IGRF composition: magnetic-longitude MLT axis) against
the ensemble10k_plume control (same fan, centered dipole, fused
chain), so the marginal cost of (a) the tilted geometry and (b) the
degree-3 spherical-harmonic IGRF field is measured on the real chip,
not inferred.

Two records exist:
  perf_r05_tilted.json       -- the AUTODIFF-fallback gradient chain
                                (pre-fused measurement: tilted
                                +22.5%/step, IGRF +28.3%/step)
  perf_r05_tilted_fused.json -- the general hybrid fused chain
                                (ops/fused.py::mu_and_grads_3d_general:
                                forward-mode geometry jacobian + the
                                hand-fused density/Stix core), the
                                VERDICT r4 #4 decision output.

Usage: python benchmarks/tilted_on_chip.py
Each measurement runs in a subprocess with a timeout (the tunneled
compile service intermittently hangs; see bench.py).
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

OUT = os.path.join(HERE, "perf_r05_tilted_fused.json")
NAMES = ("ensemble10k_plume", "ensemble10k_tilted", "ensemble10k_igrf")


def measure(name):
    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu.config import preset
    from raytrace_tpu.models import cast_env
    from raytrace_tpu.parallel import make_ray_mesh, pad_batch
    from raytrace_tpu.parallel.ensemble import make_rounds_tracer
    from raytrace_tpu.run import _build_u0
    from raytrace_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = preset(name)
    env = cast_env(cfg.medium.build(), jnp.float32)
    mesh = make_ray_mesh()
    u0, f = _build_u0(cfg, np.float32)
    u0, f, valid = pad_batch(u0, f, mesh)
    tracer = make_rounds_tracer(
        env, mesh=mesh, frame="3d", cfg=cfg.solver(), spec=cfg.stop(),
        max_steps=cfg.max_steps, round_steps=tuple(cfg.round_steps),
        chunk=512, bucket_floor=256, stepper="auto",
        base_stepper=cfg.base_stepper, want_carry=False,
    )
    tracer(u0, f, valid)  # compile + warm
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = tracer(u0, f, valid)
        walls.append(round(time.perf_counter() - t0, 4))
    v = np.asarray(valid)
    st = np.asarray(res.status)[v]
    steps = int(np.asarray(res.n_accept + res.n_reject)[v].sum())
    return {
        "walls_s": walls, "wall_s": sorted(walls)[1], "rays": int(v.sum()),
        "ray_steps": steps,
        "census": {int(k): int((st == k).sum()) for k in np.unique(st)},
    }


def main():
    if len(sys.argv) > 1 and sys.argv[1] in NAMES:
        print(json.dumps(measure(sys.argv[1])))
        return
    out = {"study": "non-dipole field cost at production scale: the "
                    "ps_mlt x tilted/IGRF composition (general hybrid "
                    "fused chain, ops/fused.py::mu_and_grads_3d_general) "
                    "vs the fused-dipole plume control, one TPU v5e chip, "
                    "median-of-3 warm walls"}
    for name in NAMES:
        got = None
        for _ in range(4):
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), name],
                    capture_output=True, text=True, cwd=REPO, timeout=1800)
                for line in reversed(r.stdout.strip().splitlines()):
                    if line.startswith("{"):
                        got = json.loads(line)
                        break
            except subprocess.TimeoutExpired:
                print(f"{name}: timeout, retrying", file=sys.stderr)
                continue
            if got:
                break
            # a non-timeout failure (import error, preset rename, chip
            # allocation) must be visible, not retried into a null row
            print(f"{name}: child exit {r.returncode}\n{r.stderr[-2000:]}",
                  file=sys.stderr)
        out[name] = got
    a = out.get("ensemble10k_plume")
    for name in ("ensemble10k_tilted", "ensemble10k_igrf"):
        b = out.get(name)
        if a and b:
            key = name.split("_")[-1]
            out[f"{key}_overhead_wall"] = round(b["wall_s"] / a["wall_s"], 3)
            out[f"{key}_overhead_per_step"] = round(
                (b["wall_s"] / b["ray_steps"]) /
                (a["wall_s"] / a["ray_steps"]), 3)
    # the committed record's provenance note (autodiff-fallback baseline
    # numbers + the array-form dead end DESIGN.md section 15 cites) must
    # survive a re-run: carry forward any keys this script doesn't own
    if os.path.exists(OUT):
        with open(OUT) as fh:
            prev = json.load(fh)
        for k, v in prev.items():
            out.setdefault(k, v)
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
