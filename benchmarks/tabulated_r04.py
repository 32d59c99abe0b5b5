"""On-chip A/B: tabulated vs closed-form plasmasphere in the hot RHS.

The one structural utilization lever round 3's roofline analysis left
untried (VERDICT r3 weak #3): replace the CA1992 branch transcendentals
with VMEM table gathers (ops/tabulated.py) and measure on the real chip
at matched landing statistics. Both arms run the SAME single-program
while_loop tracer (pinned bs3, the headline's base method) over the same
10,240-ray 2D headline launch, so the only difference is the density
chain inside the fused dispersion eval.

Writes benchmarks/tabulated_r04.json either way (win or negative).
"""

import json
import os
import time

import numpy as np

from raytrace_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from raytrace_tpu.constants import RE
from raytrace_tpu.integrate import SolverConfig, StopSpec, trace
from raytrace_tpu.models import cast_env, make_env_lat
from raytrace_tpu.ops import rhs
from raytrace_tpu.ops.tabulated import (
    build_ne_table, interp_error_bound, ne_and_grads_tab,
)
from raytrace_tpu.parallel import (
    LaunchSpec, build_launch, make_ray_mesh, pad_batch,
)
from raytrace_tpu.parallel.mesh import ray_sharding

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "tabulated_r04.json")


def main():
    mesh = make_ray_mesh()
    env_host = make_env_lat()
    env = cast_env(env_host, jnp.float32)
    tab_host = build_ne_table(env_host)
    err = interp_error_bound(tab_host, env_host)
    tab = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32)
        if hasattr(x, "dtype") else x, tab_host,
    )
    spec = LaunchSpec(
        lats=tuple(np.linspace(0.45, 1.1, 40)),
        chis=tuple(np.linspace(-0.5, 0.5, 16)),
        freqs=tuple(np.geomspace(500.0, 8000.0, 16)),
    )
    u0, f, valid = pad_batch(*build_launch(spec, np.float32), mesh)
    v = np.asarray(valid)
    kw = dict(cfg=SolverConfig(rtol=1e-5, atol=1e-8, dt0=1e-4),
              spec=StopSpec(r_floor=1.0, t_max=5.0e9 / RE),
              max_steps=20000, chunk=512, stepper="bs3", group_idx=3)
    sh = ray_sharding(mesh)

    def arm(rhs_fn, label):
        tr = jax.jit(lambda uu, ff: trace(rhs_fn, uu, ff, **kw),
                     in_shardings=(sh, sh))
        res = tr(jnp.asarray(u0), jnp.asarray(f))  # compile + warm
        jax.block_until_ready(res.u)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = tr(jnp.asarray(u0), jnp.asarray(f))
            jax.block_until_ready(res.u)
            walls.append(time.perf_counter() - t0)
        st = np.asarray(res.status)[v]
        uu = np.asarray(res.u)[v]
        hit = st == 1
        L = uu[hit, 0] / np.maximum(np.cos(uu[hit, 1]) ** 2, 1e-6)
        steps = int((np.asarray(res.n_accept) + np.asarray(res.n_reject))[v].sum())
        print(label, walls, "hits", int(hit.sum()), flush=True)
        return dict(walls_s=[round(x, 4) for x in walls],
                    wall_s=round(float(np.median(walls)), 4),
                    ray_steps=steps, hits=int(hit.sum()),
                    median_landing_l=float(np.median(L)))

    closed = arm(lambda u, ff: rhs.rhs_2d_lat(u, ff, env), "closed")
    tabbed = arm(
        lambda u, ff: rhs.rhs_2d_lat(
            u, ff, env,
            ne_fn=lambda rr, ll, ee: ne_and_grads_tab(rr, ll, ee, tab)),
        "tabulated",
    )
    rec = {
        "ok": True,
        "workload": "10240-ray 2D headline fan, pinned bs3, rtol 1e-5",
        "closed_form": closed,
        "tabulated": tabbed,
        "speedup_tabulated": round(closed["wall_s"] / tabbed["wall_s"], 3),
        "interp_sup_rel_err": err,
        "landing_median_delta_rel": abs(
            tabbed["median_landing_l"] / closed["median_landing_l"] - 1.0
        ),
    }
    with open(OUT, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
