"""Bounce-averaged diffusion map on the chip: TPU f32 vs numpy f64 oracle.

The wave-particle tier's production workload is the (E, alpha_eq) map of
bounce-averaged quasi-linear coefficients -- the input every radiation-belt
diffusion study feeds to its Fokker-Planck solve. The numpy float64 chain
(diffusion.bounce_averaged) is the readable oracle; bounce_averaged_jax is
the same algorithm in jax.numpy. This benchmark times both on the same
grid and cross-checks the f32 chip result against the f64 oracle.

Grid: 32 energies x 64 equatorial pitch angles x 48 bounce-latitude nodes,
256-point resonance lattice + 24 bisections, both wave directions -- about
50M dispersion-lattice evaluations plus the per-root refinement chain.

Writes benchmarks/diffusion_map_r03.json.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "diffusion_map_r03.json")
NPY = os.path.join(HERE, "_diffusion_oracle_out.npz")

L_SHELL = 3.0
KW = dict(n_lat=48, n_grid=256, n_bisect=24)

ORACLE_SRC = r"""
import time, numpy as np, jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import sys; sys.path.insert(0, %(repo)r)
from raytrace_tpu import diffusion
from raytrace_tpu.diffusion import WaveSpectrum
from raytrace_tpu.models import make_env_lat
env = make_env_lat()
spec = WaveSpectrum(bw_t=50e-12, f_m=800.0, df=300.0, f_lc=200.0, f_uc=1800.0)
e = np.geomspace(10.0, 3000.0, 32)[:, None]
a = np.radians(np.linspace(5.0, 85.0, 64))[None, :]
kw = dict(%(kw)s)
ba = diffusion.bounce_averaged(e, a, %(l)r, env, spec, **kw)   # warm numpy caches
t0 = time.perf_counter()
ba = diffusion.bounce_averaged(e, a, %(l)r, env, spec, **kw)
wall = time.perf_counter() - t0
np.savez(%(npz)r, daa=ba["daa"], dap=ba["dap"], dpp=ba["dpp"],
         tau_b=ba["tau_b"], wall=wall)
print(f"oracle wall {wall:.2f} s")
"""


def main():
    from raytrace_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytrace_tpu import diffusion
    from raytrace_tpu.diffusion import WaveSpectrum
    from raytrace_tpu.models import cast_env, make_env_lat

    # ---- CPU float64 oracle in a subprocess (x64 must stay off here) ----
    src = ORACLE_SRC % {
        "repo": os.path.dirname(HERE),
        "kw": ", ".join(f"{k}={v}" for k, v in KW.items()),
        "l": L_SHELL, "npz": NPY,
    }
    subprocess.run([sys.executable, "-c", src], check=True)
    oracle = np.load(NPY)

    # ---- chip path: f32 env + grid, jitted chain ----
    env = cast_env(make_env_lat(), jnp.float32)
    spec = WaveSpectrum(bw_t=50e-12, f_m=800.0, df=300.0,
                        f_lc=200.0, f_uc=1800.0)
    e = jnp.asarray(np.geomspace(10.0, 3000.0, 32)[:, None], jnp.float32)
    a = jnp.asarray(np.radians(np.linspace(5.0, 85.0, 64))[None, :],
                    jnp.float32)
    fn = jax.jit(functools.partial(diffusion.bounce_averaged_jax,
                                   l_shell=L_SHELL, env=env, spec=spec,
                                   **KW))
    t0 = time.perf_counter()
    got = jax.block_until_ready(fn(e, a))
    compile_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    got = jax.block_until_ready(fn(e, a))
    chip_wall = time.perf_counter() - t0

    daa_ref = np.asarray(oracle["daa"])
    daa_got = np.asarray(got["daa"], np.float64)
    # compare where the oracle has real wave power (tiny values are
    # resonance-edge noise amplified by the f32 root location)
    mask = daa_ref > 1e-3 * daa_ref.max()
    rel = np.abs(daa_got[mask] - daa_ref[mask]) / daa_ref[mask]
    result = {
        "grid": "32 E x 64 alpha, L=3.0, " + ", ".join(
            f"{k}={v}" for k, v in KW.items()),
        "backend": jax.default_backend(),
        "oracle_cpu_f64_wall_s": float(oracle["wall"]),
        "chip_f32_wall_s": chip_wall,
        "chip_compile_s": compile_wall,
        "speedup": float(oracle["wall"]) / chip_wall,
        "n_compared": int(mask.sum()),
        "daa_rel_err_median": float(np.median(rel)),
        "daa_rel_err_p95": float(np.quantile(rel, 0.95)),
        "daa_rel_err_max": float(rel.max()),
    }
    os.remove(NPY)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
