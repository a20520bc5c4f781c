"""Per-config chip benchmarks for the five BASELINE.json workloads
(examples 01-05: flat-basin gravity wave, rotating basin, tracer-coupled,
Black Sea mask, Azov hires; reference workload definitions
/root/reference/configs/basinpar.f90:96-166).

Prints ONE JSON line per config (same schema family as bench.py):
Gpts/s dense, wet-points/s on masked configs, ms/step, vs the 1.31e9
jnp-composition baseline. All numbers come from one session so they are
mutually comparable (chip drift is ~2x between sessions — BASELINE.md).

Run: python scripts/bench_configs.py [config ...]   (defaults: all five)
"""

import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ocean_model_arch_tpu.utils.cache import enable_compilation_cache

CONFIGS = ["01_flat_basin", "02_rotating_basin", "03_tracer",
           "04_black_sea", "05_azov_hires"]


def bench_one(name: str, n_inner: int = 2000, windows: int = 3):
    import jax

    from ocean_model_arch_tpu.config import Precision
    from ocean_model_arch_tpu.model.fused import FusedSWModel
    from ocean_model_arch_tpu.model.model import (OceanModel,
                                                  load_config_dir)

    d = f"examples/{name}"
    cfg = load_config_dir(d)
    cfg = dataclasses.replace(cfg, precision=Precision.f32())
    om = OceanModel(cfg, base_dir=d)
    grid, state = om.grid, om.state
    tau = float(cfg.run.tau)
    fm = FusedSWModel(grid, cfg, tau, static_rslu=True,
                      steps_per_call=2,          # tx auto
                      mu_const=om.state_mu_const() or 0.0)
    carry = fm.pack(state)

    @jax.jit
    def run(c):
        return fm.run_steps(c, n_inner)

    carry, ok = run(carry)
    if not bool(ok):
        raise RuntimeError(f"{name}: stability guard tripped in warmup")
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        carry, ok = run(carry)
        good = bool(ok)          # value transfer = true barrier
        best = min(best, time.perf_counter() - t0)
        if not good:
            raise RuntimeError(f"{name}: stability guard tripped")
    pts = grid.nx * grid.ny
    wet = float((np.asarray(grid.lu) > 0.5).mean())
    pps = pts * n_inner / best
    print(json.dumps({
        "metric": f"sw_step_points_per_sec_per_chip[{name}]",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / 1.31e9, 4),
        "ms_per_step": round(best / n_inner * 1e3, 4),
        "grid": f"{grid.nx}x{grid.ny}",
        "wet_fraction": round(wet, 4),
        "wet_points_per_sec": round(pps * wet, 1),
        "tracers": fm.n_tracers,
        "mu_const": fm.mu_const,
    }), flush=True)


def main():
    enable_compilation_cache()
    for name in sys.argv[1:] or CONFIGS:
        try:
            bench_one(name)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
