"""Headline benchmark: grid-points/s/chip of the full shallow-water step.

Workload = the reference's shipped default configuration (basin.par: Azov
Sea 250 m extents 1525x1115, spherical metrics, 'none' mask -> 2-cell land
frame, flat 100 m bathymetry, gaussian-bump SSH; sw.par defaults: full free
surface + momentum transport + lateral viscosity, no tracers), run in f32
production precision on one chip.

Prints ONE JSON line:
  {"metric": "sw_step_points_per_sec_per_chip", "value": N,
   "unit": "points/s", "vs_baseline": F}

Fast path: the fused Pallas whole-step kernel (ops/pallas/fused_step.py)
carrying only the 6 prognostic fields — depths and staggered masks are
recomputed in VMEM (HBM traffic = 14 f32 passes/point/step). Falls back to
the general jnp composition when the config is outside the fused
envelope.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline``
reports the speedup over the baseline implementation: the straightforward
XLA-fused jnp composition of the reference's 11 kernels (1.31e9
points/s/chip on this config). The working set stays VMEM-resident across
scan iterations (the copy-through probe for this tiling runs at 47.8
Gpts/s, scripts/roofline_probe.py), so HBM is NOT the wall: the kernel is
VPU-bound, and chaining steps_per_call model steps per launch amortizes
the static-plane streaming. Round-2 default (tx=64, spc=2): 17.3 Gpts/s.
"""

import json
import sys
import time

import numpy as np


def main(workload: str = "default"):
    import jax

    from ocean_model_arch_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from ocean_model_arch_tpu.config import (ModelConfig, Precision,
                                             SWConfig, basinpar_as250m_test)
    from ocean_model_arch_tpu.core.grid import build_grid
    from ocean_model_arch_tpu.core.masks import frame_of_land_mask
    from ocean_model_arch_tpu.model.init import init_ocean_state
    from ocean_model_arch_tpu.model.step import make_step, run_steps

    from ocean_model_arch_tpu.model.fused import (FusedSWModel,
                                                  fused_available)

    basin = basinpar_as250m_test()
    prec = Precision.f32()
    cfg = ModelConfig(basin=basin, sw=SWConfig(use_tracers=0),
                      precision=prec)
    if workload == "azov_mask":
        # the reference's ACTUAL shipped workload: same extents with the
        # real Azov Sea coastline (data/AS/maskAzovCor.txt, 41.1% wet —
        # mask files are 1=land, 0=water) — reports wet-points/s, the
        # honest throughput on realistic masks
        from ocean_model_arch_tpu.io.mask_io import read_mask
        int_mask = read_mask("data/AS/maskAzovCor.txt", basin.nx, basin.ny)
    else:
        int_mask = frame_of_land_mask(basin.nx, basin.ny)
    grid = build_grid(basin, int_mask, precision=prec)
    state = init_ocean_state(grid, cfg)
    wet_points = int((np.asarray(int_mask) == 0).sum())

    # long scan windows amortize the per-dispatch host/tunnel round-trip
    # (~40 ms here) against device compute; the whole window is one XLA
    # program (lax.scan), so compile cost is independent of n_inner
    n_inner = 2000
    if fused_available(grid, cfg):
        # static_rslu enables the fast kernel (static mask planes,
        # profile-restructured vorticity, folded constants); tx=64 is
        # the measured sweet spot (32/96/128/256 all slower) and
        # steps_per_call=2 chains two model steps per kernel launch,
        # halving streamed passes (scripts/fused_variants_probe)
        fm = FusedSWModel(grid, cfg, 1.0, tx=64, static_rslu=True,
                          steps_per_call=2)
        carry = fm.pack(state)

        @jax.jit
        def run_j(s6):
            return fm.run_steps(s6, n_inner)
    else:
        step = make_step(grid, cfg)

        @jax.jit
        def run_j(st):
            return run_steps(step, st, np.float32(1.0), n_inner)
        carry = state

    # warmup + compile
    carry, ok = run_j(carry)
    jax.block_until_ready(ok)
    assert bool(ok), "stability guard tripped in benchmark"

    # the tunneled chip is timing-noisy: take the best of several windows
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry, ok = run_j(carry)
        jax.block_until_ready(ok)
        best = min(best, time.perf_counter() - t0)

    points = basin.nx * basin.ny
    pts_per_s = points * n_inner / best

    # vs_baseline: speedup over the baseline implementation — the
    # straightforward XLA-fused jnp composition of the 11 reference
    # kernels, measured at 1.31e9 points/s/chip on this config/chip
    # (BASELINE.md; the reference itself publishes no numbers)
    baseline_pts_per_s = 1.31e9
    if workload == "azov_mask":
        out = {
            "metric": "sw_step_wet_points_per_sec_per_chip",
            "value": round(wet_points * n_inner / best, 1),
            "unit": "wet points/s",
            "vs_baseline": round(pts_per_s / baseline_pts_per_s, 4),
            "total_points_per_sec": round(pts_per_s, 1),
            "wet_fraction": round(wet_points / points, 4),
        }
    else:
        out = {
            "metric": "sw_step_points_per_sec_per_chip",
            "value": round(pts_per_s, 1),
            "unit": "points/s",
            "vs_baseline": round(pts_per_s / baseline_pts_per_s, 4),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "default")
