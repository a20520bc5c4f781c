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
the static-plane streaming. Round-5 default (auto tx=256, spc=2,
elide_sel/q4/share_prev reductions, 36MB vmem cap): 19.5-19.8 Gpts/s.
"""

import json
import subprocess
import sys
import time

import numpy as np

_CPU_SUB = """
import jax, json
jax.config.update("jax_platforms", "cpu")
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
{body}
"""


def _run_cpu_subprocess(body: str) -> dict:
    """Run a snippet on the virtual 8-device CPU mesh (the axon platform
    pin is process-wide, so multi-device work needs a fresh process) and
    parse the single JSON line it prints."""
    import os
    out = subprocess.run(
        [sys.executable, "-c", _CPU_SUB.format(body=body)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    if out.returncode != 0:
        raise RuntimeError(f"CPU subprocess failed:\n{out.stderr[-3000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def bench_weak_scaling():
    """Weak-scaling efficiency over the virtual 8-device CPU mesh via
    the portable jnp sharded step (real XLA collectives; the same
    harness runs unchanged on real multi-chip TPU meshes, where it
    picks the fused Pallas path — diag/scaling.py)."""
    rep = _run_cpu_subprocess("""
from ocean_model_arch_tpu.diag.scaling import weak_scaling
rep = weak_scaling([(1, 1), (2, 1), (2, 2), (4, 2)],
                   nx_loc=256, ny_loc=256, n_inner=20, windows=3)
print(json.dumps(rep))
""")
    # the virtual mesh timeshares one host's cores, so the honest figure
    # here is WORK-NORMALIZED efficiency (ideal t(N) = N*t(1)); on real
    # multi-chip meshes the same harness reports true weak efficiency
    # (ideal t(N) = t(1)) — diag/scaling.py
    out = {
        "metric": "weak_scaling_efficiency_1_to_8",
        "value": round(rep["efficiency_last"], 4),
        "unit": ("N*t(1)/t(N), work-normalized (shared-core virtual "
                 "mesh), fixed 256x256/dev" if rep["shared_cores"]
                 else "t_step(1 dev) / t_step(N dev), fixed 256x256/dev"),
        "vs_baseline": round(rep["efficiency_last"] / 0.9, 4),
        "path": rep["path"],
        "backend": ("cpu_virtual_8" if rep["shared_cores"]
                    else "device_mesh"),
        "rows": [{"mesh": r["mesh"],
                  "ms_per_step": round(r["step_seconds"] * 1e3, 3),
                  "efficiency": round(r["efficiency"], 4),
                  "efficiency_work_normalized": round(
                      r["efficiency_work_normalized"], 4)}
                 for r in rep["rows"]],
    }
    print(json.dumps(out))


def bench_halo_overlap():
    """Halo-exchange accounting: exact collective bytes/step of the
    fused-sharded step (lowered HLO, virtual 4x2 mesh on the bench
    extents) + the measured margin-exchange overhead of the sharded
    driver at 1x1 (no collectives) vs the plain fused model on the
    chip. The comm bound assumes the stated per-link ICI bandwidth and
    zero overlap — the reference's mpp sync-phase share analog
    (mpp.f90:272-341)."""
    import jax

    from ocean_model_arch_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from ocean_model_arch_tpu.config import (ModelConfig, Precision,
                                             SWConfig, basinpar_as250m_test)
    from ocean_model_arch_tpu.core.grid import build_grid
    from ocean_model_arch_tpu.core.masks import frame_of_land_mask
    from ocean_model_arch_tpu.model.fused import FusedSWModel
    from ocean_model_arch_tpu.model.fused_sharded2d import \
        FusedSharded2DModel
    from ocean_model_arch_tpu.model.init import init_ocean_state

    basin = basinpar_as250m_test()
    cfg = ModelConfig(basin=basin, sw=SWConfig(use_tracers=0),
                      precision=Precision.f32())
    grid = build_grid(basin, frame_of_land_mask(basin.nx, basin.ny),
                      precision=cfg.precision)
    state = init_ocean_state(grid, cfg)
    n_inner = 2000

    from ocean_model_arch_tpu.diag.scaling import time_stepper

    fm = FusedSWModel(grid, cfg, 1.0, tx=64, static_rslu=True,
                      steps_per_call=2)
    t_fused = time_stepper(jax.jit(lambda c: fm.run_steps(c, n_inner)),
                           fm.pack(state), n_inner)
    # tile_guard off: the frame mask is all-wet, so the guard would be
    # pure overhead and the delta would misattribute it (plus the
    # plane-set difference) to the margin exchange
    fs = FusedSharded2DModel(grid, cfg, 1.0, 1, 1, tx=64,
                             steps_per_call=2, tile_guard=False)
    t_1x1 = time_stepper(fs.make_runner(n_inner), fs.pack(state),
                         n_inner)

    rep = _run_cpu_subprocess("""
from ocean_model_arch_tpu.config import (ModelConfig, Precision, SWConfig,
                                         basinpar_as250m_test)
from ocean_model_arch_tpu.core.grid import build_grid
from ocean_model_arch_tpu.core.masks import frame_of_land_mask
from ocean_model_arch_tpu.diag.scaling import halo_bytes_per_step
from ocean_model_arch_tpu.model.fused_sharded2d import FusedSharded2DModel
from ocean_model_arch_tpu.model.init import init_ocean_state
basin = basinpar_as250m_test()
cfg = ModelConfig(basin=basin, sw=SWConfig(use_tracers=0),
                  precision=Precision.f32())
grid = build_grid(basin, frame_of_land_mask(basin.nx, basin.ny),
                  precision=cfg.precision)
fs = FusedSharded2DModel(grid, cfg, 1.0, 4, 2, tx=64, interpret=True,
                         steps_per_call=2)
print(json.dumps({"bytes": halo_bytes_per_step(fs)}))
""")
    ici_gbps = 45.0
    comm_s = rep["bytes"] / (ici_gbps * 1e9)
    # per-device compute time at 4x2 strong scaling of this domain
    t_dev = t_1x1 / 8
    out = {
        "metric": "halo_exchange_accounting",
        "value": round(comm_s / (t_dev + comm_s), 4),
        "unit": "comm fraction bound, 4x2 mesh, zero-overlap worst case",
        "vs_baseline": 0.0,
        "fused_ms_per_step": round(t_fused * 1e3, 4),
        "sharded_1x1_ms_per_step": round(t_1x1 * 1e3, 4),
        "exchange_overhead_fraction": round(
            max(0.0, (t_1x1 - t_fused) / t_1x1), 4),
        "collective_bytes_per_step_4x2": rep["bytes"],
        "ici_link_GBps_assumed": ici_gbps,
        "comm_seconds_per_step_bound": comm_s,
    }
    print(json.dumps(out))


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
    if workload == "bipolar":
        # the 2D-metrics fused variant (bipolar conformal grid,
        # grid_parameters.f90:183) at Black-Sea extents — the small-
        # domain point of the envelope (launch-bound: 256-lane padding
        # for 163 valid columns). Runs through the round-5 fast2d
        # kernel (same fast restructurings, pointwise metric planes).
        import dataclasses
        basin = dataclasses.replace(basin, nx=289, ny=163,
                                    dxst=0.05, dyst=0.04,
                                    rlon=27.525, rlat=40.94,
                                    curve_grid=2)
    elif workload == "bipolar_azov":
        # 2D metrics at PRODUCTION extents (1525x1115, real Azov
        # coastline). Compiles since round 5: fast2d prunes the
        # streamed planes and the fast2d default VMEM cap keeps the
        # remote Mosaic service from crashing (uncapped compiles of
        # this program die with HTTP 500 — BASELINE.md round-5 notes)
        import dataclasses
        basin = dataclasses.replace(basin, curve_grid=2)
    prec = Precision.f32()
    cfg = ModelConfig(basin=basin, sw=SWConfig(use_tracers=0),
                      precision=prec)
    if workload in ("azov_mask", "bipolar_azov"):
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
        fm = FusedSWModel(grid, cfg, 1.0, static_rslu=True,
                          steps_per_call=2)   # tx auto (round-5 sweep)
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
    if not bool(ok):
        raise RuntimeError("stability guard tripped in benchmark")

    # the tunneled chip is timing-noisy: take the best of several
    # windows; barrier by TRANSFERRING the flag (bool()) — on the
    # tunneled platform block_until_ready alone can return before
    # execution completes, which would read as a bogus-fast window.
    # (Not an assert: python -O must not strip the barrier.)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry, ok = run_j(carry)
        good = bool(ok)
        best = min(best, time.perf_counter() - t0)
        if not good:
            raise RuntimeError("stability guard tripped in benchmark")

    points = basin.nx * basin.ny
    pts_per_s = points * n_inner / best

    # vs_baseline: speedup over the baseline implementation — the
    # straightforward XLA-fused jnp composition of the 11 reference
    # kernels, measured at 1.31e9 points/s/chip on this config/chip
    # (BASELINE.md; the reference itself publishes no numbers)
    baseline_pts_per_s = 1.31e9
    if workload in ("azov_mask", "bipolar_azov"):
        # distinct metric name per workload: a 2D-metrics number must
        # not be mistakable for the x-uniform azov_mask headline series
        tag = "" if workload == "azov_mask" else "[bipolar]"
        out = {
            "metric": f"sw_step_wet_points_per_sec_per_chip{tag}",
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
    mode = sys.argv[1] if len(sys.argv) > 1 else "default"
    if mode == "weak_scaling":
        bench_weak_scaling()
    elif mode == "halo_overlap":
        bench_halo_overlap()
    else:
        main(mode)
