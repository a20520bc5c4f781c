"""Bipolar (2D-metrics) envelope probes on the chip: tile size and
chaining depth for the small BS-extent domain (launch-amortization
levers), plus the Azov-size fast2d compile attempt (the pre-fast2d
kernel hangs the remote Mosaic service at that size — BASELINE.md).

Usage: python scripts/bipolar_probe.py [variant ...]
Variants: bs64x2 bs64x4 bs320x2 bs320x4 azov64x2
"""

import dataclasses
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from ocean_model_arch_tpu.utils.cache import enable_compilation_cache


def bench(name, nx, ny, tx, spc, mask="frame", n_inner=2000, windows=3,
          vmem=None, spl=1):
    from ocean_model_arch_tpu.config import (ModelConfig, Precision,
                                             SWConfig,
                                             basinpar_as250m_test)
    from ocean_model_arch_tpu.core.grid import build_grid
    from ocean_model_arch_tpu.core.masks import frame_of_land_mask
    from ocean_model_arch_tpu.model.fused import FusedSWModel
    from ocean_model_arch_tpu.model.init import init_ocean_state

    basin = dataclasses.replace(
        basinpar_as250m_test(), nx=nx, ny=ny, dxst=0.05, dyst=0.04,
        rlon=27.525, rlat=40.94, curve_grid=2)
    cfg = ModelConfig(basin=basin, sw=SWConfig(use_tracers=0),
                      precision=Precision.f32())
    if mask == "azov":
        from ocean_model_arch_tpu.io.mask_io import read_mask
        int_mask = read_mask("data/AS/maskAzovCor.txt", nx, ny)
    else:
        int_mask = frame_of_land_mask(nx, ny)
    grid = build_grid(basin, int_mask, precision=cfg.precision)
    state = init_ocean_state(grid, cfg)
    fm = FusedSWModel(grid, cfg, 1.0, tx=tx, static_rslu=True,
                      steps_per_call=spc, vmem_limit_bytes=vmem)
    assert fm.fast2d
    carry = fm.pack(state)
    run = jax.jit(lambda c: fm.run_steps(c, n_inner))
    t0 = time.perf_counter()
    carry, ok = run(carry)
    ok = bool(ok)
    comp = time.perf_counter() - t0
    assert ok, name
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        carry, ok = run(carry)
        good = bool(ok)
        best = min(best, time.perf_counter() - t0)
        assert good, name
    ms = best / n_inner * 1e3
    print(f"{name:10s} {ms:.4f} ms/step  "
          f"{nx * ny / ms * 1e3 / 1e9:6.2f} Gpts/s "
          f"(first-call {comp:.0f}s)", flush=True)


VARIANTS = {
    "bs64x2": dict(nx=289, ny=163, tx=64, spc=2),
    "bs64x4": dict(nx=289, ny=163, tx=64, spc=4),
    "bs320x2": dict(nx=289, ny=163, tx=320, spc=2),
    "bs320x4": dict(nx=289, ny=163, tx=320, spc=4),
    "azov64x2": dict(nx=1525, ny=1115, tx=64, spc=2, mask="azov"),
    "azov32x2v": dict(nx=1525, ny=1115, tx=32, spc=2, mask="azov",
                      vmem=100 * 1024 * 1024),
    "azov64x1v": dict(nx=1525, ny=1115, tx=64, spc=1, mask="azov",
                      vmem=100 * 1024 * 1024),
    "azov64x2v": dict(nx=1525, ny=1115, tx=64, spc=2, mask="azov",
                      vmem=100 * 1024 * 1024),
    "azov64x2v8": dict(nx=1525, ny=1115, tx=64, spc=2, mask="azov",
                       vmem=80 * 1024 * 1024),
    "azov64x2v6": dict(nx=1525, ny=1115, tx=64, spc=2, mask="azov",
                       vmem=64 * 1024 * 1024),
    "azov64x2v5": dict(nx=1525, ny=1115, tx=64, spc=2, mask="azov",
                       vmem=48 * 1024 * 1024),
    "azov96x2v8": dict(nx=1525, ny=1115, tx=96, spc=2, mask="azov",
                       vmem=80 * 1024 * 1024),
    "azov64x2v4": dict(nx=1525, ny=1115, tx=64, spc=2, mask="azov",
                       vmem=40 * 1024 * 1024),
    "azov128x2v48": dict(nx=1525, ny=1115, tx=128, spc=2, mask="azov",
                         vmem=48 * 1024 * 1024),
    "azov128x2v64": dict(nx=1525, ny=1115, tx=128, spc=2, mask="azov",
                         vmem=64 * 1024 * 1024),
    "azov256x2v64": dict(nx=1525, ny=1115, tx=256, spc=2, mask="azov",
                         vmem=64 * 1024 * 1024),
    "azov128x2v4": dict(nx=1525, ny=1115, tx=128, spc=2, mask="azov",
                        vmem=40 * 1024 * 1024),
    "azov128x2v36": dict(nx=1525, ny=1115, tx=128, spc=2, mask="azov",
                         vmem=36 * 1024 * 1024),
    "azov192x2v4": dict(nx=1525, ny=1115, tx=192, spc=2, mask="azov",
                        vmem=40 * 1024 * 1024),
    "azov192x2v48": dict(nx=1525, ny=1115, tx=192, spc=2, mask="azov",
                         vmem=48 * 1024 * 1024),
    "azov64x2v3": dict(nx=1525, ny=1115, tx=64, spc=2, mask="azov",
                       vmem=32 * 1024 * 1024),
}


def main():
    enable_compilation_cache()
    for n in sys.argv[1:] or list(VARIANTS):
        try:
            bench(n, **VARIANTS[n])
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{n:10s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
