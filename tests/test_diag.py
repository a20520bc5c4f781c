"""Diagnostics: memory report + per-kernel microbench run on a tiny case."""

import jax
import numpy as np

from ocean_model_arch_tpu.config import (ModelConfig, Precision, SWConfig,
                                         basinpar_flat)
from ocean_model_arch_tpu.core.grid import build_grid
from ocean_model_arch_tpu.core.masks import frame_of_land_mask
from ocean_model_arch_tpu.diag import kernel_bench, memory
from ocean_model_arch_tpu.model.init import init_ocean_state


def test_memory_report():
    basin = basinpar_flat(40, 30)
    cfg = ModelConfig(basin=basin, sw=SWConfig(use_tracers=1, tracer_num=1),
                      precision=Precision.f64())
    grid = build_grid(basin, frame_of_land_mask(40, 30))
    state = init_ocean_state(grid, cfg)
    rep = memory.report(state, grid)
    assert "TOTAL" in rep and "MB" in rep
    fb = memory.field_bytes(state)
    assert fb["ssh"] == 40 * 30 * 8


def test_kernel_bench_runs():
    basin = basinpar_flat(40, 30)
    cfg = ModelConfig(basin=basin, sw=SWConfig(use_tracers=1, tracer_num=1),
                      precision=Precision.f64())
    grid = build_grid(basin, frame_of_land_mask(40, 30))
    state = init_ocean_state(grid, cfg)
    res = kernel_bench.run(grid, cfg, state)
    assert len(res) >= 13
    assert all(v > 0 for v in res.values())
    table = kernel_bench.format_table(res, 40 * 30)
    assert "sw_update_uv" in table
