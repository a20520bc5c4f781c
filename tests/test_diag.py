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


def test_calendar():
    from ocean_model_arch_tpu.utils.calendar import model_time

    t = model_time(0, 1.0, 2012)
    assert (t.year, t.month, t.day, t.hour, t.minute) == (2012, 1, 1, 0, 0)
    # 86400 one-second steps = Jan 2nd
    t = model_time(86400, 1.0, 2012)
    assert (t.year, t.month, t.day) == (2012, 1, 2)
    # 60 days in non-leap mode: Jan(31) + Feb(28) -> Mar 2
    t = model_time(60 * 86400, 1.0, 2013, yr_type=0)
    assert (t.year, t.month, t.day) == (2013, 3, 2)
    # leap mode: 2012 is divisible by 4 -> Feb has 29 -> Mar 1
    t = model_time(60 * 86400, 1.0, 2012, yr_type=1)
    assert (t.year, t.month, t.day) == (2012, 3, 1)
    # year rollover with leap calendar
    t = model_time(366 * 86400, 1.0, 2012, yr_type=1)
    assert (t.year, t.month, t.day) == (2013, 1, 1)
    t = model_time(365 * 86400, 1.0, 2013, yr_type=0)
    assert (t.year, t.month, t.day) == (2014, 1, 1)
    assert "2014-01-01" in t.stamp()


def test_profiling_helpers():
    import jax.numpy as jnp

    from ocean_model_arch_tpu.utils.profiling import (comm_fraction_estimate,
                                                      time_fn)
    import jax
    f = jax.jit(lambda x: (x * 2).sum())
    compile_s, steady_s = time_fn(f, jnp.ones((64, 64)), reps=3)
    assert compile_s > 0 and steady_s > 0
    assert comm_fraction_estimate(1.0, 1.0) == 0.0
    assert abs(comm_fraction_estimate(2.0, 1.0) - 0.5) < 1e-12
