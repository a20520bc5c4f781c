"""Halo-overlap accounting + weak-scaling harness (diag/scaling.py) —
the BASELINE.json metrics beyond points/s/chip, exercised on the virtual
8-device CPU mesh. The reference's analog is the sync-phase share of the
mpp_finalize timer table (mpp.f90:272-341)."""

import numpy as np

from ocean_model_arch_tpu.config import (ModelConfig, Precision, SWConfig,
                                         basinpar_flat)
from ocean_model_arch_tpu.core.grid import build_grid
from ocean_model_arch_tpu.core.masks import frame_of_land_mask
from ocean_model_arch_tpu.diag.scaling import (expected_halo_bytes_per_step,
                                               halo_bytes_per_step,
                                               halo_overlap_report,
                                               weak_scaling)
from ocean_model_arch_tpu.model.fused_sharded2d import FusedSharded2DModel


def _model(px, py, nx=64, ny=160, spc=2, tracers=0):
    basin = basinpar_flat(nx, ny, curve_grid=1, rlon=27.5, rlat=41.0)
    cfg = ModelConfig(
        basin=basin,
        sw=SWConfig(use_tracers=int(tracers > 0), tracer_num=tracers),
        precision=Precision.f32())
    grid = build_grid(basin, frame_of_land_mask(nx, ny),
                      precision=cfg.precision)
    return FusedSharded2DModel(grid, cfg, 1.0, px, py, tx=8,
                               interpret=True, steps_per_call=spc)


def test_halo_bytes_match_analytic_2d_mesh():
    fs = _model(2, 2)
    got = halo_bytes_per_step(fs)
    assert got == expected_halo_bytes_per_step(fs), \
        (got, expected_halo_bytes_per_step(fs))
    assert got > 0


def test_halo_bytes_match_analytic_x_only_with_tracers():
    fs = _model(4, 1, tracers=2)
    got = halo_bytes_per_step(fs)
    assert got == expected_halo_bytes_per_step(fs)


def test_halo_bytes_scale_with_chaining():
    b1 = halo_bytes_per_step(_model(2, 2, spc=1))
    b2 = halo_bytes_per_step(_model(2, 2, spc=2))
    # spc=2 widens the margins (8 stays 8: margin_for(2)=8) but halves
    # exchanges per step -> strictly fewer bytes per step
    assert b2 < b1


def test_halo_overlap_report_fields():
    rep = halo_overlap_report(_model(2, 2), t_step_sharded=1e-3)
    assert rep["collective_bytes_per_step"] > 0
    assert 0.0 <= rep["comm_fraction_bound"] <= 1.0
    assert rep["comm_seconds_per_step_bound"] == \
        rep["collective_bytes_per_step"] / (
            rep["ici_link_GBps_assumed"] * 1e9)


def test_weak_scaling_harness_fused_path():
    # interpret-mode Pallas on CPU is slow; tiny shards + few steps.
    # This validates the HARNESS (it must run unchanged on real meshes);
    # CPU timings carry no TPU meaning, so no efficiency assertion.
    rep = weak_scaling([(1, 1), (2, 1), (2, 2)], nx_loc=32, ny_loc=64,
                       n_inner=4, windows=1, tx=8, path="fused")
    assert rep["path"] == "fused"
    assert len(rep["rows"]) == 3
    assert rep["rows"][0]["devices"] == 1
    assert rep["rows"][2]["collective_bytes_per_step"] > 0
    for r in rep["rows"]:
        assert r["step_seconds"] > 0
        assert r["points"] == 32 * r["mesh"][0] * 64 * r["mesh"][1]


def test_weak_scaling_harness_jnp_path_on_cpu():
    # 'auto' picks the portable jnp step off-TPU: compiled natively, so
    # the virtual mesh exercises REAL single-process XLA collectives
    rep = weak_scaling([(1, 1), (2, 2)], nx_loc=32, ny_loc=64,
                       n_inner=4, windows=1)
    assert rep["path"] == "jnp"
    assert rep["rows"][1]["devices"] == 4
    assert all(r["step_seconds"] > 0 for r in rep["rows"])
