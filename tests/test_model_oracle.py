"""Whole-model composition validation: make_step vs the loop oracle.

The per-kernel oracle tests (test_kernels_vs_oracle.py) validate each
kernel in isolation; this pins the *composition* — the 11-stage order of
expl_shallow_water (shallow_water.f90:22-94) + expl_tracer
(tracer.f90:33-62), which time level feeds which kernel, and the
hh_shift/hh_init end-of-step sequence — by scanning a literal loop
implementation of one full step for many steps on a random masked basin
and asserting f64 agreement with the jitted model step.
"""

import dataclasses

import jax
import numpy as np
import pytest

from ocean_model_arch_tpu.config import (ModelConfig, Precision, SWConfig,
                                         basinpar_flat)
from ocean_model_arch_tpu.core import masks as mk
from ocean_model_arch_tpu.core.grid import build_grid
from ocean_model_arch_tpu.model.init import init_ocean_state
from ocean_model_arch_tpu.model.step import make_step

import oracle as orc

NX, NY = 20, 16
N_STEPS = 40
TAU = 10.0


def _random_masked_basin(seed=3):
    rng = np.random.RandomState(seed)
    int_mask = mk.frame_of_land_mask(NX, NY)
    interior = rng.rand(NX - 4, NY - 4) < 0.75   # 0 = water in int masks
    int_mask[2:-2, 2:-2] = (~interior).astype(np.int32)
    return int_mask


@pytest.fixture(scope="module")
def setup():
    basin = basinpar_flat(NX, NY)
    prec = Precision.f64()
    cfg = ModelConfig(basin=basin,
                      sw=SWConfig(use_tracers=1, tracer_num=2),
                      precision=prec)
    grid = build_grid(basin, _random_masked_basin(), precision=prec)
    state = init_ocean_state(grid, cfg)
    # exercise the viscosity and Rayleigh-dissipation paths the reference's
    # init quirks keep at zero: constant mu, random small r_diss
    rng = np.random.RandomState(11)
    state = dataclasses.replace(
        state,
        mu=np.full((NX, NY), 40.0),
        r_diss=np.abs(1e-6 * rng.randn(NX, NY)).astype(np.float32))
    return grid, cfg, state


def _np_state(state, n_tracers):
    st = {
        "ssh": np.asarray(state.ssh), "sshn": np.asarray(state.sshn),
        "sshp": np.asarray(state.sshp),
        "u": np.asarray(state.ubrtr), "un": np.asarray(state.ubrtrn),
        "up": np.asarray(state.ubrtrp),
        "v": np.asarray(state.vbrtr), "vn": np.asarray(state.vbrtrn),
        "vp": np.asarray(state.vbrtrp),
        "rhsx": np.asarray(state.rhsx), "rhsy": np.asarray(state.rhsy),
        "rhsx_adv": np.asarray(state.rhsx_adv),
        "rhsy_adv": np.asarray(state.rhsy_adv),
        "rhsx_dif": np.asarray(state.rhsx_dif),
        "rhsy_dif": np.asarray(state.rhsy_dif),
        "mu": np.asarray(state.mu), "str_t": np.asarray(state.str_t),
        "str_s": np.asarray(state.str_s), "vort": np.asarray(state.vort),
        "r_diss": np.asarray(state.r_diss),
    }
    for f in ("hhq", "hhq_p", "hhq_n", "hhu", "hhu_p", "hhu_n",
              "hhv", "hhv_p", "hhv_n", "hhh", "hhh_p", "hhh_n"):
        st[f] = np.asarray(getattr(state, f))
    st["ff"] = [np.asarray(state.ff[k]) for k in range(n_tracers)]
    st["ffp"] = [np.asarray(state.ffp[k]) for k in range(n_tracers)]
    st["ffn"] = [np.asarray(state.ffn[k]) for k in range(n_tracers)]
    st["flux_x"] = np.asarray(state.flux_x)
    st["flux_y"] = np.asarray(state.flux_y)
    return st


def _grid_dicts(grid):
    masks = {k: np.asarray(getattr(grid, k))
             for k in ("lu", "luu", "luh", "llu", "llv", "lcu", "lcv")}
    mets = {k: np.asarray(getattr(grid, k))
            for k in ("dx", "dy", "dxt", "dyt", "dxh", "dyh",
                      "dxb", "dyb", "rlh_s")}
    return masks, mets


def _oracle_cfg(cfg):
    return {"ffs": cfg.sw.full_free_surface, "trans": cfg.sw.trans_terms,
            "ksw": cfg.sw.ksw_lat, "ts": cfg.sw.time_smooth,
            "tracer_num": cfg.sw.tracer_num}


def test_whole_model_composition(setup):
    grid, cfg, state = setup
    step = jax.jit(make_step(grid, cfg))

    masks, mets = _grid_dicts(grid)
    ost = _np_state(state, cfg.sw.tracer_num)
    ocfg = _oracle_cfg(cfg)
    h_r = np.asarray(grid.hhq_rest)

    st = state
    for _ in range(N_STEPS):
        st, ok = step(st, np.float64(TAU))
        ost = orc.o_model_step(ost, masks, mets, h_r, ocfg, TAU)
    assert bool(ok)

    checks = [
        ("ssh", np.asarray(st.ssh), ost["ssh"]),
        ("sshp", np.asarray(st.sshp), ost["sshp"]),
        ("u", np.asarray(st.ubrtr), ost["u"]),
        ("up", np.asarray(st.ubrtrp), ost["up"]),
        ("v", np.asarray(st.vbrtr), ost["v"]),
        ("vp", np.asarray(st.vbrtrp), ost["vp"]),
        ("hhu", np.asarray(st.hhu), ost["hhu"]),
        ("hhv_p", np.asarray(st.hhv_p), ost["hhv_p"]),
        ("hhh", np.asarray(st.hhh), ost["hhh"]),
        ("vort", np.asarray(st.vort), ost["vort"]),
        ("str_t", np.asarray(st.str_t), ost["str_t"]),
        ("ff0", np.asarray(st.ff[0]), ost["ff"][0]),
        ("ff1", np.asarray(st.ff[1]), ost["ff"][1]),
        ("ffp1", np.asarray(st.ffp[1]), ost["ffp"][1]),
        ("flux_x", np.asarray(st.flux_x), ost["flux_x"]),
    ]
    # per-kernel agreement is 1e-12/1e-13 (test_kernels_vs_oracle); over
    # 40 coupled steps round-off growth reaches ~1e-10 relative. A
    # composition bug (wrong stage order / time level) shows as O(1e-3+)
    # within a few steps (see the mutation test below).
    for name, got, want in checks:
        np.testing.assert_allclose(got, want, rtol=3e-9, atol=1e-9,
                                   err_msg=f"field {name} diverged")
    # the run must be non-trivial (waves actually propagating)
    assert np.abs(np.asarray(st.ubrtr)).max() > 1e-6


def test_composition_mutation_is_caught(setup, monkeypatch):
    """Sensitivity check: a composition mutation — dropping stage 2
    (hh_update), so stage 7's momentum update consumes stale new-level
    depths — must diverge well above the pass tolerance within a few
    steps. Guards against the oracle being too weak to catch stage-order
    or time-level-binding bugs."""
    grid, cfg, state = setup
    step = jax.jit(make_step(grid, cfg))

    monkeypatch.setattr(orc, "o_hh_update", lambda *a: a[-4:])

    masks, mets = _grid_dicts(grid)
    ost = _np_state(state, cfg.sw.tracer_num)
    ocfg = _oracle_cfg(cfg)
    h_r = np.asarray(grid.hhq_rest)

    st = state
    for _ in range(8):
        st, _ = step(st, np.float64(TAU))
        ost = orc.o_model_step(ost, masks, mets, h_r, ocfg, TAU)
    err = np.abs(np.asarray(st.ubrtr) - ost["u"]).max()
    assert err > 1e-8, f"mutation not detected (err={err})"
