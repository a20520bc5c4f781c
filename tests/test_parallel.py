"""Parallel layer tests: analytic i*j halo-exchange verification (the
reference's sync_test, shared/mpp/syncborder_block2D_gen_test.fi, done for
every mesh shape), and decomposition invariance of the full model step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from ocean_model_arch_tpu.config import (ModelConfig, Precision, SWConfig,
                                         basinpar_flat)
from ocean_model_arch_tpu.core.grid import build_grid
from ocean_model_arch_tpu.core.masks import frame_of_land_mask
from ocean_model_arch_tpu.model.init import init_ocean_state
from ocean_model_arch_tpu.model.sharded import make_sharded_step, prepare
from ocean_model_arch_tpu.model.step import make_step, run_steps
from ocean_model_arch_tpu.parallel.domain import crop_state
from ocean_model_arch_tpu.parallel.halo import ShardHalo
from ocean_model_arch_tpu.parallel.mesh import make_mesh, shard_tree

MESHES = [(2, 1), (1, 2), (2, 2), (4, 2), (2, 4), (8, 1)]


@pytest.mark.parametrize("px,py", MESHES)
@pytest.mark.parametrize("periodic", [False, True])
def test_halo_exchange_ij(px, py, periodic):
    """Every halo cell must equal the analytic global value i*j after the
    exchange (decomposition-independent, like sync_test :10-97)."""
    nx, ny = 16 * px, 8 * py
    i = np.arange(1, nx + 1)[:, None]
    j = np.arange(1, ny + 1)[None, :]
    f_global = (i * j).astype(np.float64)

    mesh = make_mesh(px, py)
    hp = ShardHalo(px, py, periodic_x=periodic, periodic_y=periodic)

    ex_sharded = jax.jit(jax.shard_map(
        hp.ex, mesh=mesh, in_specs=P("x", "y"),
        out_specs=P("x", "y"), check_vma=False))

    f = jax.device_put(f_global,
                       jax.NamedSharding(mesh, P("x", "y")))
    out = np.asarray(ex_sharded(f))  # (nx + px*4, ny + py*4) tiled shards

    lx, ly = nx // px, ny // py
    h = 2
    # reconstruct each shard's padded block and verify against the global
    # analytic field with zero (or wrapped) out-of-domain values
    def expected(mi, nj):
        if periodic:
            mi, nj = mi % nx, nj % ny
            return float((mi + 1) * (nj + 1))
        if 0 <= mi < nx and 0 <= nj < ny:
            return float((mi + 1) * (nj + 1))
        return 0.0

    out = out.reshape(px, lx + 2 * h, py, ly + 2 * h).transpose(0, 2, 1, 3)
    for bi in range(px):
        for bj in range(py):
            blk = out[bi, bj]
            for ii in range(lx + 2 * h):
                for jj in range(ly + 2 * h):
                    gm = bi * lx + ii - h
                    gn = bj * ly + jj - h
                    assert blk[ii, jj] == expected(gm, gn), (
                        (px, py, periodic, bi, bj, ii, jj))


@pytest.fixture(scope="module")
def flat_case():
    basin = basinpar_flat(66, 50)
    cfg = ModelConfig(basin=basin, sw=SWConfig(use_tracers=1, tracer_num=1),
                      precision=Precision.f64())
    grid = build_grid(basin, frame_of_land_mask(66, 50))
    state = init_ocean_state(grid, cfg)
    ref, ok = run_steps(jax.jit(make_step(grid, cfg)), state, 1.0, 40)
    assert bool(ok)
    return grid, cfg, state, ref


@pytest.mark.parametrize("px,py", MESHES)
def test_step_decomposition_invariance(flat_case, px, py):
    """1x1 vs any mesh: the sharded trajectory must match the
    single-device one to round-off (the reference's block abstraction
    guarantees this by construction; here it validates the halo schedule)."""
    grid, cfg, state, ref = flat_case
    mesh = make_mesh(px, py)
    gs, ss = prepare(grid, state, mesh)
    stepN = make_sharded_step(gs, cfg, mesh, n_inner=40)
    out, ok = stepN(ss, 1.0)
    assert bool(ok)
    out = crop_state(out, 66, 50)
    for name in ("ssh", "sshp", "ubrtr", "vbrtr", "hhq", "hhu"):
        np.testing.assert_allclose(np.asarray(getattr(out, name)),
                                   np.asarray(getattr(ref, name)),
                                   rtol=0, atol=1e-12, err_msg=name)
    np.testing.assert_allclose(np.asarray(out.ff), np.asarray(ref.ff),
                               rtol=0, atol=1e-12)


@pytest.fixture(scope="module")
def island_case():
    """Random-island masked basin — shard seams cross coastlines (the
    risky case the all-wet fixture misses)."""
    basin = basinpar_flat(64, 48)
    cfg = ModelConfig(basin=basin, sw=SWConfig(use_tracers=1, tracer_num=1),
                      precision=Precision.f64())
    mask = frame_of_land_mask(64, 48)
    rng = np.random.RandomState(7)
    mask[2:-2, 2:-2] |= (rng.rand(60, 44) < 0.15).astype(np.int32)
    grid = build_grid(basin, mask)
    state = init_ocean_state(grid, cfg)
    ref, ok = run_steps(jax.jit(make_step(grid, cfg)), state, 1.0, 40)
    assert bool(ok)
    return grid, cfg, state, ref


@pytest.mark.parametrize("px,py", MESHES)
def test_masked_decomposition_invariance(island_case, px, py):
    """Decomposition invariance on a coastline-crossing mask (the
    syncborder_block2D_gen_test.fi spirit: exactness under any split)."""
    grid, cfg, state, ref = island_case
    mesh = make_mesh(px, py)
    gs, ss = prepare(grid, state, mesh)
    stepN = make_sharded_step(gs, cfg, mesh, n_inner=40)
    out, ok = stepN(ss, 1.0)
    assert bool(ok)
    out = crop_state(out, 64, 48)
    for name in ("ssh", "sshp", "ubrtr", "vbrtr", "hhq", "hhu"):
        np.testing.assert_allclose(np.asarray(getattr(out, name)),
                                   np.asarray(getattr(ref, name)),
                                   rtol=0, atol=1e-12, err_msg=name)
    np.testing.assert_allclose(np.asarray(out.ff), np.asarray(ref.ff),
                               rtol=0, atol=1e-12)


def test_static_halo_exchanges_hoisted(flat_case):
    """The per-step scan body must carry no collectives for static grid
    fields (they are pre-exchanged via ShardHalo.cache_statics), and the
    remaining per-step exchanges must be deduped by field — the analog of
    the reference's once-per-step sync lists (sw_interface.f90:330-381)."""
    grid, cfg, state, _ = flat_case
    mesh = make_mesh(2, 2)
    gs, ss = prepare(grid, state, mesh)
    step = make_sharded_step(gs, cfg, mesh, n_inner=4)
    txt = jax.jit(lambda s, t: step(s, t)).lower(ss, 1.0).as_text()
    i = txt.find("stablehlo.while")
    assert i > 0
    pre = txt[:i].count("collective_permute")
    body = txt[i:].count("collective_permute")
    # 12 static grid fields x 4 permutes hoisted out of the loop
    assert pre >= 48, pre
    # deduped per-step exchanges: 20 fields x 4 permutes (was 32 x 4
    # before memoization; a regression past 24 means dedup/hoist broke)
    assert body <= 24 * 4, body


def test_periodic_channel_wraps():
    """A periodic-x channel: a bump advected by the gravity wave must wrap
    around the seam without reflection artifacts at the x edges."""
    import dataclasses
    basin = dataclasses.replace(basinpar_flat(64, 34), periodicity_x=1)
    cfg = ModelConfig(basin=basin, precision=Precision.f64())
    mask = np.zeros((64, 34), np.int32)
    mask[:, :2] = 1
    mask[:, -2:] = 1  # walls only in y; open (periodic) in x
    grid = build_grid(basin, mask)
    state = init_ocean_state(grid, cfg)
    step = jax.jit(make_step(grid, cfg))
    st, ok = run_steps(step, state, 1.0, 300)
    assert bool(ok)
    s = np.asarray(st.ssh)
    assert np.isfinite(s).all()
    # field reached the seam columns (periodic transport happened)
    assert np.abs(s[0, 5:-5]).max() > 1e-6


def test_ex_batch_matches_per_field():
    """ShardHalo.ex_batch (one stacked strip collective per direction —
    the batched sync-list form) produces bitwise the same margined
    fields as per-field ex()."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ocean_model_arch_tpu.parallel.halo import ShardHalo
    from ocean_model_arch_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(2, 2, jax.devices()[:4])
    rng = np.random.RandomState(7)
    fields = [jax.device_put(rng.randn(16, 24).astype(np.float32),
                             NamedSharding(mesh, P("x", "y")))
              for _ in range(3)]

    def batched(*fs):
        hp = ShardHalo(2, 2)
        hp.ex_batch(list(fs))
        return tuple(hp.ex(f) for f in fs)       # memo hits

    def single(*fs):
        hp = ShardHalo(2, 2)
        return tuple(hp.ex(f) for f in fs)

    run_b = jax.jit(jax.shard_map(
        batched, mesh=mesh, in_specs=(P("x", "y"),) * 3,
        out_specs=(P("x", "y"),) * 3, check_vma=False))
    run_s = jax.jit(jax.shard_map(
        single, mesh=mesh, in_specs=(P("x", "y"),) * 3,
        out_specs=(P("x", "y"),) * 3, check_vma=False))
    for a, b in zip(run_b(*fields), run_s(*fields)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
