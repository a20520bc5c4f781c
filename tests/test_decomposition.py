"""Hilbert curve + weighted decomposition + load-balance diagnostics."""

import os

import numpy as np

from ocean_model_arch_tpu.core.masks import frame_of_land_mask
from ocean_model_arch_tpu.io.mask_io import load_mask
from ocean_model_arch_tpu.parallel import decomposition as dd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_hilbert_curve_roundtrip():
    for order in (1, 2, 3, 5):
        n = 1 << order
        seen = set()
        prev = None
        for d in range(n * n):
            x, y = dd.hilbert_d2xy(order, d)
            assert 0 <= x < n and 0 <= y < n
            assert dd.hilbert_xy2d(order, x, y) == d
            seen.add((x, y))
            if prev is not None:       # curve moves by one cell at a time
                assert abs(x - prev[0]) + abs(y - prev[1]) == 1
            prev = (x, y)
        assert len(seen) == n * n      # space-filling


def test_block_weights_and_land_elision():
    mask = frame_of_land_mask(36, 36)
    mask[2:18, 2:18] = 1               # land quadrant
    dec = dd.block_weights(mask, 4, 4)
    assert dec.weights.sum() == (mask == 0).sum()
    assert dec.n_land_blocks == 4      # the all-land quadrant
    dec = dd.assign_uniform(dec, 2, 2)
    assert (dec.owner[dec.weights == 0] == -1).all()
    assert set(dec.owner[dec.weights > 0]) <= {0, 1, 2, 3}


def test_hilbert_assignment_balances_better():
    """On a mask with very uneven water distribution, Hilbert weighted
    packing must beat the uniform tiling's balance ratio."""
    rng = np.random.RandomState(5)
    mask = frame_of_land_mask(68, 68)
    mask[2:34, 2:66] = 1                   # top half land
    mask[34:66, 2:66] = (rng.rand(32, 64) < 0.3).astype(np.int32)
    dec = dd.block_weights(mask, 8, 8)
    r_uni = dd.assign_uniform(dec, 2, 2).balance_ratio(4)
    r_hil = dd.assign_hilbert(dec, 4).balance_ratio(4)
    assert r_hil < r_uni
    assert r_hil < 1.5


def test_rebalance_powers():
    mask = frame_of_land_mask(36, 36)
    dec = dd.block_weights(mask, 4, 4)
    dec = dd.assign_hilbert(dec, 4)
    w0 = dec.device_weights(4)
    # pretend device 0 is 2x slower -> it should receive less weight
    times = w0.copy()
    times[0] *= 2.0
    dec2 = dd.rebalance_powers(dec, 4, times)
    w1 = dec2.device_weights(4)
    assert w1[0] < w0[0]


def test_black_sea_mesh_report():
    mask = load_mask("data/BS/mask_bs4km.txt", 289, 163, REPO)
    rep = dd.mesh_split_report(mask, 2, 2)
    assert 0.0 < rep["wet_fraction"] < 1.0
    assert rep["balance_ratio"] >= 1.0
    # the realistic coastline is measurably imbalanced on a naive split
    assert rep["balance_ratio"] > 1.02


def test_dump(tmp_path):
    mask = frame_of_land_mask(36, 36)
    dec = dd.assign_uniform(dd.block_weights(mask, 4, 4), 2, 2)
    p = tmp_path / "decomposition.txt"
    dd.dump_decomposition(dec, str(p))
    lines = p.read_text().splitlines()
    assert lines[0] == "4 4"
    assert len(lines) == 1 + 16


def test_weighted_x_cuts_improve_balance():
    """Weighted (equal-wet) cut lines beat the naive even split on the
    real Black Sea and Azov coastlines (the applied form of the weighted
    block assignment, decomposition.f90:614-669)."""
    for path, nx, ny, px, py in [("data/BS/mask_bs4km.txt", 289, 163, 2, 4),
                                 ("data/AS/maskAzovCor.txt", 1525, 1115,
                                  4, 2)]:
        mask = load_mask(path, nx, ny, REPO)
        uniform_edges = np.linspace(0, nx, px + 1).astype(np.int64)
        r_uni = dd.x_band_balance(mask, uniform_edges, py)
        edges = dd.weighted_x_edges(mask, px)
        r_w = dd.x_band_balance(mask, edges, py)
        assert r_w < r_uni, (path, r_w, r_uni)
        assert edges[0] == 0 and edges[-1] == nx


def test_weighted_y_cuts_improve_balance():
    """Weighted cuts in BOTH axes beat x-only weighting on the real
    coastlines at 2x4 / 4x2 meshes (the reference balances its block
    grid in 2D, decomposition.f90:532-612)."""
    for path, nx, ny in [("data/BS/mask_bs4km.txt", 289, 163),
                         ("data/AS/maskAzovCor.txt", 1525, 1115)]:
        mask = load_mask(path, nx, ny, REPO)
        for px, py in [(2, 4), (4, 2)]:
            xe = dd.weighted_x_edges(mask, px)
            ye_uni = np.linspace(0, ny, py + 1).astype(np.int64)
            ye_w = dd.weighted_y_edges(mask, py)
            r_xonly = dd.xy_balance(mask, xe, ye_uni)
            r_xy = dd.xy_balance(mask, xe, ye_w)
            assert ye_w[0] == 0 and ye_w[-1] == ny
            assert r_xy < r_xonly, (path, px, py, r_xy, r_xonly)


def test_choose_mesh_dims():
    mask = load_mask("data/BS/mask_bs4km.txt", 289, 163, REPO)
    px, py = dd.choose_mesh_dims(mask, 8)
    assert px * py == 8
    # the chosen split's weighted balance is no worse than the naive 8x1
    edges = dd.weighted_x_edges(mask, px)
    assert dd.x_band_balance(mask, edges, py) <= dd.x_band_balance(
        mask, np.linspace(0, 289, 9).astype(np.int64), 1) + 1e-9


def test_decomposition_file_roundtrip(tmp_path):
    """decomposition.txt dump -> read_decomposition -> identical blocks,
    and cuts_from_decomposition recovers shard cut lines from a regular
    grid assignment (parallel.par mod_decomposition=2; the reference
    only WRITES this format, decomposition.f90:895-909)."""
    mask = load_mask("data/BS/mask_bs4km.txt", 289, 163, REPO)
    dec = dd.block_weights(mask, 8, 4)
    dec = dd.assign_uniform(dec, 4, 2)
    p = str(tmp_path / "decomposition.txt")
    dd.dump_decomposition(dec, p)
    back = dd.read_decomposition(p)
    assert (back.bnx, back.bny) == (dec.bnx, dec.bny)
    np.testing.assert_array_equal(back.weights, dec.weights)
    np.testing.assert_array_equal(back.owner, dec.owner)
    np.testing.assert_array_equal(back.x_edges, dec.x_edges)
    np.testing.assert_array_equal(back.y_edges, dec.y_edges)

    xe, ye = dd.cuts_from_decomposition(back, 4, 2)
    np.testing.assert_array_equal(xe, dec.x_edges[::2])
    np.testing.assert_array_equal(ye, dec.y_edges[::2])

    # irregular (Hilbert) assignments cannot map to SPMD rectangles
    dec16 = dd.block_weights(mask, 16, 16)
    hil = dd.assign_hilbert(dec16, 8)
    p2 = str(tmp_path / "hilbert.txt")
    dd.dump_decomposition(hil, p2)
    import pytest
    with pytest.raises(ValueError, match="regular grid"):
        dd.cuts_from_decomposition(dd.read_decomposition(p2), 4, 2)


def test_read_reference_format_decomposition(tmp_path):
    """The reference's own decomposition.txt (decomposition.f90:898-904:
    header 'bnx bny pnx pny', rows 'm n proc weight', 1-based, no
    edges) parses with edges reconstructed from the uniform interior
    split, and malformed rows raise instead of being skipped."""
    import pytest
    nx, ny = 104, 54           # interior 100 x 50
    p = str(tmp_path / "decomposition.txt")
    with open(p, "w") as f:
        # Fortran list-directed output: leading blanks, real8 weights
        f.write("  4  2  2  2\n")
        for m in range(1, 5):
            for n in range(1, 3):
                proc = (m - 1) // 2 * 2 + (n - 1)
                f.write(f"  {m}  {n}  {proc}  "
                        f"{float(10 * m + n):.16f}\n")
    dec = dd.read_decomposition(p, nx=nx, ny=ny)
    assert (dec.bnx, dec.bny) == (4, 2)
    np.testing.assert_array_equal(dec.x_edges, [2, 27, 52, 77, 102])
    np.testing.assert_array_equal(dec.y_edges, [2, 27, 52])
    # NON-divisible interior must follow the reference's iterated
    # floor(remaining/blocks_left) split (larger blocks LAST:
    # 10 over 4 = 2,2,3,3), not a linspace split (2,3,2,3)
    p10 = str(tmp_path / "ref10.txt")
    with open(p10, "w") as f:
        f.write("4 2 1 1\n")
        for m in range(1, 5):
            for n in range(1, 3):
                f.write(f"{m} {n} 0 1.0\n")
    d10 = dd.read_decomposition(p10, nx=14, ny=14)
    np.testing.assert_array_equal(d10.x_edges, [2, 4, 6, 9, 12])
    # fractional (compute-power-scaled) weights survive
    assert d10.weights[0, 0] == 1.0
    # out-of-range 1-based indices raise instead of wrapping
    pbad = str(tmp_path / "refbad.txt")
    with open(pbad, "w") as f:
        f.write("4 2 1 1\n")
        f.write("0 1 0 1.0\n")
    with pytest.raises(ValueError, match="outside the 1-based"):
        dd.read_decomposition(pbad, nx=14, ny=14)
    assert dec.owner[0, 0] == 0 and dec.owner[3, 1] == 3
    assert dec.weights[2, 1] == 32
    # regular 2x2-blocks-per-proc assignment -> cut lines recover
    xe, ye = dd.cuts_from_decomposition(dec, 2, 2)
    np.testing.assert_array_equal(xe, [2, 52, 102])

    # without nx/ny the edges cannot be reconstructed
    with pytest.raises(ValueError, match="pass nx/ny"):
        dd.read_decomposition(p)

    # malformed rows raise (no silent skip)
    p2 = str(tmp_path / "bad.txt")
    with open(p2, "w") as f:
        f.write("2 2\n")
        f.write("0 0 0 10 0 10 5\n")      # 7 columns
    with pytest.raises(ValueError, match="expected 8 columns"):
        dd.read_decomposition(p2)
