"""Mask derivation, metric construction, and .par config parsing tests."""

import numpy as np

from ocean_model_arch_tpu.config import (basinpar_bs4km, basinpar_flat,
                                         load_basinpar, load_parallel,
                                         load_runpar, load_sw)
from ocean_model_arch_tpu.core import masks as mk
from ocean_model_arch_tpu.core import metrics as mt
from ocean_model_arch_tpu.core.constants import (EARTH_ANG_VEL, PIP180_F32,
                                                 RAD_EARTH)


def test_staggered_masks_hand_case():
    # 6x6 with a single 2x2 wet patch at (2:4, 2:4)
    mask = np.ones((6, 6), np.int32)
    mask[2:4, 2:4] = 0
    lu = mk.lu_from_int_mask(mask)
    luh, luu, llu, llv, lcu, lcv = mk.derive_staggered_masks(lu)
    # lcu: both (m,n) and (m+1,n) wet -> only (2,2),(2,3)
    assert lcu.sum() == 2 and lcu[2, 2] == 1 and lcu[2, 3] == 1
    assert lcv.sum() == 2 and lcv[2, 2] == 1 and lcv[3, 2] == 1
    # luu: all 4 wet -> only (2,2)
    assert luu.sum() == 1 and luu[2, 2] == 1
    # luh: any of 4 wet -> 3x3 block at (1:4, 1:4)
    assert luh.sum() == 9
    # llu: either of the x-pair wet -> (1..3, 2..3)
    assert llu.sum() == 6
    assert llv.sum() == 6


def test_cartesian_metrics_regular():
    basin = basinpar_flat(12, 10, dxst=0.1, dyst=0.2)
    xt, yt, xu, yv, geo = mt.build_geo_metrics(basin)
    # xt(m) = rlon + (m - mmm)*dxst, so xt[2] (Fortran m=3) == rlon
    assert abs(xt[2] - basin.rlon) < 1e-12
    assert abs(yt[2] - basin.rlat) < 1e-12
    step = np.float32(0.1) * PIP180_F32 * RAD_EARTH
    np.testing.assert_allclose(geo.dx, step, rtol=1e-7)
    np.testing.assert_allclose(geo.dxt, step, rtol=1e-7)
    stepy = np.float32(0.2) * PIP180_F32 * RAD_EARTH
    np.testing.assert_allclose(geo.dyh, stepy, rtol=1e-7)
    # cartesian f-plane: rlh_s = 2*Omega/sqrt(2) on the H grid
    np.testing.assert_allclose(
        geo.rlh_s, np.float32(2.0) * EARTH_ANG_VEL / np.sqrt(np.float32(2.0)),
        rtol=1e-6)
    # rotation coefficients are the identity on the T grid
    np.testing.assert_allclose(geo.rotvec_coeff[..., 0], 1.0)
    np.testing.assert_allclose(geo.rotvec_coeff[..., 1], 0.0)


def test_spherical_metrics_unrotated():
    basin = basinpar_bs4km()
    xt, yt, xu, yv, geo = mt.build_geo_metrics(basin)
    # with zero rotation the geographic grid equals the model grid
    np.testing.assert_allclose(geo.geo_lat_t[5, :], yt, atol=1e-9)
    np.testing.assert_allclose(geo.geo_lon_t[:, 5], xt, atol=1e-9)
    # zonal metric shrinks with cos(lat) on the T grid
    expect = (np.float32(basin.dxst) * PIP180_F32 * RAD_EARTH
              * np.float32(np.cos(np.deg2rad(yt[40]))))
    np.testing.assert_allclose(geo.dx[:, 40], expect, rtol=1e-6)
    # Coriolis on the H grid: 2*Omega*sin(lat at yv)
    expect_cor = np.float32(2.0) * EARTH_ANG_VEL * np.sin(
        np.deg2rad(yv[40]))
    np.testing.assert_allclose(geo.rlh_s[:, 40], expect_cor, rtol=1e-5)
    # meridional metric unchanged by the transform
    np.testing.assert_allclose(
        geo.dyt, np.float32(basin.dyst) * PIP180_F32 * RAD_EARTH, rtol=1e-7)


def test_curvilinear_metrics_run():
    basin = basinpar_flat(20, 16, curve_grid=2)
    xt, yt, xu, yv, geo = mt.build_geo_metrics(basin)
    assert np.all(np.isfinite(geo.dx))
    assert np.all(geo.dx > 0)
    assert np.all(np.isfinite(geo.rotvec_coeff))


def test_par_files_roundtrip(tmp_path):
    # files in the exact reference 'value : comment' format
    basin_par = tmp_path / "basin.par"
    basin_par.write_text(
        "289 : nx\n163 : ny\n1 : nz\n0 : periodicity_x\n0 : periodicity_y\n"
        "0.05d0 : dxst\n0.04d0 : dyst\n27.525d0 : rlon\n40.940d0 : rlat\n"
        "0 : xgr\n0 : ygr\n1 : curve grid\n0.0d0 : rot lon\n0.0d0 : rot lat\n"
        "90.0d0 : x_pole\n60.0d0 : y_pole\n90.0d0 : p_pole\n-90.0d0 : q_pole\n"
        "data/BS/mask_bs4km.txt : mask\nnone : topo\n")
    b = load_basinpar(str(basin_par))
    ref = basinpar_bs4km()
    assert b.nx == ref.nx and b.ny == ref.ny
    assert abs(b.dxst - ref.dxst) < 1e-15
    assert b.curve_grid == 1
    assert b.mask_file_name == "data/BS/mask_bs4km.txt"
    assert b.mm == 287 and b.nn == 161 and b.mmm == 3

    sw_par = tmp_path / "sw.par"
    sw_par.write_text("1 : ffs\n1 : trans\n1 : ksw\n0.5d0 : smooth\n"
                      "1.0d+03 : lvisc\n1 : tracers\n2 : ntracer\n"
                      "none : ssh file\n")
    s = load_sw(str(sw_par))
    assert s.lvisc_2 == 1000.0 and s.tracer_num == 2
    assert s.ssh_init_file_name == "none"

    par_par = tmp_path / "parallel.par"
    par_par.write_text("1 : decomp\nnone : file\n2 : bppnx\n3 : bppny\n"
                       "0 : dbg\n0 : mode\nnone : out\n4 : dlb bal\n"
                       "5 : dlb steps\n")
    p = load_parallel(str(par_par), argv=["0", "7"])
    assert p.mod_decomposition == 0  # cmd override
    assert p.bppnx == 7 and p.bppny == 3
    assert p.dlb_balance_steps == 4 and p.dlb_model_steps == 5

    run_par = tmp_path / "ocean_run.par"
    run_par.write_text("0 : start\n1.0d0 : tau\n0.007 : days\n0 : step\n"
                       "2012 : year\n1.0 : loc out min\n-1.0 : glob\n"
                       "0 : ice\n0 : brt\nnone : path\n")
    r = load_runpar(str(run_par))
    assert r.num_step_max == 604
    assert r.output_every_steps == 60


def test_irregular_grid_levels():
    """xgr_type/ygr_type = 1: coordinates from explicit level arrays
    (grid_base_init_kernel's irregular branches)."""
    import dataclasses
    nx, ny = 12, 10
    x_levels = np.cumsum(np.linspace(0.05, 0.15, nx)) + 20.0
    y_levels = np.cumsum(np.linspace(0.03, 0.08, ny)) + 40.0
    basin = dataclasses.replace(
        basinpar_flat(nx, ny), xgr_type=1, ygr_type=1,
        x_levels=tuple(x_levels), y_levels=tuple(y_levels))
    xt, yt, xu, yv, geo = mt.build_geo_metrics(basin)
    np.testing.assert_allclose(xt, x_levels)
    np.testing.assert_allclose(xu[:-1], (x_levels[:-1] + x_levels[1:]) / 2)
    # dxt from xt diffs, dx from xu diffs (in metres), x-uniform in y
    expect = np.float32(x_levels[3] - x_levels[2]) * PIP180_F32 * RAD_EARTH
    np.testing.assert_allclose(geo.dxt[2, :], expect, rtol=1e-6)
    expect_dy = np.float32(y_levels[4] - y_levels[3]) * PIP180_F32 * RAD_EARTH
    np.testing.assert_allclose(geo.dyt[:, 3], expect_dy, rtol=1e-6)
    assert np.all(geo.dx > 0) and np.all(np.isfinite(geo.dx))


def test_vertical_levels():
    """grid.f90:57-58,146-149: z (nz t-levels), zw (nz+1 w-levels),
    hzt/dz steps — constructed as the uniform sigma column."""
    import numpy as np
    from ocean_model_arch_tpu.core.grid import vertical_levels

    z, zw, hzt, dz = vertical_levels(5)
    assert z.shape == (5,) and zw.shape == (6,)
    assert hzt.shape == (6,) and dz.shape == (5,)
    np.testing.assert_allclose(zw, np.linspace(0, 1, 6), atol=1e-7)
    np.testing.assert_allclose(z, (zw[:-1] + zw[1:]) / 2, atol=1e-7)
    np.testing.assert_allclose(dz.sum(), 1.0, atol=1e-6)
    np.testing.assert_allclose(hzt.sum(), 1.0, atol=1e-6)


def test_grid_carries_vertical_arrays():
    import numpy as np
    from ocean_model_arch_tpu.config import Precision, basinpar_flat
    from ocean_model_arch_tpu.core.grid import build_grid
    from ocean_model_arch_tpu.core.masks import frame_of_land_mask
    import dataclasses

    basin = dataclasses.replace(basinpar_flat(16, 12), nz=4)
    grid = build_grid(basin, frame_of_land_mask(16, 12),
                      precision=Precision.f32())
    assert grid.nz == 4
    assert np.asarray(grid.z).shape == (4,)
    assert np.asarray(grid.zw).shape == (5,)
