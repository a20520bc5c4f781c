"""Static grid data: masks, metrics, coordinates, Coriolis, bathymetry.

The functional analog of core/grid.f90's grid_type, split by mutability:
everything here is constant over the run (the prognostic depth fields
hh*/{n,p} live in core/state.py's SWState since they evolve each step when
full_free_surface is on).

All 2D fields are stored unpadded (nx, ny), 0-based [x, y] indexing mapping
Fortran (m, n) -> [m-1, n-1]. Ghost frames are applied transiently by the
halo provider (ops/stencil.py, parallel/halo.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import BasinConfig, Precision
from ..utils.pytree import pytree_dataclass, static_field
from . import masks as masks_mod
from . import metrics as metrics_mod


@pytree_dataclass
class Grid:
    # Arakawa-C masks (grid.f90:23-38), float32
    lu: jnp.ndarray
    lu1: jnp.ndarray
    luu: jnp.ndarray
    luh: jnp.ndarray
    lcu: jnp.ndarray
    lcv: jnp.ndarray
    llu: jnp.ndarray
    llv: jnp.ndarray
    # Metric steps [m] (grid.f90:56-63), float32
    dx: jnp.ndarray
    dy: jnp.ndarray
    dxt: jnp.ndarray
    dyt: jnp.ndarray
    dxh: jnp.ndarray
    dyh: jnp.ndarray
    dxb: jnp.ndarray
    dyb: jnp.ndarray
    # Coriolis (grid.f90:52-54), float32
    rlh_s: jnp.ndarray
    rlh_c: jnp.ndarray
    rlh_sqh: jnp.ndarray
    # Areas (grid.f90:65-68), float32
    sqt: jnp.ndarray
    squ: jnp.ndarray
    sqv: jnp.ndarray
    sqh: jnp.ndarray
    # Rest-state bathymetry on T-points (grid.f90:44), state dtype
    hhq_rest: jnp.ndarray
    # 1D model coordinates in degrees (grid.f90:70-71), float64
    xt: jnp.ndarray
    yt: jnp.ndarray
    xu: jnp.ndarray
    yv: jnp.ndarray
    # Geographic coordinates per staggered grid (grid.f90:73-80), float64
    geo_lon_t: jnp.ndarray
    geo_lat_t: jnp.ndarray
    geo_lon_u: jnp.ndarray
    geo_lat_u: jnp.ndarray
    geo_lon_v: jnp.ndarray
    geo_lat_v: jnp.ndarray
    geo_lon_h: jnp.ndarray
    geo_lat_h: jnp.ndarray
    # Vector rotation coefficients on the T-grid (grid.f90:82), float64
    rotvec_coeff: Optional[jnp.ndarray]
    # Vertical sigma coordinate (grid.f90:57-58, allocated from nz at
    # :146-149): levels z (nz, t-points) / zw (nz+1, w-points) and steps
    # dz (between w-levels) / hzt (between t-levels, nz+1). The
    # barotropic core never reads them (the reference leaves the
    # allocations zero-filled); they are constructed here as the uniform
    # sigma column — the hook for any baroclinic extension. float32.
    z: jnp.ndarray
    zw: jnp.ndarray
    hzt: jnp.ndarray
    dz: jnp.ndarray
    # Static config
    nx: int = static_field()
    ny: int = static_field()
    nz: int = static_field(default=1)
    periodic_x: bool = static_field(default=False)
    periodic_y: bool = static_field(default=False)


def vertical_levels(nz: int):
    """Uniform sigma-level column: z (t-levels), zw (w-levels), hzt
    (steps between t-levels, one-sided at the column ends), dz (steps
    between w-levels). All in [0, 1] sigma units, float32 — the arrays
    grid.f90:57-58 allocates from nz (:146-149)."""
    zw = np.linspace(0.0, 1.0, nz + 1, dtype=np.float32)
    z = 0.5 * (zw[:-1] + zw[1:])
    dz = np.diff(zw).astype(np.float32)
    hzt = np.empty(nz + 1, np.float32)
    hzt[0] = z[0] - zw[0]
    hzt[1:-1] = np.diff(z)
    hzt[-1] = zw[-1] - z[-1]
    return z.astype(np.float32), zw, hzt, dz


def build_grid(basin: BasinConfig, int_mask: np.ndarray,
               hhq_rest: Optional[np.ndarray] = None,
               precision: Precision = Precision.f64(),
               device_put=jnp.asarray) -> Grid:
    """Construct the full grid from config + integer land mask
    (the functional equivalent of service/gridcon.f90 +
    service/basinpar_construction.f90 + control/init_data.f90:96-125).

    ``hhq_rest``: rest bathymetry [m] on T-points; None -> flat 100 m
    (init_data.f90:113-114).
    """
    nx, ny = basin.nx, basin.ny
    assert int_mask.shape == (nx, ny), (int_mask.shape, (nx, ny))

    lu = masks_mod.lu_from_int_mask(int_mask, precision.mask_dtype)
    lu1 = np.ones_like(lu)
    luh, luu, llu, llv, lcu, lcv = masks_mod.derive_staggered_masks(
        lu, periodic_x=bool(basin.periodicity_x),
        periodic_y=bool(basin.periodicity_y))

    xt, yt, xu, yv, geo = metrics_mod.build_geo_metrics(basin)

    if hhq_rest is None:
        hr = np.full((nx, ny), 100.0, dtype=precision.state_dtype)
    else:
        hr = np.asarray(hhq_rest, dtype=precision.state_dtype)

    zcol = vertical_levels(int(basin.nz))

    return Grid(
        lu=device_put(lu), lu1=device_put(lu1), luu=device_put(luu),
        luh=device_put(luh), lcu=device_put(lcu), lcv=device_put(lcv),
        llu=device_put(llu), llv=device_put(llv),
        dx=device_put(geo.dx), dy=device_put(geo.dy),
        dxt=device_put(geo.dxt), dyt=device_put(geo.dyt),
        dxh=device_put(geo.dxh), dyh=device_put(geo.dyh),
        dxb=device_put(geo.dxb), dyb=device_put(geo.dyb),
        rlh_s=device_put(geo.rlh_s), rlh_c=device_put(geo.rlh_c),
        rlh_sqh=device_put(geo.rlh_sqh),
        sqt=device_put(geo.sqt), squ=device_put(geo.squ),
        sqv=device_put(geo.sqv), sqh=device_put(geo.sqh),
        hhq_rest=device_put(hr),
        xt=device_put(xt), yt=device_put(yt),
        xu=device_put(xu), yv=device_put(yv),
        geo_lon_t=device_put(geo.geo_lon_t), geo_lat_t=device_put(geo.geo_lat_t),
        geo_lon_u=device_put(geo.geo_lon_u), geo_lat_u=device_put(geo.geo_lat_u),
        geo_lon_v=device_put(geo.geo_lon_v), geo_lat_v=device_put(geo.geo_lat_v),
        geo_lon_h=device_put(geo.geo_lon_h), geo_lat_h=device_put(geo.geo_lat_h),
        rotvec_coeff=(device_put(geo.rotvec_coeff)
                      if geo.rotvec_coeff is not None else None),
        z=device_put(zcol[0]), zw=device_put(zcol[1]),
        hzt=device_put(zcol[2]), dz=device_put(zcol[3]),
        nx=nx, ny=ny, nz=int(basin.nz),
        periodic_x=bool(basin.periodicity_x),
        periodic_y=bool(basin.periodicity_y),
    )
