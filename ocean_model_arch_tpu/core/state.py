"""Prognostic + diagnostic model state as a functional pytree.

Mirrors core/ocean.f90's ocean_type (ssh/velocity three-time-level
families, RHS accumulators, mixing fields, Rayleigh dissipation, tracers)
plus the prognostic depth families from core/grid.f90 (hhq/hhu/hhv/hhh x
{current, p, n}) which evolve each step under full_free_surface.

All fields are zero-initialized exactly like the reference's allocation
path (core/data_types.f90:517-558 zero-fills every block, so e.g. r_diss
and the RHS fields start at 0 and stay 0 unless a kernel writes them).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import Precision
from ..utils.pytree import pytree_dataclass


@pytree_dataclass
class SWState:
    # Sea surface height, three time levels (ocean.f90:15-17)
    ssh: jnp.ndarray
    sshn: jnp.ndarray
    sshp: jnp.ndarray
    # Barotropic velocities (ocean.f90:18-23)
    ubrtr: jnp.ndarray
    ubrtrn: jnp.ndarray
    ubrtrp: jnp.ndarray
    vbrtr: jnp.ndarray
    vbrtrn: jnp.ndarray
    vbrtrp: jnp.ndarray
    # RHS accumulators (ocean.f90:24-31); RHSx/RHSy stay zero in the
    # barotropic core (no wind forcing path yet) but are part of the
    # momentum equation (vel_ssh.f90:171).
    rhsx: jnp.ndarray
    rhsy: jnp.ndarray
    rhsx_adv: jnp.ndarray
    rhsy_adv: jnp.ndarray
    rhsx_dif: jnp.ndarray
    rhsy_dif: jnp.ndarray
    # Mixing fields (ocean.f90:33-36)
    mu: jnp.ndarray
    str_t: jnp.ndarray
    str_s: jnp.ndarray
    vort: jnp.ndarray
    # Rayleigh friction scale, float32 (ocean.f90:32)
    r_diss: jnp.ndarray
    # Depth families (grid.f90:40-50), prognostic under full_free_surface
    hhq: jnp.ndarray
    hhq_p: jnp.ndarray
    hhq_n: jnp.ndarray
    hhu: jnp.ndarray
    hhu_p: jnp.ndarray
    hhu_n: jnp.ndarray
    hhv: jnp.ndarray
    hhv_p: jnp.ndarray
    hhv_n: jnp.ndarray
    hhh: jnp.ndarray
    hhh_p: jnp.ndarray
    hhh_n: jnp.ndarray
    # Tracers, stacked (tracer_num, nx, ny) (ocean.f90:38-44); None if off
    ff: Optional[jnp.ndarray]
    ffp: Optional[jnp.ndarray]
    ffn: Optional[jnp.ndarray]
    flux_x: Optional[jnp.ndarray]
    flux_y: Optional[jnp.ndarray]


def zero_state(nx: int, ny: int, tracer_num: int = 0,
               precision: Precision = Precision.f64()) -> SWState:
    """Allocate an all-zero state (ocean_type%init, ocean.f90:56-117)."""
    sd = precision.state_dtype

    def z():
        return jnp.zeros((nx, ny), dtype=sd)

    def zt():
        return jnp.zeros((tracer_num, nx, ny), dtype=sd) if tracer_num else None

    return SWState(
        ssh=z(), sshn=z(), sshp=z(),
        ubrtr=z(), ubrtrn=z(), ubrtrp=z(),
        vbrtr=z(), vbrtrn=z(), vbrtrp=z(),
        rhsx=z(), rhsy=z(), rhsx_adv=z(), rhsy_adv=z(),
        rhsx_dif=z(), rhsy_dif=z(),
        mu=z(), str_t=z(), str_s=z(), vort=z(),
        r_diss=jnp.zeros((nx, ny), dtype=np.float32),
        hhq=z(), hhq_p=z(), hhq_n=z(),
        hhu=z(), hhu_p=z(), hhu_n=z(),
        hhv=z(), hhv_p=z(), hhv_n=z(),
        hhh=z(), hhh_p=z(), hhh_n=z(),
        ff=zt(), ffp=zt(), ffn=zt(),
        flux_x=z() if tracer_num else None,
        flux_y=z() if tracer_num else None,
    )
