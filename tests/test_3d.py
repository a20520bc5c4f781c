"""3D (nlev) field support: the 2D kernels operate unchanged on
(nlev, nx, ny) fields through the axis-generalized stencil ops — the
analog of the reference's nlev kernel parameters (vel_ssh.f90 uv_trans
et al.) and the old/ 3D halo sync."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ocean_model_arch_tpu.core import masks as mk
from ocean_model_arch_tpu.ops import sw_kernels as swk
from ocean_model_arch_tpu.ops.stencil import pad
from ocean_model_arch_tpu.parallel.halo import ShardHalo
from ocean_model_arch_tpu.parallel.mesh import make_mesh

NX, NY, NLEV = 20, 16, 3


def _fields():
    rng = np.random.RandomState(11)
    int_mask = mk.frame_of_land_mask(NX, NY)
    int_mask[2:-2, 2:-2] = (rng.rand(NX - 4, NY - 4) > 0.8).astype(np.int32)
    lu = mk.lu_from_int_mask(int_mask)
    luh, luu, llu, llv, lcu, lcv = mk.derive_staggered_masks(lu)
    m = {k: (1000.0 + 100.0 * rng.rand(NX, NY)).astype(np.float32)
         for k in ("dxt", "dyt", "dxb", "dyb")}
    u3 = rng.randn(NLEV, NX, NY)
    v3 = rng.randn(NLEV, NX, NY)
    vort3 = rng.randn(NLEV, NX, NY)
    return luu, m, u3, v3, vort3


def test_3d_kernel_equals_per_level():
    luu, m, u3, v3, vort3 = _fields()
    got3 = swk.uv_trans_vort(pad(luu), pad(m["dxt"]), pad(m["dyt"]),
                             pad(m["dxb"]), pad(m["dyb"]),
                             pad(u3), pad(v3), pad(vort3))
    assert got3.shape == (NLEV, NX, NY)
    for k in range(NLEV):
        got2 = swk.uv_trans_vort(pad(luu), pad(m["dxt"]), pad(m["dyt"]),
                                 pad(m["dxb"]), pad(m["dyb"]),
                                 pad(u3[k]), pad(v3[k]), pad(vort3[k]))
        np.testing.assert_array_equal(np.asarray(got3[k]), np.asarray(got2))


def test_3d_halo_exchange():
    """Sharded 3D exchange matches global zero-padding (per level, the
    analytic (k+1)*i*j field)."""
    px, py = 2, 2
    nx, ny = 16, 8
    i = np.arange(1, nx + 1)[:, None]
    j = np.arange(1, ny + 1)[None, :]
    f = np.stack([(k + 1) * i * j for k in range(NLEV)]).astype(np.float64)

    mesh = make_mesh(px, py)
    hp = ShardHalo(px, py)
    ex = jax.jit(jax.shard_map(hp.ex, mesh=mesh,
                               in_specs=P(None, "x", "y"),
                               out_specs=P(None, "x", "y"),
                               check_vma=False))
    out = np.asarray(ex(jax.device_put(
        f, jax.NamedSharding(mesh, P(None, "x", "y")))))
    lx, ly = nx // px, ny // py
    h = 2
    blocks = out.reshape(NLEV, px, lx + 2 * h, py, ly + 2 * h)
    for k in range(NLEV):
        for bi in range(px):
            for bj in range(py):
                blk = blocks[k, bi, :, bj, :]
                for ii in range(lx + 2 * h):
                    for jj in range(ly + 2 * h):
                        gm, gn = bi * lx + ii - h, bj * ly + jj - h
                        want = ((k + 1) * (gm + 1) * (gn + 1)
                                if 0 <= gm < nx and 0 <= gn < ny else 0.0)
                        assert blk[ii, jj] == want
