"""Speed-of-light probe for the fused-step tiling.

Runs a trivial copy-through Pallas kernel with EXACTLY the fused step's
BlockSpecs (8 windowed f32 inputs + metric profile -> 6 strip outputs,
same margins, same grid) on the bench workload shape, under the same
2000-step scan harness as bench.py. The measured ms/step is the
achievable pipeline/HBM bound for this layout; the gap between it and
the real fused kernel (model/fused.py) is the VPU-compute share — i.e.
the remaining optimization headroom that kernel algebra can touch.

Usage: python scripts/roofline_probe.py [nx ny [tx [n_static]]]

``n_static``: also stream an (n_static, tx+2M, Ys) static-plane window per
tile (the static_rslu configuration adds 10 such planes); the floor's
delta vs n_static=0 attributes the HBM/pipeline cost of the static planes.
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from ocean_model_arch_tpu.ops.pallas import fused_step as fsk
from ocean_model_arch_tpu.utils.cache import enable_compilation_cache


def build_copy_step(lay, tx, n_static=0):
    M = fsk.MARGIN

    def kernel(*refs):
        ins = refs[:8]
        met = refs[8]
        sref = refs[9] if n_static else None
        outs = refs[9 + bool(n_static):]
        acc = met[0:1, :] * 0.0
        for r in ins:
            acc = acc + r[...][M:-M, :]
        if n_static:
            for i in range(n_static):
                acc = acc + sref[i][M:-M, :]
        for i, o in enumerate(outs):
            o[...] = acc + float(i)

    def in_spec():
        return pl.BlockSpec(
            (pl.Element(tx + 2 * M), pl.Element(lay.Ys)),
            lambda i: (pl.multiple_of(i * tx, 8), 0),
            memory_space=pltpu.VMEM)

    def out_spec():
        return pl.BlockSpec(
            (pl.Element(tx), pl.Element(lay.Ys)),
            lambda i: (pl.multiple_of(i * tx + M, 8), 0),
            memory_space=pltpu.VMEM)

    met_spec = pl.BlockSpec((pl.Element(16), pl.Element(lay.Ys)),
                            lambda i: (0, 0), memory_space=pltpu.VMEM)
    static_specs = []
    if n_static:
        static_specs = [pl.BlockSpec(
            (pl.Element(n_static), pl.Element(tx + 2 * M),
             pl.Element(lay.Ys)),
            lambda i: (0, pl.multiple_of(i * tx, 8), 0),
            memory_space=pltpu.VMEM)]
    shape = jax.ShapeDtypeStruct((lay.Xs, lay.Ys), jnp.float32)
    return pl.pallas_call(
        kernel, grid=(lay.X // tx,),
        in_specs=[in_spec() for _ in range(8)] + [met_spec] + static_specs,
        out_specs=[out_spec() for _ in range(6)],
        out_shape=[shape] * 6)


def build_copy_step_stacked(lay, tx, n_in=8, n_out=6):
    """Same volume as build_copy_step but ONE stacked input window and
    ONE stacked output window — isolates the per-window overhead of the
    pipeline (DMA setup/semaphores) from pure copy bandwidth."""
    M = fsk.MARGIN

    def kernel(s_ref, met, o_ref):
        acc = met[0:1, :] * 0.0
        for i in range(n_in):
            acc = acc + s_ref[i][M:-M, :]
        for i in range(n_out):
            o_ref[i] = acc + float(i)

    in_specs = [
        pl.BlockSpec((pl.Element(n_in), pl.Element(tx + 2 * M),
                      pl.Element(lay.Ys)),
                     lambda i: (0, pl.multiple_of(i * tx, 8), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pl.Element(16), pl.Element(lay.Ys)),
                     lambda i: (0, 0), memory_space=pltpu.VMEM)]
    out_spec = pl.BlockSpec(
        (pl.Element(n_out), pl.Element(tx), pl.Element(lay.Ys)),
        lambda i: (0, pl.multiple_of(i * tx + M, 8), 0),
        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n_out, lay.Xs, lay.Ys), jnp.float32)
    return pl.pallas_call(
        kernel, grid=(lay.X // tx,),
        in_specs=in_specs, out_specs=[out_spec], out_shape=[shape])


def main_stacked():
    enable_compilation_cache()
    nx, ny, tx = 1525, 1115, 64
    lay = fsk.make_layout(nx, ny, tx)
    call = build_copy_step_stacked(lay, tx)
    key = jax.random.PRNGKey(0)
    s = jax.random.normal(key, (8, lay.Xs, lay.Ys), jnp.float32)
    met = jnp.ones((16, lay.Ys), jnp.float32)
    n_inner = 2000

    @jax.jit
    def run(s8):
        def body(c, _):
            (o,) = call(c, met)
            return jnp.concatenate([o, c[:2]], axis=0), None
        s8, _ = jax.lax.scan(body, s8, None, length=n_inner)
        return s8

    s = run(s)
    float(jnp.sum(s))          # true barrier (see vpu_op_probe)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = run(s)
        float(jnp.sum(s))
        best = min(best, time.perf_counter() - t0)
    ms = best / n_inner * 1e3
    pts = nx * ny
    print(f"STACKED copy-through step: {ms:.4f} ms -> "
          f"{pts / ms * 1e3 / 1e9:.2f} Gpts/s "
          f"(1 in + 1 out window, same volume as 8+6)")


def main():
    enable_compilation_cache()
    if len(sys.argv) > 1 and sys.argv[1] == "stacked":
        return main_stacked()
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 1525
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 1115
    tx = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    n_static = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    lay = fsk.make_layout(nx, ny, tx)
    call = build_copy_step(lay, tx, n_static)

    key = jax.random.PRNGKey(0)
    arrs = [jax.random.normal(jax.random.fold_in(key, i),
                              (lay.Xs, lay.Ys), jnp.float32)
            for i in range(8)]
    met = jnp.ones((16, lay.Ys), jnp.float32)
    lu, hr = arrs[:2]
    statics = ((jnp.ones((n_static, lay.Xs, lay.Ys), jnp.float32),)
               if n_static else ())

    n_inner = 2000

    @jax.jit
    def run(s6):
        def body(c, _):
            outs = call(lu, hr, *c, met, *statics)
            return tuple(outs), None
        s6, _ = jax.lax.scan(body, tuple(s6), None, length=n_inner)
        return s6

    s6 = tuple(arrs[2:])
    s6 = run(s6)
    jax.block_until_ready(s6)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(s6)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    ms = best / n_inner * 1e3
    pts = nx * ny
    gb = pts * 4 * 14 / 1e9  # 8 reads + 6 writes per point
    print(f"copy-through step: {ms:.4f} ms  -> {pts / ms * 1e3 / 1e9:.2f} "
          f"Gpts/s, apparent HBM {gb / (ms / 1e3):.0f} GB/s "
          f"(14 f32 passes/point)")


if __name__ == "__main__":
    main()
