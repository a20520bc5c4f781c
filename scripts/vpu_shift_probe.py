"""VPU micro-probe: what does a shifted operand cost on this chip?

Three kernel families on the bench layout, each a chain of K dependent
f32 adds over a (tx+16, Ys) window:
  plain — operands unshifted (pure ALU baseline)
  rollx — every add's second operand is a +1-row roll (sublane shift,
          the cost model for the kernel's x-slices at odd offsets)
  rolly — every add's second operand is a +1-lane roll

The ms-vs-K slope difference measures the per-shift relayout cost in
add-equivalents — the number that decides whether the fused step's ~70
shifted operands can ever be cheap enough for 20 Gpts/s.

Usage: python scripts/vpu_shift_probe.py [K ...]   (default 16 48)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from ocean_model_arch_tpu.utils.cache import enable_compilation_cache

NX, NY = 1525, 1115
TX, M = 64, 8
XS = -(-NX // TX) * TX + 2 * M
YS = NY + 4


def make(kind, k, n_out_halo=0):
    def kernel(x_ref, o_ref):
        a = x_ref[...]
        b = a
        for i in range(k):
            if kind == "plain":
                op = b
            elif kind == "rollx":
                op = pltpu.roll(b, 1, 0)
            elif kind == "rolly":
                op = pltpu.roll(b, 1, 1)
            b = b * np.float32(0.999) + op * np.float32(1e-4)
        o_ref[...] = jax.lax.slice(b, (M, 0), (M + TX, YS))

    n_tiles = (XS - 2 * M) // TX
    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((pl.Element(TX + 2 * M), pl.Element(YS)),
                               lambda i: (pl.multiple_of(i * TX, 8), 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((pl.Element(TX), pl.Element(YS)),
                                lambda i: (pl.multiple_of(i * TX + M, 8), 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((XS, YS), jnp.float32)],
    )

    def run(x, n):
        def body(c, _):
            return call(c)[0], None
        y, _ = jax.lax.scan(body, x, None, length=n)
        return y
    return jax.jit(run, static_argnums=1)


def main():
    enable_compilation_cache()
    ks = [int(a) for a in sys.argv[1:]] or [16, 48]
    x = jnp.ones((XS, YS), jnp.float32)
    n = 500
    for kind in ("plain", "rollx", "rolly"):
        times = {}
        for k in ks:
            f = make(kind, k)
            y = f(x, n)
            jax.block_until_ready(y)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                y = f(x, n)
                jax.block_until_ready(y)
                best = min(best, time.perf_counter() - t0)
            times[k] = best / n * 1e3
            print(f"{kind:7s} K={k:3d}  {times[k]:.4f} ms/iter", flush=True)
        if len(ks) >= 2:
            k0, k1 = ks[0], ks[-1]
            slope = (times[k1] - times[k0]) / (k1 - k0)
            print(f"{kind:7s} slope {slope * 1e3:.2f} us/op", flush=True)


if __name__ == "__main__":
    main()
