"""VPU micro-probe: per-op costs on this chip, in slope form.

Extends vpu_shift_probe.py to the full op menu the fused kernel buys
from: every kind chains K dependent iterations of

    b = b*0.999 + 1e-4 * OP(b)

over a (tx+16, Ys) window on the bench layout, so the ms-vs-K slope
differences against ``plain`` (OP = identity, i.e. the fma+mul carrier
alone) isolate OP's marginal cost:

  plain  — carrier only
  div    — OP = a / b            (the momentum update's 2 divisions)
  rcp    — OP = pl.reciprocal(b, approx=True)
  rcpn   — OP = approx reciprocal + 1 Newton step (f32-accurate)
  sel    — OP = where(b > 0.5, b, a)   (compare + select)
  bmul   — OP = b * row          ((1, Ys) profile-row broadcast)
  rollx  — OP = +1 sublane roll of b
  rolly  — OP = +1 lane roll of b

Usage: python scripts/vpu_op_probe.py [kind ...]    (default: all)
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
YS = -(-(NY + 4) // 128) * 128


def make(kind, k):
    def kernel(x_ref, o_ref):
        a = x_ref[...]
        row = a[0:1, :]
        b = a
        for _ in range(k):
            if kind == "plain":
                op = b
            elif kind == "div":
                op = a / b
            elif kind == "rcp":
                op = pl.reciprocal(b, approx=True)
            elif kind == "rcpn":
                r = pl.reciprocal(b, approx=True)
                op = r * (2.0 - b * r)
            elif kind == "sel":
                op = jnp.where(b > 0.5, b, a)
            elif kind == "bmul":
                op = b * row
            elif kind == "rollx":
                op = pltpu.roll(b, 1, 0)
            elif kind == "rolly":
                op = pltpu.roll(b, 1, 1)
            elif kind in ("mulf32", "mulbf16"):
                op = None              # handled below (pure mul chains)
            else:
                raise ValueError(kind)
            if op is not None:
                b = b * np.float32(0.999) + op * np.float32(1e-4)
        if kind == "mulf32":
            # dependent SQUARING chain — constant-multiplier chains get
            # folded to b*c^k (measured: flat time vs k); b*b cannot
            b = b * np.float32(0.9999)
            for _ in range(k):
                b = b * b
        elif kind == "mulbf16":
            # same squaring chain in bf16: measures whether the VPU
            # runs bf16 elementwise at a higher rate than f32 (the r3
            # verdict's bf16-tail suggestion hinges on this)
            bb = (b * np.float32(0.9999)).astype(jnp.bfloat16)
            for _ in range(k):
                bb = bb * bb
            b = bb.astype(jnp.float32)
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
    kinds = sys.argv[1:] or ["plain", "div", "rcp", "rcpn", "sel",
                             "bmul", "rollx", "rolly", "mulf32",
                             "mulbf16"]
    # n must be large: the tunneled chip's dispatch latency (~40 ms) and
    # short-run jitter swamp anything under ~100 ms of device time
    ks = (16, 64)
    x = jnp.ones((XS, YS), jnp.float32)
    n = 2000
    slopes = {}
    for kind in kinds:
        times = {}
        for k in ks:
            f = make(kind, k)
            # CARRY the output through every timed call, and barrier by
            # TRANSFERRING a value: on the tunneled platform
            # block_until_ready alone can return before execution,
            # poisoning best-of-N with ~0 readings
            y = f(x, n)
            float(jnp.sum(y))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                y = f(y, n)
                float(jnp.sum(y))
                best = min(best, time.perf_counter() - t0)
            times[k] = best / n * 1e3
        slopes[kind] = (times[ks[1]] - times[ks[0]]) / (ks[1] - ks[0])
        print(f"{kind:6s} K{ks[0]} {times[ks[0]]:.4f}  "
              f"K{ks[1]} {times[ks[1]]:.4f}  "
              f"slope {slopes[kind] * 1e3:.2f} us/op", flush=True)
    if "plain" in slopes:
        base = slopes["plain"]
        for kind, s in slopes.items():
            if kind != "plain":
                print(f"{kind:6s} marginal = {(s - base) / base:+.2f} "
                      f"plain-carriers (carrier = 1 fma + 1 mul)",
                      flush=True)


if __name__ == "__main__":
    main()
