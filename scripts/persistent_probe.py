"""Persistent-VMEM megakernel mechanism probe (chip, or CPU interpret).

Premise (r4): the production fused kernel is ~82% VPU-bound; the other
~18% is per-invocation HBM streaming that steps_per_call=2 only halves.
If the WHOLE state (6 fields x (XS, YS) f32 ~ 43 MB) lives in VMEM
scratch across a (T, n_tiles) sequential grid, HBM sees ONE domain read
and ONE write for T model steps — and the margin-chaining (with its
(tx+2M)/tx redundant rows) becomes unnecessary.

Mechanisms probed with a trivial stencil update:
 1. scratch persistence across grid iterations (6 x 7.2 MB VMEM);
 2. in-place tile walk: tile i's window rows that tile i-1 already
    overwrote come from an (M, YS) old-row stash;
 3. window pinning: in_specs index_map only changes at t==0 and
    out_specs only at t==T+1, so blocks DMA exactly once (revisit
    semantics: a block is copied only when its index changes).

Usage: python scripts/persistent_probe.py [nsteps] [windows]
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

NF = 6
X, YS, TX, M = 1536, 1152, 64, 8
XS = X + 2 * M
NT = X // TX


def build(nsteps: int, interpret: bool = False):
    def kernel(*refs):
        ins = refs[:NF]
        outs = refs[NF:2 * NF]
        scr = refs[2 * NF:3 * NF]          # (XS, YS) persistent state
        stash = refs[3 * NF:4 * NF]        # (M, YS) old-row stashes
        t = pl.program_id(0)
        i = pl.program_id(1)

        @pl.when(t == 0)
        def _():                           # initial load: HBM -> scratch
            for k in range(NF):
                scr[k][pl.ds(i * TX + M, TX), :] = ins[k][...]

            @pl.when(i == 0)
            def _():                       # static land margins
                for k in range(NF):
                    z = jnp.zeros((M, YS), jnp.float32)
                    scr[k][pl.ds(0, M), :] = z
                    scr[k][pl.ds(X + M, M), :] = z

        @pl.when((t > 0) & (t <= nsteps))
        def _():
            row0 = i * TX                  # window start (margined)
            for k in range(NF):
                cur = scr[k][pl.ds(row0, TX + 2 * M), :]
                # rows [row0, row0+M): overwritten by tile i-1 -> use
                # the stashed OLD values (i == 0 reads static margins)
                prev = jnp.where(i > 0, stash[k][...], cur[:M])
                # next tile's old head, before this tile overwrites it
                stash[k][...] = cur[TX:TX + M]
                win = jnp.concatenate([prev, cur[M:]], axis=0)
                upd = win[M:M + TX, :] * 1.000001 \
                    + 0.000001 * win[0:TX, :]
                scr[k][pl.ds(row0 + M, TX), :] = upd

        flush = (t == nsteps + 1) if not interpret else (t >= 0)

        @pl.when(flush)
        def _():                           # final flush: scratch -> HBM
            for k in range(NF):
                outs[k][...] = scr[k][pl.ds(i * TX + M, TX), :]

    # Element-typed specs: index maps return ELEMENT offsets
    if interpret:                     # interpret mode replays every
        def in_ix(t, i):              # block copy, so skip the pinning
            return (i * TX, 0)

        def out_ix(t, i):
            return (i * TX, 0)
    else:
        def in_ix(t, i):
            return (jnp.where(t == 0, i, NT - 1) * TX, 0)

        def out_ix(t, i):
            return (jnp.where(t == nsteps + 1, i, 0) * TX, 0)

    in_specs = [pl.BlockSpec((pl.Element(TX), pl.Element(YS)), in_ix,
                             memory_space=pltpu.VMEM)] * NF
    out_specs = [pl.BlockSpec((pl.Element(TX), pl.Element(YS)), out_ix,
                              memory_space=pltpu.VMEM)] * NF
    scratch = [pltpu.VMEM((XS, YS), jnp.float32)] * NF \
        + [pltpu.VMEM((M, YS), jnp.float32) for _ in range(NF)]

    shape = jax.ShapeDtypeStruct((X, YS), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(nsteps + 2, NT),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[shape] * NF,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )


def main():
    nsteps = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    windows = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    interpret = jax.devices()[0].platform == "cpu"
    if interpret:
        nsteps = 5
    call = build(nsteps, interpret)
    fields = [jnp.full((X, YS), float(k + 1), jnp.float32)
              for k in range(NF)]
    t0 = time.perf_counter()
    outs = call(*fields)
    v = float(outs[0][100, 100])
    print(f"first call {time.perf_counter() - t0:.1f}s, "
          f"out[0][100,100]={v!r}", flush=True)
    # correctness of the walk: interior cells see same-value neighbours
    exp = 1.0
    for _ in range(nsteps):
        exp = exp * 1.000001 + 0.000001 * exp
    assert abs(v - exp) < 1e-4 * exp, (v, exp)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        outs = call(*outs)
        v2 = float(outs[0][100, 100])      # transfer = true barrier
        best = min(best, time.perf_counter() - t0)
    ms = best / nsteps * 1e3
    print(f"persistent walk: {ms:.4f} ms/step  "
          f"{X * YS / ms * 1e3 / 1e9:6.2f} Gpts/s (near-copy-through)",
          flush=True)





def build_fori(nsteps: int, interpret: bool = False):
    """Variant 2: 1D grid (nsteps+2,), lax.fori_loop over tiles inside
    each step — one grid iteration per STEP, so the per-iteration grid
    overhead amortizes over all 24 tiles. State lives in full-array
    pinned OUT blocks (readable+writable, flushed once at the end)."""
    import jax.lax as lax

    def kernel(*refs):
        ins = refs[:NF]
        outs = refs[NF:2 * NF]
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():                       # initial fill: in -> out buffers
            for k in range(NF):
                outs[k][...] = ins[k][...]

        @pl.when((t > 0) & (t <= nsteps))
        def _():
            def body(i, stash):
                row0 = i * TX
                new_stash = []
                for k in range(NF):
                    cur = outs[k][pl.ds(row0, TX + 2 * M), :]
                    prev = jnp.where(i > 0, stash[k], cur[:M])
                    new_stash.append(cur[TX:TX + M])
                    win = jnp.concatenate([prev, cur[M:]], axis=0)
                    upd = win[M:M + TX, :] * 1.000001 \
                        + 0.000001 * win[0:TX, :]
                    outs[k][pl.ds(row0 + M, TX), :] = upd
                return tuple(new_stash)
            lax.fori_loop(
                0, NT, body,
                tuple(jnp.zeros((M, YS), jnp.float32)
                      for _ in range(NF)))

    full_in = pl.BlockSpec((pl.Element(XS), pl.Element(YS)),
                           lambda t: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(nsteps + 2,),
        in_specs=[full_in] * NF,
        out_specs=[pl.BlockSpec((pl.Element(XS), pl.Element(YS)),
                                lambda t: (0, 0),
                                memory_space=pltpu.VMEM)] * NF,
        out_shape=[jax.ShapeDtypeStruct((XS, YS), jnp.float32)] * NF,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )


def main2():
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    windows = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    interpret = jax.devices()[0].platform == "cpu"
    if interpret:
        nsteps = 5
    call = build_fori(nsteps, interpret)
    fields = [jnp.full((XS, YS), float(k + 1), jnp.float32)
              for k in range(NF)]
    t0 = time.perf_counter()
    outs = call(*fields)
    v = float(outs[0][108, 100])       # interior (margined coords)
    print(f"first call {time.perf_counter() - t0:.1f}s, "
          f"out[0][108,100]={v!r}", flush=True)
    exp = 1.0
    for _ in range(nsteps):
        exp = exp * 1.000001 + 0.000001 * exp
    assert abs(v - exp) < 1e-4 * exp, (v, exp)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        outs = call(*outs)
        v2 = float(outs[0][108, 100])
        best = min(best, time.perf_counter() - t0)
    ms = best / nsteps * 1e3
    print(f"fori walk: {ms:.4f} ms/step  "
          f"{X * YS / ms * 1e3 / 1e9:6.2f} Gpts/s (near-copy-through)",
          flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "fori":
        main2()
    else:
        main()
