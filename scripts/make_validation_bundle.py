"""Generate the committed 10k-step Black Sea A/B validation bundle.

The BASELINE correctness gate is "allclose match of prognostic (ssh, u,
v, tracer) against the reference Fortran after 10k steps on the Black
Sea grid" — but this image has no gfortran/MPI, so the comparison must
be closeable LATER, on any machine that can build the reference,
WITHOUT re-running this framework. This script produces the committed
half of that A/B:

  examples/validation_bs10k/RESULTS_TPU/   f64 driver run of the config
      (ssh.dat 11 recs, hhq.dat, ff1.dat — byte-compatible with the
      reference's output records, tools/io.f90:276-498)
  tests/golden_bs10k.json                  digests of the final 10k-step
      prognostic state + every output record

The gfortran machine then runs (README: make gcc):
  cd examples/validation_bs10k && mpirun -n N ./model   # reference
  python scripts/validate_vs_reference.py examples/validation_bs10k \
      examples/validation_bs10k/RESULTS --precomputed

Run from the repo root: python scripts/make_validation_bundle.py
(~4 min CPU).
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

POINTS = [(60, 40), (120, 80), (200, 90), (150, 60), (90, 110)]


def digests(a: np.ndarray) -> dict:
    a = np.asarray(a, np.float64)
    return {
        "sum": float(a.sum()),
        "l2": float(np.sqrt((a * a).sum())),
        "absmax": float(np.abs(a).max()),
        "points": [float(a[i, j]) for (i, j) in POINTS],
    }


def main():
    from ocean_model_arch_tpu.io import grads
    from ocean_model_arch_tpu.model.model import OceanModel, load_config_dir

    d = os.path.join(REPO, "examples", "validation_bs10k")
    cfg = load_config_dir(d)
    assert cfg.run.num_step_max == 10000
    assert cfg.run.output_every_steps == 1000
    model = OceanModel(cfg, base_dir=d,
                       results_dir=os.path.join(d, "RESULTS_TPU"))
    final = model.run(verbose=True)

    out = {"workload": "bs4km f64 driver run, flat 100 m, bump ssh, "
                       "1 tracer, tau=1.0, 10000 steps",
           "points": POINTS,
           "final_state": {
               "ssh": digests(final.ssh),
               "u": digests(final.ubrtr),
               "v": digests(final.vbrtr),
               "tracer": digests(final.ff[0]),
           },
           "records": {}}
    basin = cfg.basin
    for name, recs in (("ssh", 11), ("hhq", 1), ("ff1", 11)):
        p = os.path.join(d, "RESULTS_TPU", f"{name}.dat")
        out["records"][name] = [
            digests(grads.read_record(p, r, basin.nx, basin.ny))
            for r in range(1, recs + 1)]
    path = os.path.join(REPO, "tests", "golden_bs10k.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
