"""100k-step fused-kernel stability run on the real Azov coastline
(production f32, per-step in-VMEM guard on). Robustness evidence: the
reference's shipped default runs 605 steps; this runs 165x longer."""
import sys, time
sys.path.insert(0, ".")
import jax
import numpy as np
from ocean_model_arch_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from ocean_model_arch_tpu.config import ModelConfig, Precision, SWConfig, basinpar_as250m_test
from ocean_model_arch_tpu.core.grid import build_grid
from ocean_model_arch_tpu.io.mask_io import read_mask
from ocean_model_arch_tpu.model.fused import FusedSWModel
from ocean_model_arch_tpu.model.init import init_ocean_state
from ocean_model_arch_tpu.ops.pallas import fused_step as fsk

basin = basinpar_as250m_test()
cfg = ModelConfig(basin=basin, sw=SWConfig(use_tracers=0), precision=Precision.f32())
mask = read_mask("data/AS/maskAzovCor.txt", basin.nx, basin.ny)
grid = build_grid(basin, mask, precision=cfg.precision)
state = init_ocean_state(grid, cfg)
fm = FusedSWModel(grid, cfg, 1.0, static_rslu=True, steps_per_call=2)
carry = fm.pack(state)
run = jax.jit(lambda c: fm.run_steps(c, 2000))
t0 = time.perf_counter()
for w in range(50):
    carry, ok = run(carry)
    if not bool(ok):
        raise SystemExit(f"guard tripped in window {w}")
dt = time.perf_counter() - t0
ssh = np.asarray(fsk.extract(fm.lay, carry[0]))
wet = np.asarray(grid.lu) > 0.5
print(f"100000 steps OK in {dt:.1f}s wall; final |ssh| max "
      f"{np.abs(ssh[wet]).max():.4f} m, mean {np.abs(ssh[wet]).mean():.6f} m",
      flush=True)
