import jax, numpy as np, gzip, json, glob, collections, time
from ocean_model_arch_tpu.config import ModelConfig, Precision, SWConfig, basinpar_as250m_test
from ocean_model_arch_tpu.core.grid import build_grid
from ocean_model_arch_tpu.core.masks import frame_of_land_mask
from ocean_model_arch_tpu.model.init import init_ocean_state
from ocean_model_arch_tpu.model.fused import FusedSWModel
t0=time.time()
basin = basinpar_as250m_test()
cfg = ModelConfig(basin=basin, sw=SWConfig(use_tracers=0), precision=Precision.f32())
grid = build_grid(basin, frame_of_land_mask(basin.nx, basin.ny), precision=Precision.f32())
state = init_ocean_state(grid, cfg)
fm = FusedSWModel(grid, cfg, 1.0, tx=64)
s6 = fm.pack(state)
runj = jax.jit(lambda s: fm.run_steps(s, 50))
out, ok = runj(s6); jax.block_until_ready(out[0])
print("compiled", time.time()-t0, flush=True)
import shutil; shutil.rmtree("/tmp/xprof2", ignore_errors=True)
with jax.profiler.trace("/tmp/xprof2"):
    out2, ok = runj(out); jax.block_until_ready(out2[0])
f = glob.glob("/tmp/xprof2/**/*.trace.json.gz", recursive=True)[0]
with gzip.open(f) as fh: data = json.load(fh)
agg = collections.Counter(); cnt = collections.Counter()
for e in data.get("traceEvents", []):
    if e.get("ph")=="X" and "dur" in e:
        agg[e["name"]] += e["dur"]; cnt[e["name"]] += 1
pts = basin.nx*basin.ny
for name, dur in agg.most_common(8):
    print(f"{dur/1e3:9.2f} ms x{cnt[name]:<5} {name[:70]}", flush=True)
k = [n for n in agg if n.startswith("closed_call")]
if k:
    dev = agg[k[0]]/1e6/50
    print(f"kernel device time: {dev*1e3:.3f} ms/step -> {pts/dev/1e9:.2f} Gpts/s", flush=True)
