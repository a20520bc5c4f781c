import time; t00=time.time()
import jax, numpy as np, dataclasses, tempfile, pathlib
from ocean_model_arch_tpu.config import Precision
from ocean_model_arch_tpu.model.model import OceanModel, load_config_dir
d = pathlib.Path(tempfile.mkdtemp())
(d/"basin.par").write_text("40 : nx\n30 : ny\n1 :\n0 :\n0 :\n0.05d0 :\n0.04d0 :\n27.5d0 :\n41.0d0 :\n0 :\n0 :\n1 :\n0.0d0 :\n0.0d0 :\n90d0 :\n60d0 :\n90d0 :\n-90d0 :\nnone :\nnone :\n")
(d/"sw.par").write_text("1 :\n1 :\n1 :\n0.5d0 :\n1.0d+03 :\n0 :\n1 :\nnone :\n")
(d/"parallel.par").write_text("0 :\nnone :\n1 :\n1 :\n0 :\n0 :\nnone :\n0 :\n0 :\n")
(d/"ocean_run.par").write_text("0 :\n1.0d0 :\n0.0007 :\n0 :\n2012 :\n0.5 :\n-1.0 :\n0 :\n0 :\nnone :\n")
cfg = load_config_dir(str(d))
cfg32 = dataclasses.replace(cfg, precision=Precision.f32())
m2 = OceanModel(cfg32, base_dir=str(d))
print("setup", time.time()-t00, "fused selected:", m2._use_fused(), flush=True)
r32 = m2.run(verbose=True)
print("ssh max:", float(np.abs(np.asarray(r32.ssh)).max()), "finite:", np.isfinite(np.asarray(r32.ssh)).all(), "total", time.time()-t00, flush=True)
