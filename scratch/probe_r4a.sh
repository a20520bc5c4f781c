#!/bin/bash
# Round-4 probe A: same-session A/B of the uniform-shape graph vs the
# sliced (halo-shaving) graph on current Mosaic (VERDICT next-1a).
cd /root/repo
echo "=== default (uniform shapes) rslu64x2 ==="
timeout 3000 python scripts/fused_variants_probe.py rslu64x2
echo "=== OCEAN_FUSED_UNIFORM_SHAPES=0 rslu64x2 ==="
OCEAN_FUSED_UNIFORM_SHAPES=0 timeout 3000 python scripts/fused_variants_probe.py rslu64x2
echo "=== re-measure default (drift check) ==="
timeout 3000 python scripts/fused_variants_probe.py rslu64x2
echo "done"
