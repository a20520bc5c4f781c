#!/bin/bash
# Round-4 probe B: chained-step frame narrowing A/B (same session).
cd /root/repo
# wait for the verify pass to release the chip
for i in $(seq 1 200); do
  grep -q "^done" scratch/verify_r4a.log && break
  sleep 15
done
echo "=== default rslu64x2 (re-measure) ==="
timeout 3000 python scripts/fused_variants_probe.py rslu64x2
echo "=== NARROW_CHAIN=1 rslu64x2 ==="
OCEAN_FUSED_NARROW_CHAIN=1 timeout 3000 python scripts/fused_variants_probe.py narrow64x2
echo "=== NARROW_CHAIN=1 + rcp_div ==="
OCEAN_FUSED_NARROW_CHAIN=1 timeout 3000 python scripts/fused_variants_probe.py rcpn64x2
echo "done"
