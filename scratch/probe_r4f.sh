#!/bin/bash
cd /root/repo
for i in $(seq 1 400); do
  grep -q "^done" scratch/probe_r4e.log && break
  sleep 15
done
echo "=== resident-planes windowed kernel (respl64x2) ==="
timeout 3000 python scripts/fused_variants_probe.py respl64x2
echo "=== default rslu64x2 (same-session control) ==="
timeout 3000 python scripts/fused_variants_probe.py rslu64x2
echo "done"
