#!/bin/bash
cd /root/repo
for i in $(seq 1 400); do
  grep -q "^done" scratch/probe_r4f.log && break
  sleep 15
done
echo "=== azov wet-guard re-measure (azov_ctl) ==="
timeout 3000 python scripts/fused_variants_probe.py azov_ctl
echo "=== bench.py azov_mask (official) ==="
timeout 3000 python bench.py azov_mask 2>/dev/null | tail -1
echo "=== bench.py default sample 1 ==="
timeout 3000 python bench.py 2>/dev/null | tail -1
echo "=== bench.py default sample 2 ==="
timeout 3000 python bench.py 2>/dev/null | tail -1
echo "done"
