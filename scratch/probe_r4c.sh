#!/bin/bash
cd /root/repo
for i in $(seq 1 240); do
  grep -q "^done" scratch/probe_r4b.log && break
  sleep 15
done
echo "=== bench.py halo_overlap (aliased persistent carry) ==="
timeout 3000 python bench.py halo_overlap 2>/dev/null | tail -1
echo "=== persistent-VMEM walk probe (500 steps) ==="
timeout 3000 python scripts/persistent_probe.py 500
echo "=== bench.py bipolar (2D-metrics envelope) ==="
timeout 3000 python bench.py bipolar 2>/dev/null | tail -1
echo "done"
