#!/bin/bash
cd /root/repo
for i in $(seq 1 400); do
  grep -q "^done" scratch/probe_r4g.log && break
  sleep 15
done
echo "=== bf16 vs f32 mul-chain rate ==="
timeout 3000 python scripts/vpu_op_probe.py mulf32 mulbf16
echo "done"
