#!/bin/bash
cd /root/repo
echo "=== bench.py default ==="
timeout 3000 python bench.py 2>/dev/null | tail -1
echo "=== bench.py halo_overlap (new persistent-carry exchange) ==="
timeout 3000 python bench.py halo_overlap 2>/dev/null | tail -1
echo "=== CLI 06_bipolar ==="
timeout 1200 python -m ocean_model_arch_tpu examples/06_bipolar --f32 2>/dev/null | grep -E "compute path|step .*/|wet_points"
echo "done"
