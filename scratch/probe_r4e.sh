#!/bin/bash
cd /root/repo
for i in $(seq 1 400); do
  grep -q "^done" scratch/probe_r4d.log && break
  sleep 15
done
echo "=== fori persistent walk (500 steps) ==="
timeout 3000 python scripts/persistent_probe.py fori 500
echo "done"
