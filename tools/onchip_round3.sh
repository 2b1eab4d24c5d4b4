#!/bin/bash
# Round-3 on-chip measurement chain: run when the tunnel is up.
# Order: bench (artifact numbers) -> iso crossover curve -> on-chip tests
# -> boundary-engine A/B.  Each stage logs to /tmp/r3_*.log; the chain
# continues past failures.
set -u
cd /root/repo

echo "=== bench ($(date +%T)) ==="
timeout 2400 python bench.py > /tmp/r3_bench.json 2> /tmp/r3_bench.log
echo "bench rc=$?"
tail -3 /tmp/r3_bench.json

echo "=== iso crossover ($(date +%T)) ==="
timeout 2400 python tools/iso_crossover.py > /tmp/r3_crossover.json 2> /tmp/r3_crossover.log
echo "crossover rc=$?"
cat /tmp/r3_crossover.json

echo "=== tests_tpu ($(date +%T)) ==="
timeout 3000 python -m pytest -m tpu tests_tpu/ -q > /tmp/r3_tpu_tests.log 2>&1
echo "tests rc=$?"
tail -3 /tmp/r3_tpu_tests.log

echo "=== boundary A/B ($(date +%T)) ==="
timeout 1800 python tools/boundary_ab.py > /tmp/r3_boundary_ab.json 2> /tmp/r3_boundary_ab.log
echo "ab rc=$?"
cat /tmp/r3_boundary_ab.json
echo "=== done ($(date +%T)) ==="
