#!/bin/bash
# Round-4 on-chip measurement chain: run when the tunnel is up.
# Order: bench (artifact numbers) -> watershed engine A/B -> on-chip
# tests -> multichip dryrun.  Each stage logs to /tmp/r4_*.log; the
# chain continues past failures.
set -u
cd /root/repo

echo "=== bench ($(date +%T)) ==="
timeout 2400 python bench.py > /tmp/r4_bench.json 2> /tmp/r4_bench.log
echo "bench rc=$?"
tail -3 /tmp/r4_bench.json

echo "=== watershed engine A/B ($(date +%T)) ==="
timeout 1800 python tools/ws_engine_ab.py > /tmp/r4_ws_ab.log 2>&1
echo "ab rc=$?"
tail -10 /tmp/r4_ws_ab.log

echo "=== tests_tpu ($(date +%T)) ==="
timeout 3000 python -m pytest -m tpu tests_tpu/ -q > /tmp/r4_tpu_tests.log 2>&1
echo "tests rc=$?"
tail -3 /tmp/r4_tpu_tests.log

echo "=== multichip dryrun ($(date +%T)) ==="
timeout 900 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)" > /tmp/r4_dryrun.log 2>&1
echo "dryrun rc=$?"
tail -1 /tmp/r4_dryrun.log
echo "=== done ($(date +%T)) ==="
