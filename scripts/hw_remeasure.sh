#!/bin/bash
# Re-measure the table-owning steps only (headline, 13-config table,
# roofline) — used after a kernel change when the session's other sections
# (stream/latency/multistream/sustain) are already fresh.  Output is a
# hw_validate-style log for scripts/hw_ingest.py.
set -u
cd "$(dirname "$0")/.."

step() { echo; echo "=== [$(date +%H:%M:%S)] $* ==="; }

step "1/3 headline bench.py"
timeout 2400 python bench.py

step "2/3 full bench_configs.py (13 configs, rewrites BENCH_DETAILS.md)"
timeout 5400 python bench_configs.py

step "3/3 roofline merge"
timeout 1200 python bench_roofline.py

step "done"
