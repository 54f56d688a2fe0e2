#!/bin/bash
# Full hardware validation session — run in background when the TPU relay
# answers (one jax process at a time; each pays the relay dial).
#
#   nohup bash scripts/hw_validate.sh > /tmp/hw_session.log 2>&1 &
#
# Sequence:
#  1. headline bench.py (driver metric)
#  2. full 13-config bench_configs.py run (atomically rewrites BENCH_DETAILS)
#  3. host-fed streaming overlap A/B (bench_stream, 1080p + 4K)
#  4. batch-1 real-time latency per config (bench_latency)
#  5. roofline merge into BENCH_DETAILS (analytic model x measured fps)
#  6. multi-stream serving (trace-cache churn) + real-time sustain
set -u
cd "$(dirname "$0")/.."

step() { echo; echo "=== [$(date +%H:%M:%S)] $* ==="; }

step "1/6 headline bench.py"
timeout 2400 python bench.py

step "2/6 full bench_configs.py (13 configs, rewrites BENCH_DETAILS.md)"
timeout 5400 python bench_configs.py

step "3/6 host-fed streaming overlap (1080p, then 4K)"
timeout 2400 python bench_stream.py
timeout 2400 python bench_stream.py --4k

step "4/6 batch-1 latency"
timeout 3600 python bench_latency.py

step "5/6 roofline merge"
timeout 1200 python bench_roofline.py

step "6/6 multi-stream serving + real-time sustain"
timeout 2400 python bench_multistream.py
timeout 2400 python bench_realtime.py
# 30 Hz rows prove the sustained case under the relay tunnel's ~26 ms
# host floor; the c5 double-rate rows cover the 120 Hz contract
# (VERDICT r4 #7): with push_batch jitted the depth-16 paced row
# SUSTAINS a device-fed 120 Hz (measured: 0 drops, ~2 ms sync offsets),
# the depth-2 row labels the one-RTT-per-present tunnel floor, and the
# c5burst row gives the raw fields/s capacity ceiling
timeout 2400 python bench_realtime.py --fps 30 c1 c4
timeout 2400 python bench_realtime.py --fps 120 c5deint --depth 16
timeout 2400 python bench_realtime.py --fps 120 c5deint --depth 2
timeout 2400 python bench_realtime.py c5burst

step "done"
