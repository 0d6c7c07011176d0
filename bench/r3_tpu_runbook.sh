#!/bin/bash
# Round-3 TPU measurement runbook — run when the axon tunnel is up.
# Each step appends to /tmp/r3_runbook.log; safe to re-run (compile cache).
set -x
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
cd /root/repo
LOG=/tmp/r3_runbook.log
date >> $LOG

echo "=== lab: tunnel latency model ===" >> $LOG
timeout 600 python bench/r3_perf_lab.py tunnel >> $LOG 2>&1

echo "=== lab: chain (xla vs pallas-highest vs pallas-high, 8/64ch) ===" >> $LOG
timeout 1200 python bench/r3_perf_lab.py chain >> $LOG 2>&1

echo "=== lab: resampler tiers ===" >> $LOG
timeout 900 python bench/r3_perf_lab.py resampler >> $LOG 2>&1

echo "=== lab: pipeline e2e ===" >> $LOG
timeout 1800 python bench/r3_perf_lab.py pipeline >> $LOG 2>&1

echo "=== lab: exact-tier e2e ===" >> $LOG
timeout 1800 python bench/r3_perf_lab.py exact >> $LOG 2>&1

echo "=== lab: pallas tile sweep ===" >> $LOG
timeout 2400 python bench/r3_perf_lab.py chain-tiles >> $LOG 2>&1

echo "=== bench.py headline ===" >> $LOG
timeout 1200 python bench.py >> $LOG 2>&1

echo "=== bench_suite ===" >> $LOG
timeout 2400 python bench_suite.py >> $LOG 2>&1

date >> $LOG
echo DONE >> $LOG
