#!/bin/bash
# Poll the box regime; when the per-job overhead probe reports HEALTHY
# (median < 250 ms), immediately run the canonical sf0.1 bench and a
# follow-up probe, saving everything under /tmp/r12_bench_healthy.*.
# One-shot: exits after the first healthy-regime bench.
cd /root/repo
for i in $(seq 1 60); do
  line=$(PYTHONPATH=/root/repo python scripts/probe_regime.py 2>/dev/null | tail -1)
  echo "$(date +%H:%M:%S) $line" >> /tmp/r12_regime_watch.log
  if echo "$line" | grep -q HEALTHY; then
    echo "$line" > /tmp/r12_bench_healthy_regime.txt
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      python bench.py 2>/dev/null | tail -1 > /tmp/r12_bench_healthy.json
    PYTHONPATH=/root/repo python scripts/probe_regime.py 2>/dev/null | tail -1 \
      >> /tmp/r12_bench_healthy_regime.txt
    exit 0
  fi
  sleep 240
done
exit 1
