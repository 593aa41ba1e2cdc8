#!/bin/bash
# Official N-vs-4N scaling pair, interleaved protocol (round-5 BENCH.md):
# for each of 2 rounds, run the local[2] leg then the local[8] leg, each
# a full build + fresh-process 1024-query batch (min of 2 timed batches).
# Pre-flight: refuse to start a leg until 1-min load < 0.5.
# Output: one JSON line per leg to $OUT.
set -u
cd /root/repo
OUT=${OUT:-/tmp/official_pair_$(date +%H%M).jsonl}
echo "writing $OUT"
for round in 1 2; do
  for cores in 2 8; do
    # idle pre-flight: wait (up to 10 min) for load < 0.5
    for i in $(seq 1 60); do
      load=$(cut -d' ' -f1 /proc/loadavg)
      ok=$(python3 -c "print(1 if $load < 0.5 else 0)")
      [ "$ok" = "1" ] && break
      sleep 10
    done
    load=$(cut -d' ' -f1 /proc/loadavg)
    echo "{\"leg_start\": \"round${round}_local${cores}\", \"load\": $load, \"ts\": \"$(date -Is)\"}" >> "$OUT"
    SCALE_QUERIES=1024 SCALE_FRESH_QUERY=1 SCALE_QUERY_REPEATS=2 \
      python bench_scaling.py --worker "$cores" 768000 2>/dev/null \
      | grep '^{' | tail -1 >> "$OUT"
  done
done
echo DONE >> "$OUT"
