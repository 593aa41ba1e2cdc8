#!/bin/bash
# Official N-vs-4N scaling pair, interleaved protocol (round-5 BENCH.md):
# for each of 2 rounds, run the local[2] leg then the local[8] leg, each
# a full build + fresh-process 1024-query batch (min of 2 timed batches).
# Pre-flight: wait (up to 10 min) for 1-min load < 0.5; if the box never
# quiets, the leg STILL RUNS but its leg_start record carries
# "preflight_failed": true so downstream analysis can exclude it
# (round-5 ADVICE: the silent fall-through made contaminated legs look
# protocol-valid).
set -u
set -o pipefail
cd /root/repo
OUT=${OUT:-/tmp/official_pair_$(date +%H%M).jsonl}
LOGDIR=${LOGDIR:-/tmp/official_pair_logs}
mkdir -p "$LOGDIR"
echo "writing $OUT (stderr logs in $LOGDIR)"
for round in 1 2; do
  for cores in 2 8; do
    # idle pre-flight: wait (up to 10 min) for load < 0.5
    preflight_ok=0
    for i in $(seq 1 60); do
      load=$(cut -d' ' -f1 /proc/loadavg)
      if python3 -c "import sys; sys.exit(0 if $load < 0.5 else 1)"; then
        preflight_ok=1
        break
      fi
      sleep 10
    done
    load=$(cut -d' ' -f1 /proc/loadavg)
    leg="round${round}_local${cores}"
    if [ "$preflight_ok" = "1" ]; then
      echo "{\"leg_start\": \"$leg\", \"load\": $load, \"ts\": \"$(date -Is)\"}" >> "$OUT"
    else
      echo "{\"leg_start\": \"$leg\", \"load\": $load, \"preflight_failed\": true, \"ts\": \"$(date -Is)\"}" >> "$OUT"
    fi
    # per-leg stderr log + explicit failure record: every leg_start gets
    # a paired outcome line even when the bench dies (round-5 ADVICE —
    # a failed leg used to silently desynchronize the JSONL)
    errlog="$LOGDIR/${leg}.stderr"
    if SCALE_QUERIES=1024 SCALE_FRESH_QUERY=1 SCALE_QUERY_REPEATS=2 \
        python3 bench_scaling.py --worker "$cores" 768000 2>"$errlog" \
        | grep '^{' | tail -1 >> "$OUT"; then
      :
    else
      rc=$?
      echo "{\"leg_failed\": \"$leg\", \"rc\": $rc, \"stderr\": \"$errlog\"}" >> "$OUT"
    fi
  done
done
echo DONE >> "$OUT"
