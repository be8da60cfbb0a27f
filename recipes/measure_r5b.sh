#!/bin/bash
# Round-5 follow-up measurements (run AFTER measure_all.sh completes, in a
# QUIET window — single-core box: any concurrent CPU work pollutes wall
# clocks).  Same stage machinery/resume-guard as measure_all.sh.
#
#   setsid nohup bash recipes/measure_r5b.sh \
#       > /tmp/measure_r5b.log 2>&1 & echo $! > /tmp/measure_r5b.pid
#
# Stages:
#   quality_min4       quality table on utterances >= 4 s (the first pass
#                      included 2.1-3.5 s items whose 0.1-1.5 s ground-truth
#                      continuations make duration_ratio meaningless)
#   sweep2_greedy_L{8,16,32}  clean re-take of the greedy lane sweep — the
#                      first pass's L16/L32 windows were CPU-contended by a
#                      builder session (single core); also the anchor for
#                      the bench-headline decision
#   sweep2_greedy_L8_nokv     same but WITHOUT --kv-fp8 — direct comparison
#                      against round 3's recorded B=8 numbers (fp8-only:
#                      plain 1137 f/s, tau=8 1714 f/s) to locate the scope
#                      change in the advisor-fix timing rework
set -u
cd "$(dirname "$0")/.."
WORK=${WORK:-/tmp/spec830}
MEAS=${MEAS:-$WORK/measure_r5}
CKPT=${CKPT:-$WORK/exp/ckpt_latest}
EVAL=${EVAL:-$WORK/corpus/eval}
BINS=${BINS:-2048}
mkdir -p "$MEAS"

valid() {
  python - "$1" <<'EOF'
import json, sys
txt = open(sys.argv[1]).read().strip()
if not txt:
    sys.exit(1)
try:
    json.loads(txt)
    sys.exit(0)
except Exception:
    pass
try:
    json.loads(txt.splitlines()[-1])
    sys.exit(0)
except Exception:
    sys.exit(1)
EOF
}

FAILED=0
stage() {
  local name=$1 tmo=$2; shift 2
  if [ -f "$MEAS/$name.json" ] && valid "$MEAS/$name.json"; then
    echo "== $name: already done (skip)"
    return 0
  fi
  echo "== $name: running  [$(date -u +%H:%M:%S)]"
  if timeout "$tmo" "$@" > "$MEAS/$name.json.tmp" 2> "$MEAS/$name.log" \
      && valid "$MEAS/$name.json.tmp"; then
    mv "$MEAS/$name.json.tmp" "$MEAS/$name.json"
    echo "== $name: OK  [$(date -u +%H:%M:%S)]"
  else
    echo "== $name: FAILED (see $MEAS/$name.log)  [$(date -u +%H:%M:%S)]"
    FAILED=1
  fi
}

ACC="python spec_acceptance_cli.py --model $CKPT --eval-dir $EVAL
     --codec-bins $BINS"

stage quality_min4 14400 \
  python quality_cli.py --model "$CKPT" --eval-dir "$EVAL" \
    --codec-bins "$BINS" --n 8 --min-sec 4

for L in 8 16 32; do
  stage "sweep2_greedy_L$L" 7200 \
    $ACC --taus 8 --lanes "$L" --skip-single --skip-engine --fp8 --kv-fp8
done

stage sweep2_greedy_L8_nokv 7200 \
  $ACC --taus 8 --lanes 8 --skip-single --skip-engine --fp8

echo "== r5b: all stages attempted; failed=$FAILED"
exit $FAILED
