#!/bin/bash
# Round-5 third measurement pass (run AFTER measure_r5b.sh, QUIET window).
# Same stage machinery/resume-guard as measure_all.sh.
#
#   setsid nohup bash recipes/measure_r5c.sh \
#       > /tmp/measure_r5c.log 2>&1 & echo $! > /tmp/measure_r5c.pid
#
# Stages:
#   train_profile2    cost-attribution ladder, re-run after the OOM fix
#                     (bench.py timed() held two 3.3 GB grads pytrees; the
#                     undonated update rung peaked at ~5 param-sized
#                     buffers — both fixed, rungs now match the trainer's
#                     memory profile)
#   stream_pipe2 / stream_nopipe2   pipelined streaming A/B, re-run after
#                     the FailedPrecondition fix (eager jnp.copy held a
#                     read on the buffer the next burst donated; now a
#                     non-donating burst-fn variant).  nopipe retaken in
#                     the same window for a like-for-like A/B.
#   sweep2_stoch_L{8,16,32}   stochastic lane sweep retake — the first
#                     pass's windows (16:47-17:14) overlapped the previous
#                     builder session's active turns (single core).
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

stage train_profile2 7200 \
  python bench.py --train-profile --train-attn chunked --train-remat attn \
    --train-batch 11

stage stream_pipe2 7200 python bench.py --stream --burst 24
stage stream_nopipe2 7200 python bench.py --stream --burst 24 \
  --stream-no-pipeline

for L in 8 16 32; do
  stage "sweep2_stoch_L$L" 7200 \
    $ACC --taus 8 --lanes "$L" --skip-single --skip-engine --fp8 --kv-fp8 \
      --temperature 0.8 --spec-sampling stochastic \
      --spec-draft-temperature 0.1
done

echo "== r5c: all stages attempted; failed=$FAILED"
exit $FAILED
