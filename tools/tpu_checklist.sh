#!/bin/bash
# Post-outage TPU measurement checklist (memory/round3-state.md).
# Runs the full data-collection sequence unattended and saves everything
# under /tmp/r3_measure/. Safe to re-run; each step is bounded.
set -u
OUT=/tmp/r3_measure
mkdir -p "$OUT"
cd /root/repo

stamp() { date +"%H:%M:%S"; }

echo "[$(stamp)] 1/4 full bench (CenterPoint bs=4 + ConQueR)"
timeout 3500 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.log"
echo "bench rc=$?"; cat "$OUT/bench.json" || true

echo "[$(stamp)] 2/4 box-attention A/B"
timeout 1800 python tools/bench_boxattn.py window_dense_mxu window_gather_dec window_gather_dec_rows \
  > "$OUT/boxattn.log" 2>&1
echo "boxattn rc=$?"

echo "[$(stamp)] 3/4 ConQueR trace"
timeout 1800 python tools/trace_conquer.py > "$OUT/trace_conquer.log" 2>&1
echo "trace_conquer rc=$?"

echo "[$(stamp)] 4/4 CenterPoint step trace"
timeout 1800 python tools/trace_step.py > "$OUT/trace_step.log" 2>&1
echo "trace_step rc=$?"

echo "[$(stamp)] checklist done"
