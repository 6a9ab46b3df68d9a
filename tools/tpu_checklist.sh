#!/bin/bash
# Post-outage TPU measurement checklist.
# Runs the full data-collection sequence unattended and saves everything
# under /tmp/r3_measure/. Safe to re-run; each step is bounded.
set -u
OUT=/tmp/r3_measure
mkdir -p "$OUT"
cd /root/repo

stamp() { date +"%H:%M:%S"; }

echo "[$(stamp)] 1/8 baseline bench (CenterPoint bs=4 + ConQueR, defaults)"
timeout 3500 python bench.py > "$OUT/bench.json" 2> "$OUT/bench.log"
echo "bench rc=$?"; cat "$OUT/bench.json" || true

echo "[$(stamp)] 2/8 bench A/B: rank kernel seq4"
BENCH_BS=4 EFG_RANK_IMPL=seq4 timeout 2400 python bench.py \
  > "$OUT/bench_seq4.json" 2> "$OUT/bench_seq4.log"
echo "rc=$?"; cat "$OUT/bench_seq4.json" || true

echo "[$(stamp)] 3/8 bench A/B: group-merged grid g3"
BENCH_BS=4 EFG_SPARSE_G3=1 timeout 2400 python bench.py \
  > "$OUT/bench_g3.json" 2> "$OUT/bench_g3.log"
echo "rc=$?"; cat "$OUT/bench_g3.json" || true

echo "[$(stamp)] 4/8 bench A/B: seq4 + g3"
BENCH_BS=4 EFG_RANK_IMPL=seq4 EFG_SPARSE_G3=1 timeout 2400 python bench.py \
  > "$OUT/bench_seq4_g3.json" 2> "$OUT/bench_seq4_g3.log"
echo "rc=$?"; cat "$OUT/bench_seq4_g3.json" || true

echo "[$(stamp)] 5/8 bench A/B: seq4 + g3 + TILE=2048"
BENCH_BS=4 EFG_RANK_IMPL=seq4 EFG_SPARSE_G3=1 EFG_SPARSE_TILE=2048 \
  timeout 2400 python bench.py \
  > "$OUT/bench_t2048.json" 2> "$OUT/bench_t2048.log"
echo "rc=$?"; cat "$OUT/bench_t2048.json" || true

echo "[$(stamp)] 6/8 box-attention A/B"
timeout 1800 python tools/bench_boxattn.py window_dense_mxu window_gather_dec window_gather_dec_rows \
  > "$OUT/boxattn.log" 2>&1
echo "boxattn rc=$?"

echo "[$(stamp)] 7/8 ConQueR trace"
timeout 1800 python tools/trace_conquer.py > "$OUT/trace_conquer.log" 2>&1
echo "trace_conquer rc=$?"

echo "[$(stamp)] 8/8 CenterPoint step trace (defaults)"
timeout 1800 python tools/trace_step.py > "$OUT/trace_step.log" 2>&1
echo "trace_step rc=$?"

echo "[$(stamp)] checklist done"
