#!/bin/sh
# Round-close gate runner: executes the full mechanical close sequence in
# the order the gates expect. Usage (from anywhere):
#
#   sh tools/round_close.sh <round-number>
#
# Prerequisites: the query contract is FROZEN (full_queries() final —
# operator edits after the sweep require re-running this script), and the
# 10x probe fixtures exist in /tmp (regenerate per boot):
#
#   python tools/gen_sf_probe.py /tmp/sfprobe1 10
#   python tools/gen_sf_realistic_docs.py /tmp/sfreal01 5000
#   python tools/gen_sf_realistic_docs.py /tmp/sfreal1 50000
#
# Steps (each is a committed artifact + a pytest gate):
#   1. full-contract sf0.1 sweep  -> SWEEP_r<N>_sf01.txt
#      (test_latest_sweep_covers_current_contract)
#   2. 10x probe, three batches   -> SWEEP_r<N>_sf1.txt + .json
#      (test_latest_sf1_probe_is_scale_clean; run with nothing else
#      heavy on the machine — it is timing-sensitive)
#   3. bench                      -> stdout JSON + BENCH_DETAIL.json
#   4. full pytest                -> must be green before committing
set -e
cd "$(dirname "$0")/.." || exit 1
N="$1"
[ -n "$N" ] || { echo "usage: sh tools/round_close.sh <round-number>" >&2; exit 2; }

echo "== 1/4 full-contract sf0.1 sweep =="
sh tools/sweep_sf01.sh > "SWEEP_r${N}_sf01.txt"
tail -1 "SWEEP_r${N}_sf01.txt"

echo "== 2/4 10x probe (3 batches) =="
python tools/sweep_sf1_probe.py /tmp/sfprobe1 --json "SWEEP_r${N}_sf1.json" > "SWEEP_r${N}_sf1.txt"
python tools/sweep_sf1_probe.py /tmp/sfprobe1 --batch2 --json "SWEEP_r${N}_sf1.json" >> "SWEEP_r${N}_sf1.txt"
python tools/sweep_sf1_probe.py --docs --json "SWEEP_r${N}_sf1.json" >> "SWEEP_r${N}_sf1.txt"

echo "== 3/4 bench =="
python bench.py

echo "== 4/4 full pytest =="
python -m pytest tests/ -q

echo "round ${N} close: all gates green — review SWEEP/BENCH diffs, then commit"
