#!/bin/sh
# Per-round full-contract sweep at sf0.1 — the scale-robustness gate on top
# of the driver's sf0.01 grading. Strict (bit-exact) mode. The only
# tolerance-graded divergence is the HLL sketch pair outside its set/coupon
# regime (SCALE.md "Aggregation": at sf0.1 the sketches estimate honestly
# and diverge from COUNT(DISTINCT) by design; the rsd contract is pinned in
# tests/test_approx.py). Round 13 (VERDICT r12 #7): the bands are DECLARED
# in the contract (__spark_entry__.tolerances()) and selfcheck consults
# them automatically — in-band estimates (with every non-sketch column
# still bit-exact) print OK (within declared band ...), so the sweep has
# ZERO ALLOW rows and no --allow flag exists anymore.
#
# Round 11 (VERDICT r10 #7): the sweep is SHARDED — $SWEEP_SHARDS worker
# processes (default 3, each its own Spark session on CPUS/N cores) run
# disjoint deterministic slices (selfcheck.py --shard K/N over the sorted
# name list) and tools/sweep_merge.py reassembles the byte-deterministic
# single-report format with ONE combined "N/N passed" line. Set
# SWEEP_SHARDS=1 for the old single-process behavior.
#
# Usage: sh tools/sweep_sf01.sh | tee SWEEP_r<N>_sf01.txt
cd "$(dirname "$0")/.." || exit 1
SHARDS="${SWEEP_SHARDS:-3}"
if [ "$SHARDS" -le 1 ]; then
    exec python tools/selfcheck.py --sf /root/testdata/sf0.1 --exact "$@"
fi
CPUS="${SPARK_GRAFT_CPUS:-32}"
PER=$((CPUS / SHARDS))
[ "$PER" -lt 4 ] && PER=4
tmp="$(mktemp -d)" || exit 1
trap 'rm -rf "$tmp"' EXIT
i=0
pids=""
while [ "$i" -lt "$SHARDS" ]; do
    SPARK_GRAFT_CPUS="$PER" python tools/selfcheck.py \
        --sf /root/testdata/sf0.1 --exact \
        --shard "$i/$SHARDS" "$@" \
        > "$tmp/shard$i.txt" 2> "$tmp/shard$i.err" &
    pids="$pids $!"
    i=$((i + 1))
done
rc=0
for p in $pids; do
    wait "$p" || rc=1
done
python tools/sweep_merge.py "$tmp"/shard*.txt || rc=1
# on ANY failure, surface the per-shard stderr tails BEFORE the trap
# removes $tmp — a crashed worker's traceback lives only there
# (review r11: the first cut deleted the evidence it told you to read)
if [ "$rc" -ne 0 ]; then
    for err in "$tmp"/shard*.err; do
        echo "=== $(basename "$err") (last 40 lines) ===" >&2
        tail -40 "$err" >&2
    done
fi
exit $rc
