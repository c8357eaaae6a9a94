#!/bin/sh
# Per-round full-contract sweep at sf0.1 — the scale-robustness gate on top
# of the driver's sf0.01 grading. Strict (bit-exact) mode; the only
# allow-listed divergence is the HLL sketch pair outside its set/coupon
# regime (SCALE.md "Aggregation": at sf0.1 the sketches estimate honestly
# and diverge from COUNT(DISTINCT) by design; the rsd contract is pinned in
# tests/test_approx.py). Since round 10 the allow is AUDITED, not blanket:
# selfcheck checks the estimates sit inside the documented HLL error band
# of the oracle's exact counts (and every non-sketch column still matches
# exactly), printing ALLOW(checked: ...) or FAILing outside the band.
#
# Usage: sh tools/sweep_sf01.sh | tee SWEEP_r<N>_sf01.txt
cd "$(dirname "$0")/.." || exit 1
exec python tools/selfcheck.py --sf /root/testdata/sf0.1 --exact \
    --allow sketch_users_daily,approx_distincts "$@"
