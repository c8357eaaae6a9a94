"""Merge N sharded selfcheck outputs into ONE sweep report (round 11,
VERDICT r10 #7 — the sweep wall-clock fix: tools/sweep_sf01.sh fans the
203-query contract across worker processes via ``selfcheck.py --shard
K/N`` and this tool reassembles the exact single-process output format).

Records are regrouped (a record is every line from one ``OK``/``FAIL``/
``ALLOW``/``rows`` prefix to the next — FAIL records span their detail
lines), sorted by query name so the merged report is byte-deterministic
regardless of shard finishing order, and the per-shard ``X/Y passed``
summaries are SUMMED into the one combined summary line the committed
artifact gate greps for (tests/test_entry_contract.py
test_latest_sweep_covers_current_contract). Exit 1 if any shard failed
any query or a shard file is missing its summary (a crashed worker must
not read as a short-but-green sweep).

Usage: python tools/sweep_merge.py shard0.txt shard1.txt ...
"""

from __future__ import annotations

import re
import sys

_REC = re.compile(r"^(OK|FAIL|ALLOW|rows) +(\S+?):")
_SUM = re.compile(r"^(\d+)/(\d+) passed$")


def merge(texts: list[str]):
    """Returns (records, passed, total, failing) where records is a list
    of (query_name, record_text) across all shards."""
    records: list[tuple[str, str]] = []
    passed = total = 0
    failing: list[str] = []
    for text in texts:
        cur_name, cur_lines, summed = None, [], False

        def close():
            nonlocal cur_name, cur_lines
            if cur_name is not None:
                # rstrip: the pre-summary blank separator is cosmetic, but
                # interior blank lines (Spark exception text in a FAIL
                # diagnostic routinely contains them — review r11) belong
                # to the record and are preserved
                records.append((cur_name, "\n".join(cur_lines).rstrip()))
            cur_name, cur_lines = None, []

        for line in text.splitlines():
            m = _REC.match(line)
            s = _SUM.match(line.strip())
            if m:
                close()
                cur_name, cur_lines = m.group(2), [line]
            elif s:
                close()
                passed += int(s.group(1))
                total += int(s.group(2))
                summed = True
            elif line.startswith("failing:"):
                close()
                failing += [
                    x.strip() for x in line[len("failing:"):].split(",")
                    if x.strip()
                ]
            elif cur_name is not None:
                cur_lines.append(line)  # FAIL detail lines, blanks included
        close()
        if not summed:
            raise SystemExit(
                "a shard output has no 'X/Y passed' summary — the worker "
                "crashed; the merged sweep is invalid"
            )
    records.sort(key=lambda r: r[0])
    return records, passed, total, sorted(failing)


def main() -> int:
    texts = []
    for path in sys.argv[1:]:
        with open(path) as f:
            texts.append(f.read())
    if not texts:
        raise SystemExit("usage: sweep_merge.py shard0.txt [shard1.txt ...]")
    records, passed, total, failing = merge(texts)
    for _, rec in records:
        print(rec)
    print(f"\n{passed}/{total} passed")
    if failing:
        print("failing:", ", ".join(failing))
    return 1 if (failing or passed != total) else 0


if __name__ == "__main__":
    raise SystemExit(main())
