"""Realistic-duplication documents fixture for the 10x scale probe
(VERDICT r6 item 1).

The tiled probe (tools/gen_sf_probe.py) preserves marginal distributions
but manufactures ~copies-member near-dup CLIQUES (each doc and its 9
salted copies), which makes pair-producing operators grow with the
artificial pair count (971x at 10x) and turns every super-linear probe
flag into manual forensics. This generator replaces the documents table
with a corpus whose duplication is CONFIGURABLE and realistic:

- length/lang/source marginals match the driver fixture (uniform 10-100
  token lengths — fixture: min 10 / max 100 / mean 54; en 41%,
  zh/es/fr 15%, de 14%; 20 uniform sources);
- the VOCABULARY scales with the corpus (Heaps' law, V ~ 30·sqrt(N
  tokens)) and tokens are zipf-distributed over it. This matters for
  probe interpretability: a fixed tiny vocabulary (the fixture's 31
  words) makes chance shingle collisions grow LINEARLY with corpus size,
  so candidate volume in prefix-filtered similarity joins grows
  quadratically even when the TRUE pair count is linear — measured
  45x runtime at a 10x step before this change, 10x after. Real corpora
  grow vocabulary with size, which is exactly what keeps candidate
  density flat at 100 TB;
- a ``dup_rate`` fraction of docs (default 10%) belong to near-dup
  clusters with REALISTIC sizes — mostly pairs (75%), occasionally 3-5
  (15/7/3%), never a copies-sized clique;
- each non-base member is a token-level perturbation of its base: 1-2
  random token replacements, plus a 30% chance of trimming/extending
  1-3 tokens (length jitter) — near-dup in the 3-gram-jaccard sense,
  never byte-identical;
- member ids are shuffled across the corpus so cluster members are not
  id-adjacent, and lang/source are drawn independently per member
  (cross-source duplication, like real web crawl dups).

Because the dup RATE is scale-invariant, pair count grows ~linearly with
corpus size, which is what makes probe ratios interpretable: a
pair-family operator whose runtime grows faster than its output rows is
a real defect, not a fixture artifact.

Deterministic: seeded numpy Generator; same (n_docs, dup_rate, seed)
always produces the identical parquet. Correctness stays graded at
sf0.01/sf0.1 against the driver fixtures; this corpus exists only for
the timing/growth probe.

Usage: python tools/gen_sf_realistic_docs.py OUT_DIR N_DOCS [DUP_RATE] [SEED]
e.g.   python tools/gen_sf_realistic_docs.py /tmp/sfreal01 5000
       python tools/gen_sf_realistic_docs.py /tmp/sfreal1 50000
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
CLUSTER_SIZES = [2, 3, 4, 5]
CLUSTER_P = [0.75, 0.15, 0.07, 0.03]
MEAN_TOKENS = 55  # uniform(10, 100)


def generate(n_docs: int, dup_rate: float, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    # Heaps' law vocabulary: V ~ K * N_tokens^0.5 (K=30), zipf token
    # frequencies (exponent ~1.05). Keeps chance shingle-collision
    # density flat as the corpus grows — see module docstring.
    v_size = max(100, int(30 * (n_docs * MEAN_TOKENS) ** 0.5))
    vocab = np.array([f"w{i:06d}" for i in range(v_size)])
    w = 1.0 / np.arange(1, v_size + 1) ** 1.05
    zipf_p = w / w.sum()

    def draw(n: int) -> np.ndarray:
        return vocab[rng.choice(v_size, size=n, p=zipf_p)]

    def fresh_tokens() -> np.ndarray:
        return draw(int(rng.integers(10, 101)))

    def perturb(base: np.ndarray) -> np.ndarray:
        t = base.copy()
        for pos in rng.choice(len(t), size=int(rng.integers(1, 3)),
                              replace=False):
            t[pos] = draw(1)[0]
        if rng.random() < 0.3:  # length jitter: trim or extend 1-3 tokens
            d = int(rng.integers(1, 4))
            if rng.random() < 0.5 and len(t) > 10 + d:
                t = t[:-d]
            else:
                t = np.concatenate([t, draw(d)])
        return t

    texts: list[str] = []
    n_dup_members = int(n_docs * dup_rate)
    while n_dup_members - len(texts) >= 2:
        size = int(rng.choice(CLUSTER_SIZES, p=CLUSTER_P))
        size = min(size, n_dup_members - len(texts))
        base = fresh_tokens()
        texts.append(" ".join(base))
        for _ in range(size - 1):
            texts.append(" ".join(perturb(base)))
    while len(texts) < n_docs:
        texts.append(" ".join(fresh_tokens()))

    order = rng.permutation(n_docs)  # cluster members not id-adjacent
    texts = [texts[i] for i in order]
    return pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(LANGS, size=n_docs, p=LANG_P),
            "source": [f"src{i}" for i in rng.integers(0, 20, size=n_docs)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def main() -> None:
    out_dir = sys.argv[1]
    n_docs = int(sys.argv[2])
    dup_rate = float(sys.argv[3]) if len(sys.argv) > 3 else 0.10
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 42
    os.makedirs(out_dir, exist_ok=True)
    df = generate(n_docs, dup_rate, seed)
    df.to_parquet(os.path.join(out_dir, "documents.parquet"), index=False)
    print(
        f"[gen] {out_dir}/documents.parquet: {n_docs} docs, "
        f"dup_rate={dup_rate}, seed={seed}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
