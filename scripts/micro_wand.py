"""Micro-benchmark for the _wand_multi per-block bound computation (r3
verdict item 2): the old per-block Python loop vs the vectorized
np.maximum.reduceat now in query.py:~1210. Synthetic shapes modeled on a
100x-scale shard: n_blocks block doc-ranges bounded against a decoded
term's (docs, contribs) arrays. Prints one JSON line with both timings.

Run: python scripts/micro_wand.py [n_blocks] [n_docs]
"""

import json
import sys
import time

import numpy as np


def loop_bounds(con2, lo, hi):
    """The r3 implementation (query.py:1211-1213 before the fix)."""
    mx = np.zeros(len(lo))
    for j in range(len(lo)):
        if hi[j] > lo[j]:
            mx[j] = con2[lo[j]:hi[j]].max()
    return mx


def reduceat_bounds(con2, lo, hi):
    """The vectorized replacement (verbatim shape from query.py)."""
    mx = np.zeros(len(lo))
    nz = hi > lo
    if nz.any():
        ext = np.append(con2, 0.0)
        idx = np.empty(2 * int(nz.sum()), np.int64)
        idx[0::2] = lo[nz]
        idx[1::2] = hi[nz]
        mx[nz] = np.maximum.reduceat(ext, idx)[0::2]
    return mx


def main() -> None:
    n_blocks = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    rng = np.random.default_rng(7)
    # decoded term: sorted doc ids + positive contributions
    docs2 = np.sort(rng.choice(n_docs * 4, size=n_docs, replace=False))
    con2 = rng.random(n_docs) * 3.0
    # block doc ranges: sorted starts, width ~ docs-per-block
    fd = np.sort(rng.integers(0, n_docs * 4, size=n_blocks))
    ld = fd + rng.integers(1, 512, size=n_blocks)
    lo = np.searchsorted(docs2, fd, side="left")
    hi = np.searchsorted(docs2, ld, side="right")

    t0 = time.perf_counter()
    a = reduceat_bounds(con2, lo, hi)
    t_vec = time.perf_counter() - t0

    t0 = time.perf_counter()
    b = loop_bounds(con2, lo, hi)
    t_loop = time.perf_counter() - t0

    assert np.allclose(a, b), "vectorized bounds diverge from the loop"

    # --- VERIFY-phase slack/need (r4 verdict item 4): all blocks skipped ---
    docs_c = docs2  # candidate doc set from decoded blocks
    scores_c = con2
    ub = rng.random(n_blocks) * 2.0
    skipped = np.arange(n_blocks, dtype=np.int64)

    t0 = time.perf_counter()
    slack_l = np.zeros(len(docs_c))
    for r in skipped:  # the r4 implementation (query.py:1365-1369 pre-fix)
        l = np.searchsorted(docs_c, fd[r], side="left")
        h = np.searchsorted(docs_c, ld[r], side="right")
        slack_l[l:h] += ub[r]
    cand_l = scores_c + slack_l >= 1.0
    cd = docs_c[cand_l]
    need_l = [
        r for r in skipped
        if np.searchsorted(cd, fd[r], "left") < np.searchsorted(cd, ld[r], "right")
    ]
    t_vloop = time.perf_counter() - t0

    t0 = time.perf_counter()
    lo2 = np.searchsorted(docs_c, fd[skipped], side="left")
    hi2 = np.searchsorted(docs_c, ld[skipped], side="right")
    nd1 = len(docs_c) + 1
    diff = np.bincount(lo2, weights=ub[skipped], minlength=nd1) - np.bincount(
        hi2, weights=ub[skipped], minlength=nd1
    )
    slack_v = np.cumsum(diff[:-1])
    cand_v = scores_c + slack_v >= 1.0
    cdv = docs_c[cand_v]
    need_v = skipped[
        np.searchsorted(cdv, fd[skipped], "left")
        < np.searchsorted(cdv, ld[skipped], "right")
    ]
    t_vvec = time.perf_counter() - t0

    assert np.allclose(slack_l, slack_v), "diff-array slack diverges"
    assert np.array_equal(np.asarray(need_l), need_v), "need set diverges"

    print(json.dumps({
        "n_blocks": n_blocks,
        "n_docs": n_docs,
        "loop_sec": round(t_loop, 4),
        "reduceat_sec": round(t_vec, 4),
        "speedup": round(t_loop / t_vec, 1) if t_vec > 0 else None,
        "verify_loop_sec": round(t_vloop, 4),
        "verify_vec_sec": round(t_vvec, 4),
        "verify_speedup": round(t_vloop / t_vvec, 1) if t_vvec > 0 else None,
    }))


if __name__ == "__main__":
    main()
