"""Viterbi decoding — exact maximum-a-posteriori state sequence of a
hidden Markov model (Viterbi 1967; Forney 1973), the canonical
dynamic program behind POS tagging, segmentation and OCR layout
labelling. All model parameters are INTEGER additive scores (log-
space weights fixed by contract), so the DP, its tie-breaks and the
backtracked path are bit-reproducible and SQL-replayable.

Contract (the oracle replays it step by step):
  observations o_t = 0 if len(token_t) <= 4 else 1 over the first
  ``cap`` tokens of text.split(' ')
  start  = (0, -2)
  trans  = [[+1, -3], [-3, +1]]   (stay rewarded, switch penalized)
  emit   = [[+2, -1], [-1, +2]]   (state s matches class s)
  dp_t(s) = max_p dp_{t-1}(p) + trans[p][s] + emit[s][o_t]
  ties (predecessor argmax AND final argmax) break to state 0.

Output per doc: (doc_id, n_obs, best_score, path, n_switches) where
path is the decoded '0'/'1' string and n_switches counts adjacent
state changes — a burstiness/segmentation signal.

100-TB shape: capped per-doc DP -> one shuffle-free map_batches
pass (the ops/lz / ops/periodicity discipline)."""

from __future__ import annotations

import pyarrow as pa

START = (0, -2)
TRANS = ((1, -3), (-3, 1))
EMIT = ((2, -1), (-1, 2))


def viterbi_decode(text: str, cap: int = 10) -> tuple[int, int, str, int]:
    """Decode one document. Returns (n_obs, best_score, path,
    n_switches)."""
    toks = (text or "").split(" ")[:cap]
    obs = [0 if len(t) <= 4 else 1 for t in toks]
    n = len(obs)
    if n == 0:  # unreachable for str.split(' ') (always >= 1 token)
        return 0, 0, "", 0
    dp = [START[0] + EMIT[0][obs[0]], START[1] + EMIT[1][obs[0]]]
    paths = ["0", "1"]
    for t in range(1, n):
        ndp, npaths = [0, 0], ["", ""]
        for s in (0, 1):
            c0 = dp[0] + TRANS[0][s]
            c1 = dp[1] + TRANS[1][s]
            if c0 >= c1:  # tie -> predecessor 0
                ndp[s] = c0 + EMIT[s][obs[t]]
                npaths[s] = paths[0] + str(s)
            else:
                ndp[s] = c1 + EMIT[s][obs[t]]
                npaths[s] = paths[1] + str(s)
        dp, paths = ndp, npaths
    best = 0 if dp[0] >= dp[1] else 1  # tie -> state 0
    path = paths[best]
    switches = sum(1 for a, b in zip(path, path[1:]) if a != b)
    return n, dp[best], path, switches


def viterbi_docs(ds, id_col: str, text_col: str, cap: int = 10):
    """Dataset of per-doc Viterbi decodes."""

    def fold(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        texts = b[text_col].to_pylist()
        n_, sc, pth, sw = [], [], [], []
        for t in texts:
            n, s, p, w = viterbi_decode(t, cap)
            n_.append(n)
            sc.append(s)
            pth.append(p)
            sw.append(w)
        return pa.table(
            {
                id_col: pa.array(ids),
                "n_obs": pa.array(n_, pa.int64()),
                "best_score": pa.array(sc, pa.int64()),
                "path": pa.array(pth, pa.string()),
                "n_switches": pa.array(sw, pa.int64()),
            }
        )

    return ds.map_batches(fold, batch_format="pyarrow")
