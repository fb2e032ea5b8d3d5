"""Deterministic negative sampling for contrastive / recommender
training pairs.

For every user, draw ``k`` items the user did NOT interact with:
candidate j (j = 0, 1, ...) is ``vocab[md5(salt:user:j) % |vocab|]``;
candidates that collide with the user's positives or with an earlier
candidate are skipped, and the first ``k`` survivors win. Zero RNG —
the same negatives on every run, cluster and partitioning, and the
whole draw is SQL-reproducible (md5 hex parse + generate_series).

Scale shape: positives shuffle once by user (bucketed key shuffle);
the item vocabulary rides the closure (vocabulary-bounded, same
contract as the corrections broadcast — ``ray.put`` it for
million-item catalogs). ``tries`` bounds the rejection loop: a user
whose positives cover most of the vocabulary may get fewer than k
negatives (emitted as-is; the SQL mirror does the same).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .agg import bucketed_map_groups
from .relational import distinct_values


def negative_sampling(
    pos_ds,
    user_col: str,
    item_col: str,
    k: int = 5,
    tries: int = 25,
    salt: str = "neg",
):
    """(user_col, neg_item, rank) — k deterministic negatives per user."""
    vocab = distinct_values(pos_ds, item_col)
    n_vocab = len(vocab)
    vocab_arr = np.asarray(vocab)

    def fold(g: pd.DataFrame) -> pd.DataFrame | None:
        user = g[user_col].iloc[0]
        positives = set(g[item_col])
        out, seen = [], set()
        for j in range(tries):
            h = int(hashlib.md5(f"{salt}:{user}:{j}".encode()).hexdigest()[:15], 16)
            item = vocab_arr[h % n_vocab]
            if item in positives or item in seen:
                continue
            seen.add(item)
            out.append((user, item, len(out)))
            if len(out) == k:
                break
        if not out:
            return None
        return pd.DataFrame(out, columns=[user_col, "neg_item", "rank"])

    return bucketed_map_groups(pos_ds, [user_col], fold)
