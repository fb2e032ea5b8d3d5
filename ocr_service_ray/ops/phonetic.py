"""Phonetic-style blocking for entity resolution: consonant-skeleton
keys (lowercase → strip non-letters → strip vowels → collapse letter
runs) and per-block candidate-pair statistics.

Soundex-family codes need per-character state machines; the
consonant skeleton keeps their doubled-letter / vowel-insensitivity
robustness while staying a pure regex pipeline — RE2-safe (no
backreferences: run collapsing is a chain of per-letter ``bb+ -> b``
replacements), so the EXACT same transform runs vectorized in
pyarrow.compute on the engine side and as generated nested
``regexp_replace`` calls in the DuckDB oracle.

Distributed shape: one stateless vectorized map (pipelines with the
read) + one combiner count per skeleton — candidate pairs are never
materialized, only counted per block (n·(n−1)/2), which is what a
blocking-quality audit needs. The repo's fuzzy matcher
(kernels/correct.py) and SNM / blocking_eval queries cover the
verify stage; this op is the scalable block-construction side.
"""

from __future__ import annotations

import string

import pyarrow as pa
import pyarrow.compute as pc

_CONSONANTS = [c for c in string.ascii_lowercase if c not in "aeiouy"]


def skeleton_array(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Consonant skeleton of a utf8 column, fully vectorized."""
    x = pc.utf8_lower(col)
    x = pc.replace_substring_regex(x, pattern="[^a-z]", replacement="")
    x = pc.replace_substring_regex(x, pattern="[aeiouy]", replacement="")
    for ch in _CONSONANTS:
        x = pc.replace_substring_regex(
            x, pattern=f"{ch}{ch}+", replacement=ch
        )
    return x


def skeleton_sql(expr: str) -> str:
    """The identical transform as a DuckDB SQL expression over
    ``expr`` (RE2 semantics on both sides)."""
    s = f"regexp_replace(regexp_replace(lower({expr}), '[^a-z]', '', 'g'), '[aeiouy]', '', 'g')"
    for ch in _CONSONANTS:
        s = f"regexp_replace({s}, '{ch}{ch}+', '{ch}', 'g')"
    return s


def blocking_stats(ds, col: str):
    """Per-skeleton block sizes and candidate-pair counts (blocks of
    size >= 2 only — singleton blocks generate no pairs). Returns a
    pandas DataFrame (skeleton, n_members, n_pairs), all-int64 pair
    math."""
    from .agg import grouped_agg

    def key(b: pa.Table) -> pa.Table:
        return pa.table({"skeleton": skeleton_array(b[col])})

    counts = grouped_agg(
        ds.map_batches(key, batch_format="pyarrow"),
        ["skeleton"],
        {"n_members": (None, "count")},
    ).to_pandas()
    counts = counts[counts["n_members"] >= 2].reset_index(drop=True)
    counts["n_members"] = counts["n_members"].astype("int64")
    counts["n_pairs"] = counts["n_members"] * (counts["n_members"] - 1) // 2
    return counts.sort_values("skeleton").reset_index(drop=True)
