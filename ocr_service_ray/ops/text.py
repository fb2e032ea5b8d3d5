"""Text-analysis operators over a (doc_id, text, ...) table.

All hot-path kernels are vectorized pyarrow.compute / numpy — no
Python loop over rows except the C-speed hashlib calls. Regex
semantics are RE2 on both sides (pyarrow and DuckDB), so the oracle
SQL in ``__ray_entry__.py`` can reuse the exact same patterns.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Tokenization used by both the Ray kernel and the DuckDB oracle:
# single-space split (n_tokens) and non-whitespace runs (n_words).
WS_TOKEN_RE = r"\S+"
# BPE-ish pretokenizer: letter runs, digit runs, or a single
# non-space symbol (GPT-2-style coarse approximation).
BPE_TOKEN_RE = r"[A-Za-zА-Яа-яЁё]+|[0-9]+|[^A-Za-zА-Яа-яЁё0-9\s]"
PUNCT_RE = r"[.,;:!?]"
STOPWORDS = ("the", "a", "to", "of", "and", "in", "is")
STOPWORD_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"

# Tiny per-language stopword profiles for the heuristic language ID
# (n-gram/stopword heuristic; deterministic, not a trained model).
LANG_PROFILES = {
    "en": r"\b(the|and|of|to|in|is|that|for)\b",
    "es": r"\b(el|la|de|que|y|en|los|se)\b",
    "de": r"\b(der|die|und|das|ist|nicht|ein|zu)\b",
    "fr": r"\b(le|la|et|les|des|est|une|dans)\b",
    "ru": r"\b(и|в|не|на|что|с|по|как)\b",
}


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Add n_tokens / n_words / n_chars_utf / punct_ratio / stop_ratio.

    ``n_tokens`` uses single-space-split semantics (``count(' ')+1``)
    to match DuckDB ``length(string_split(text, ' '))`` exactly;
    ``n_words`` counts ``\\S+`` runs. Ratios are rounded to 6 dp in
    BOTH engines so float hashing is stable.
    """
    text = batch[text_col]
    n_tokens = pc.add(pc.count_substring(text, " "), 1)
    n_words = pc.count_substring_regex(text, WS_TOKEN_RE)
    n_chars = pc.utf8_length(text)
    n_punct = pc.count_substring_regex(text, PUNCT_RE)
    n_stop = pc.count_substring_regex(text, STOPWORD_RE)
    denom = pc.max_element_wise(n_chars, 1)
    punct_ratio = pc.round(pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(denom, pa.float64())), ndigits=6)
    tok_denom = pc.max_element_wise(n_words, 1)
    stop_ratio = pc.round(pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(tok_denom, pa.float64())), ndigits=6)
    return (
        batch.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
        .append_column("n_words", pc.cast(n_words, pa.int64()))
        .append_column("n_chars_utf", pc.cast(n_chars, pa.int64()))
        .append_column("punct_ratio", punct_ratio)
        .append_column("stop_ratio", stop_ratio)
    )


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Integer token statistics only (exact-match friendly: no float
    division anywhere) — n_tokens / n_words / n_chars_utf / n_punct /
    n_stop, all int64."""
    text = batch[text_col]
    cols = {
        "n_tokens": pc.add(pc.count_substring(text, " "), 1),
        "n_words": pc.count_substring_regex(text, WS_TOKEN_RE),
        "n_chars_utf": pc.utf8_length(text),
        "n_punct": pc.count_substring_regex(text, PUNCT_RE),
        "n_stop": pc.count_substring_regex(text, STOPWORD_RE),
    }
    for name, arr in cols.items():
        batch = batch.append_column(name, pc.cast(arr, pa.int64()))
    return batch


def bpe_token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Approximate BPE token count via the shared RE2 pretokenizer."""
    n = pc.count_substring_regex(batch[text_col], BPE_TOKEN_RE)
    return batch.append_column("n_bpe_tokens", pc.cast(n, pa.int64()))


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Composite document-quality heuristic (length / punctuation /
    stopword signals — the boilerplate-vs-prose shape of a
    trafilatura-style node score, applied per document). Components
    are emitted too so the oracle can check them independently.

    ``quality_micro`` is the oracle-discipline column: the same
    composite computed from the RAW (unrounded) ratios with the exact
    double expression mirrored in SQL, floored to micro units —
    bit-checkable against DuckDB. ``quality_score`` stays the 6 dp
    human-facing value."""
    t = token_stats(batch, text_col)
    n_words_i = t["n_words"].to_numpy(zero_copy_only=False)
    n_chars_i = t["n_chars_utf"].to_numpy(zero_copy_only=False)
    n_words = n_words_i.astype(np.float64)
    punct = t["punct_ratio"].to_numpy(zero_copy_only=False)
    stop = t["stop_ratio"].to_numpy(zero_copy_only=False)
    length_score = np.minimum(n_words / 100.0, 1.0)
    score = np.round(0.5 * length_score + 0.25 * (1.0 - np.minimum(punct * 10, 1.0)) + 0.25 * stop, 6)
    # raw-ratio variant, micro-floored (no intermediate rounding):
    # identical IEEE expression on both engines
    text = batch[text_col]
    n_punct_raw = pc.count_substring_regex(text, PUNCT_RE).to_numpy(zero_copy_only=False)
    n_stop_raw = pc.count_substring_regex(text, STOPWORD_RE).to_numpy(zero_copy_only=False)
    punct_raw = n_punct_raw / np.maximum(n_chars_i, 1)
    stop_raw = n_stop_raw / np.maximum(n_words_i, 1)
    raw = (
        0.5 * length_score
        + 0.25 * (1.0 - np.minimum(punct_raw * 10.0, 1.0))
        + 0.25 * stop_raw
    )
    micro = np.floor(raw * 1000000.0 + 0.5).astype(np.int64)
    return t.append_column("quality_score", pa.array(score, pa.float64())).append_column(
        "quality_micro", pa.array(micro, pa.int64())
    )


def lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic language ID: argmax of per-language stopword hits
    (ties → first profile in LANG_PROFILES order, 'und' if no hits)."""
    text = batch[text_col]
    langs = list(LANG_PROFILES)
    counts = np.stack(
        [
            pc.count_substring_regex(pc.utf8_lower(text), rx).to_numpy(zero_copy_only=False)
            for rx in LANG_PROFILES.values()
        ]
    )
    best = counts.argmax(axis=0)
    hit = counts.max(axis=0) > 0
    pred = np.where(hit, np.array(langs)[best], "und")
    return batch.append_column("pred_lang", pa.array(pred.tolist(), pa.string()))


def content_hash(batch: pa.Table, text_col: str = "text", out_col: str = "text_hash") -> pa.Table:
    """md5 hex of the text — matches DuckDB ``md5(text)`` bit-for-bit.
    hashlib releases the GIL and runs at C speed; this is the dedup key."""
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch[text_col].to_pylist()]
    return batch.append_column(out_col, pa.array(hashes, pa.string()))


def extract_json_int(
    batch: pa.Table, col: str, key: str, out_col: str | None = None
) -> pa.Table:
    """Vectorized integer-field extraction from a JSON-string column
    (the M18 request-payload parsing shape, Ray-Data-first: one RE2
    kernel over the batch, no per-row json.loads). Matches
    ``"key": <digits>`` — the canonical json.dumps int rendering that
    DuckDB's ``json_extract`` agrees with on flat objects. Missing
    key → null. A non-integer value (``"k": 1.5`` / ``1e3``) also
    yields null (a trailing capture group detects a following ``.``
    or exponent and the value is nulled, rather than silently
    extracting the integer prefix); a same-named key inside a NESTED
    object or an embedded string can still match first — the
    documented flat-object contract."""
    out_col = out_col or key
    # extract_regex is RE2 (no lookaheads): capture one optional
    # trailing float/exponent char instead — greedy \d+ means ``t`` is
    # non-empty iff the value continues as a non-integer
    pat = rf'"{re.escape(key)}"\s*:\s*(?P<v>-?\d+)(?P<t>[.eE]?)'
    ext = pc.extract_regex(batch[col], pattern=pat)
    vals = pc.cast(pc.struct_field(ext, "v"), pa.int64())
    is_int = pc.equal(pc.struct_field(ext, "t"), "")
    vals = pc.if_else(pc.fill_null(is_int, False), vals, pa.scalar(None, pa.int64()))
    return batch.append_column(out_col, vals)


_FP_MOD = np.uint64(0xFFFFFFFFFFFFFFFF)  # arithmetic mod 2^64 via uint64 wraparound
_FP_BASE = np.uint64(1000003)


def fingerprint(batch: pa.Table, text_col: str = "text", window: int = 8) -> pa.Table:
    """Winnowing-style document fingerprint: minimum rolling hash over
    char ``window``-grams (polynomial hash mod 2^64), vectorized with a
    strided window view. Deterministic across runs and processes."""
    weights = _FP_BASE ** np.arange(window, dtype=np.uint64)
    out = []
    for t in batch[text_col].to_pylist():
        codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        if len(codes) < window:
            codes = np.pad(codes, (0, window - len(codes)), constant_values=1)
        win = np.lib.stride_tricks.sliding_window_view(codes, window)
        hashes = (win * weights).sum(axis=1, dtype=np.uint64)
        out.append(int(hashes.min()))
    return batch.append_column("fingerprint", pa.array(out, pa.uint64()))


def bigram_counts(ds, text_col: str = "text", min_count: int = 1):
    """Corpus bigram (adjacent token pair) counts — the co-occurrence
    statistics layer (collocation mining, PMI, LM smoothing inputs).
    Combiner-shaped: each block collapses to its distinct-bigram
    partial counts before the shuffle; one ``grouped_agg`` merges.
    Emits ``(w1, w2, n)``; PMI and friends are arithmetic over this
    table plus the unigram counts — left to the caller because log is
    libm-dependent (the repo's no-transcendentals oracle rule)."""
    from collections import Counter

    from ocr_service_ray.ops.agg import grouped_agg

    def explode(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for t in batch[text_col].to_pylist():
            toks = t.split(" ")
            counts.update(zip(toks, toks[1:]))
        w1, w2, n = [], [], []
        for (a, b), c in counts.items():
            w1.append(a)
            w2.append(b)
            n.append(c)
        return pa.table(
            {
                "w1": pa.array(w1, pa.string()),
                "w2": pa.array(w2, pa.string()),
                "n": pa.array(n, pa.int64()),
            }
        )

    out = grouped_agg(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["w1", "w2"],
        {"n": ("n", "sum")},
    )
    if min_count > 1:
        import pyarrow.compute as pc

        out = out.map_batches(
            lambda b: b.filter(pc.greater_equal(b["n"], min_count)),
            batch_format="pyarrow",
        )
    return out


def normalize_text(
    batch: pa.Table, text_col: str = "text", out_col: str = "norm_text"
) -> pa.Table:
    """CCNet-style normalization BEFORE hashing/dedup: lowercase,
    collapse whitespace runs to one space, trim — so case and spacing
    variants of the same document hash identically. Fully vectorized
    Arrow kernels (utf8_lower + one RE2 pass), streaming map, zero
    shuffle. ASCII-stable vs SQL ``lower()``; non-ASCII case folding
    can differ between utf8proc and a SQL engine's collation — the
    synthetic corpus is ASCII, and callers with unicode text should
    pin one engine's folding as truth."""
    t = pc.utf8_lower(batch[text_col])
    t = pc.replace_substring_regex(t, r"\s+", " ")
    t = pc.utf8_trim_whitespace(t)
    return batch.append_column(out_col, t)


def hapax_by_group(ds, group_col: str = "source", text_col: str = "text",
                   scale: int = 1_000_000, ngram: int = 1):
    """Per-group hapax-legomenon rate — the share of a slice's shingle
    mass made of ``ngram``-word shingles that appear EXACTLY ONCE in
    the whole corpus (a classic vocabulary-freshness / OCR-noise
    signal: garbled text inflates hapaxes, boilerplate deflates them).
    Tokens are ``\\S+`` runs (the repo's SQL-matching whitespace
    tokenizer); shingles join ``ngram`` adjacent tokens with a single
    space (``ngram=1`` = plain words). Small fixed vocabularies have
    no word hapaxes at all — bump ``ngram`` until the shingle space is
    sparse enough to discriminate.

    Combiner-shaped end to end — a hapax set is vocabulary-sized, so
    it is never collected anywhere:
    1. each block collapses to its distinct (group, shingle) partial
       counts; one ``grouped_agg`` merges to exact (group, shingle, c);
    2. a second combiner folds per SHINGLE: tot = Σ c carries the
       shingle's group along via max() — legal because a corpus-hapax
       (tot == 1) by definition occurs in exactly one group;
    3. hapaxes (tot == 1) collapse to per-group counts; per-group
       shingle totals come from the same (group, shingle, c) table.

    Returns a driver DataFrame (group, n_tokens, n_hapax, hapax_ppm)
    — group-cardinality-bounded by contract. n_tokens counts SHINGLES
    (a doc shorter than ``ngram`` words contributes none)."""
    import re as _re

    from collections import Counter

    from ocr_service_ray.ops.agg import grouped_agg

    tok = _re.compile(r"\S+")

    def explode(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        groups = batch[group_col].to_pylist()
        for g, t in zip(groups, batch[text_col].to_pylist()):
            ws = tok.findall(t or "")
            for i in range(len(ws) - ngram + 1):
                counts[(g, " ".join(ws[i : i + ngram]))] += 1
        gs, ws, cs = [], [], []
        for (g, w), c in counts.items():
            gs.append(g)
            ws.append(w)
            cs.append(c)
        return pa.table(
            {
                group_col: pa.array(gs, batch[group_col].type),
                "word": pa.array(ws, pa.string()),
                "c": pa.array(cs, pa.int64()),
            }
        )

    pairs = grouped_agg(
        ds.select_columns([group_col, text_col]).map_batches(
            explode, batch_format="pyarrow"
        ),
        [group_col, "word"],
        {"c": ("c", "sum")},
    )
    word_tot = grouped_agg(
        pairs, ["word"], {"tot": ("c", "sum"), "grp": (group_col, "max")}
    )
    hapax = grouped_agg(
        word_tot.map_batches(
            lambda b: b.filter(pc.equal(b["tot"], 1)).select(["grp"]),
            batch_format="pyarrow",
        ),
        ["grp"],
        {"n_hapax": (None, "count")},
    ).to_pandas()
    totals = grouped_agg(pairs, [group_col], {"n_tokens": ("c", "sum")}).to_pandas()

    import pandas as pd

    if hapax.empty:
        # a corpus with NO hapax shingles yields a column-less empty
        # frame from to_pandas — rebuild the schema so the merge works
        hapax = pd.DataFrame({"grp": pd.Series([], dtype=object),
                              "n_hapax": pd.Series([], dtype="int64")})
    out = totals.merge(
        hapax.rename(columns={"grp": group_col}), on=group_col, how="left"
    )
    out["n_hapax"] = out["n_hapax"].fillna(0).astype("int64")
    out = out[out["n_tokens"] > 0].copy()
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["hapax_ppm"] = (
        (scale * out["n_hapax"].astype(object)) // out["n_tokens"].astype(object)
    ).astype("int64")
    return out.reset_index(drop=True)


def oov_rate_by_group(
    ds,
    group_col: str = "source",
    text_col: str = "text",
    vocab_k: int = 10_000,
    scale: int = 1_000_000,
):
    """Per-group out-of-vocabulary token rate against the corpus'
    top-``vocab_k`` vocabulary — the tokenizer-coverage / noise
    monitor (a slice full of OOV tokens will fragment into garbage
    subwords). The vocabulary is the top-k words by (count DESC, word
    ASC) — the deterministic tie-break makes both engines pick the
    same boundary words.

    Distribution: one combiner collapses blocks to (group, word)
    counts; the global word ranking folds from those SAME rows
    (second combiner), the top-k set broadcasts driver-side
    (vocab-bounded by construction), and the per-group OOV fold is a
    third combiner over the (group, word) counts — raw rows shuffle
    once. Returns a DataFrame (group, n_tokens, n_oov, oov_ppm)."""
    import re as _re

    from collections import Counter

    import pandas as pd

    from ocr_service_ray.ops.agg import grouped_agg

    tok = _re.compile(r"\S+")

    def explode(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for g, t in zip(
            batch[group_col].to_pylist(), batch[text_col].to_pylist()
        ):
            for w in tok.findall(t or ""):
                counts[(g, w)] += 1
        gs = [g for g, _ in counts]
        ws = [w for _, w in counts]
        cs = [counts[k] for k in counts]
        return pa.table(
            {
                group_col: pa.array(gs, batch[group_col].type),
                "word": pa.array(ws, pa.string()),
                "c": pa.array(cs, pa.int64()),
            }
        )

    pairs = grouped_agg(
        ds.select_columns([group_col, text_col]).map_batches(
            explode, batch_format="pyarrow"
        ),
        [group_col, "word"],
        {"c": ("c", "sum")},
    ).materialize()
    word_tot = (
        grouped_agg(pairs, ["word"], {"tot": ("c", "sum")})
        .to_pandas()
        .sort_values(["tot", "word"], ascending=[False, True], kind="mergesort")
    )
    vocab = set(word_tot["word"].head(vocab_k))

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        oov = (~b["word"].isin(vocab)).to_numpy()
        return pd.DataFrame(
            {
                group_col: b[group_col],
                "n": b["c"],
                "oov": b["c"].to_numpy() * oov,
            }
        )

    out = (
        grouped_agg(
            pairs.map_batches(flag, batch_format="pandas"),
            [group_col],
            {"n_tokens": ("n", "sum"), "n_oov": ("oov", "sum")},
        )
        .to_pandas()
    )
    out = out[out["n_tokens"] > 0].copy()
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["n_oov"] = out["n_oov"].astype("int64")
    out["oov_ppm"] = (
        (scale * out["n_oov"].astype(object)) // out["n_tokens"].astype(object)
    ).astype("int64")
    return out.reset_index(drop=True)


def bpe_merge_pairs(ds, text_col: str = "text", top_k: int = 20):
    """Top-``top_k`` adjacent CHARACTER pair frequencies over all word
    occurrences — the first-merge candidate table of BPE tokenizer
    training (Sennrich et al.: the initial merge is exactly the
    most frequent adjacent symbol pair). Word-internal pairs only
    (no cross-word merges), every token occurrence counts.

    One scan; each block collapses to its pair Counter (vocabulary-
    bounded: ≤ |alphabet|² rows) and one combiner merge + top-k
    closes it — the shuffle never moves text. Returns pandas
    ``(pair, n)`` by (n DESC, pair ASC)."""
    from collections import Counter

    from ocr_service_ray.ops.agg import grouped_agg

    def explode(b: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for t in b[text_col].to_pylist():
            for w in t.split(" "):
                for i in range(len(w) - 1):
                    cnt[w[i : i + 2]] += 1
        return pa.table(
            {
                "pair": pa.array(list(cnt.keys()), pa.string()),
                "c": pa.array(list(cnt.values()), pa.int64()),
            }
        )

    out = grouped_agg(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["pair"],
        {"n": ("c", "sum")},
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    return (
        out.sort_values(["n", "pair"], ascending=[False, True])
        .head(top_k)
        .reset_index(drop=True)
    )
