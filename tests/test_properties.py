"""Property-based kernel tests (hypothesis) — invariants that must
hold for ANY input, complementing the fixture-based conformance tests
(SURVEY.md §5.2)."""

from hypothesis import given, settings, strategies as st

# Mixed Cyrillic/Latin/digit/punctuation corpus-like text
_CHARS = "абвгдеожзиклмнопрстуфхцчшщыьэюяАБВГДЕОЖЗИКЛМНОП abcdefgXYZ01234567890.,-–№@ \n\t"
texts = st.text(alphabet=_CHARS, max_size=400)
words = st.text(alphabet="абвгдеожзиклмнопрстуфхц08", min_size=1, max_size=20)

SETTINGS = settings(max_examples=60, deadline=None)


@SETTINGS
@given(texts)
def test_contextual_correct_invariants(text):
    from ocr_service_ray.kernels.correct import contextual_correct, is_russian_word

    out, corrections = contextual_correct(text)
    # text without 0/8 is untouched
    if "0" not in text and "8" not in text:
        assert out == text and corrections == []
    for c in corrections:
        assert c["from"] != c["to"]
        assert c["from"] in text
        assert is_russian_word(c["from"])
        assert c["confidence"] == 0.95
        # replacement only rewrites 0→о/О and 8→в/В
        restored = (
            c["to"].replace("о", "0").replace("О", "0").replace("в", "8").replace("В", "8")
        )
        maybe = c["from"].replace("о", "0").replace("О", "0").replace("в", "8").replace("В", "8")
        assert restored == maybe


@SETTINGS
@given(texts)
def test_correct_text_deterministic(text):
    from ocr_service_ray.kernels.correct import CorrectionsDB, correct_text

    db = CorrectionsDB()
    a = correct_text(text, db)
    b = correct_text(text, CorrectionsDB())
    assert a == b  # pure function of (text, db entries)


@SETTINGS
@given(texts)
def test_find_field_normalized(text):
    from ocr_service_ray.kernels.validate import FIELD_PATTERNS, find_field

    for field in FIELD_PATTERNS:
        for value, conf in find_field(field, text):
            assert conf in (0.9, 0.5)
            assert "  " not in value and value == value.strip()


@SETTINGS
@given(texts, texts)
def test_ngram_jaccard_metric(a, b):
    from ocr_service_ray.ops.dedup import ngram_jaccard

    j = ngram_jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert ngram_jaccard(b, a) == j  # symmetric
    assert ngram_jaccard(a, a) == 1.0  # identity


@SETTINGS
@given(texts)
def test_simhash_stable(text):
    from ocr_service_ray.ops.dedup import simhash64

    h = simhash64(text)
    assert 0 <= h < 2**64
    assert simhash64(text) == h


@SETTINGS
@given(texts)
def test_minhash_signature_shape(text):
    import numpy as np

    from ocr_service_ray.ops.dedup import _perm_params, minhash_signature

    a, b = _perm_params(16)
    sig = minhash_signature(text, a, b)
    assert sig.shape == (16,)
    assert (minhash_signature(text, a, b) == sig).all()


@SETTINGS
@given(st.text(max_size=12), st.text(max_size=12), st.text(max_size=12))
def test_levenshtein_metric(a, b, c):
    from ocr_service_ray.kernels.correct import levenshtein_distance as lev

    assert lev(a, b) == lev(b, a)
    assert lev(a, a) == 0
    assert lev(a, b) <= lev(a, c) + lev(c, b)  # triangle inequality


@SETTINGS
@given(words)
def test_suggest_threshold(word):
    from ocr_service_ray.kernels.correct import CorrectionsDB

    db = CorrectionsDB()
    s = db.suggest(word)
    if s is not None:
        if s["method"] == "exact_match":
            assert s["confidence"] == 1.0
        else:
            assert s["confidence"] >= db.threshold


@SETTINGS
@given(st.lists(st.tuples(st.sampled_from(["text", "image", "pdf_page", "area"]),
                          st.text(alphabet=_CHARS, max_size=40)), max_size=8))
def test_assemble_preserves_span_order(kinds_texts):
    from ocr_service_ray.kernels.assemble import assemble_document

    spans = [
        {
            "kind": k,
            "text": t,
            "media_ref": "",
            "offset": i,
            "confidence": 0.9,
        }
        for i, (k, t) in enumerate(kinds_texts)
    ]
    out = assemble_document(spans)
    # output = non-empty areas (offset order) then non-area spans
    # (offset order), re-indexed 0..n-1 — empty areas dropped
    # (reference semantics, processor.py:170-187)
    want = [
        (s["kind"], s["text"])
        for s in spans
        if s["kind"] == "area" and s["text"]
    ] + [(s["kind"], s["text"]) for s in spans if s["kind"] != "area"]
    assert [(s["kind"], s["text"]) for s in out["spans"]] == want
    assert [s["offset"] for s in out["spans"]] == list(range(len(want)))


@SETTINGS
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=50))
def test_hash_column_purity_random_ints(vals):
    import pyarrow as pa

    from ocr_service_ray.ops.hashing import hash_column

    h1 = hash_column(pa.array(vals, pa.int64()))
    h2 = hash_column(pa.array(list(reversed(vals)), pa.int64()))
    assert (h1 == h2[::-1]).all()


@SETTINGS
@given(
    st.dictionaries(
        st.text(alphabet="abcdefgk_", min_size=1, max_size=6),
        st.integers(min_value=-10**12, max_value=10**12),
        max_size=5,
    )
)
def test_extract_json_int_matches_json_loads(d):
    import json

    import pyarrow as pa

    from ocr_service_ray.ops.text import extract_json_int

    s = json.dumps(d)
    out = extract_json_int(pa.table({"props": [s]}), "props", "k")
    want = d.get("k")
    assert out["k"].to_pylist() == [want]


@SETTINGS
@given(st.integers(min_value=0, max_value=2**64 - 1), st.data())
def test_simhash_banding_pigeonhole(fp, data):
    """Any fingerprint within Hamming distance ≤ 3 of fp shares at
    least one exact 16-bit band with it (the recall guarantee the
    simhash candidate generator rests on)."""
    flips = data.draw(st.lists(st.integers(min_value=0, max_value=63), max_size=3))
    other = fp
    for b in set(flips):
        other ^= 1 << b
    bands_a = [(fp >> (16 * b)) & 0xFFFF for b in range(4)]
    bands_b = [(other >> (16 * b)) & 0xFFFF for b in range(4)]
    assert any(a == c for a, c in zip(bands_a, bands_b))


@SETTINGS
@given(
    st.integers(min_value=0, max_value=4000),
    st.integers(min_value=0, max_value=4000),
    st.integers(min_value=0, max_value=4000),
    st.integers(min_value=0, max_value=4000),
)
def test_area_scale_reference_arithmetic(nw, nh, hw, hh):
    """M17 property: ratio matches the reference expression including
    the 3.0 zero-dim fallback; scaled coords always int-truncate."""
    from ocr_service_ray.kernels.geometry import area_scale_ratios, scale_area

    sx, sy = area_scale_ratios(nw, nh, hw, hh)
    assert sx == (hw / nw if nw > 0 else 3.0)
    assert sy == (hh / nh if nh > 0 else 3.0)
    area = {"x1": 3, "y1": 5, "x2": 7, "y2": 11}
    scaled = scale_area(area, sx, sy)
    assert scaled["x1"] == int(3 * sx) and scaled["y2"] == int(11 * sy)


@SETTINGS
@given(st.text(alphabet="abcdef <>/=\"'&;ghij\n", max_size=300))
def test_html_extractor_never_crashes_and_is_text_only(s):
    """Robustness: arbitrary tag soup must never raise, and no TAG
    survives in the output. A bare '<' not opening a tag is character
    data in HTML (browsers render '<3' as text; html.parser agrees) —
    hypothesis found that case, so the property asserts tag-freedom,
    not bracket-freedom."""
    import re

    from ocr_service_ray.ops.html import extract_main_content

    out = extract_main_content("<div>" + s + "</div>")
    assert re.search(r"</?[a-zA-Z]", out) is None
