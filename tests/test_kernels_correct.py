"""Kernel conformance: autocorrection (FIXTURES.md §6 hand-computed
cases, semantics from /root/reference/core/correctors.py:201-293)."""

from ocr_service_ray.kernels.correct import (
    CorrectionsDB,
    contextual_correct,
    correct_text,
    dictionary_correct,
    is_russian_word,
    levenshtein_distance,
)


def test_contextual_lowercase():
    text, corr = contextual_correct("пр0верка")
    assert text == "проверка"
    assert corr[0]["method"] == "contextual_russian_word"
    assert corr[0]["confidence"] == 0.95
    assert corr[0]["zero_replacements"] == 1
    assert corr[0]["case"] == "lowercase"


def test_contextual_uppercase():
    text, corr = contextual_correct("ПР0ТОК0Л")
    assert text == "ПРОТОКОЛ"
    assert corr[0]["case"] == "uppercase"
    assert corr[0]["zero_replacements"] == 2


def test_contextual_eight():
    text, _ = contextual_correct("8ерный")
    assert text == "верный"
    text, _ = contextual_correct("8ОСЕМЬ")
    assert text == "ВОСЕМЬ"


def test_contextual_guards():
    # Pure digits, digit-only leading date, Latin-only words: unchanged.
    for guard in ["2023", "808", "0", "word8", "8 марта"]:
        text, corr = contextual_correct(guard)
        assert text == guard, guard
        assert corr == []


def test_contextual_mixed_case_uses_lowercase():
    # Word with any lowercase letter → lowercase replacements.
    text, corr = contextual_correct("Пр0верка")
    assert text == "Проверка"
    assert corr[0]["case"] == "lowercase"


def test_dictionary_exact_match():
    db = CorrectionsDB([("Маркуталь", "Мариуполь")])
    text, corr = dictionary_correct("город Маркуталь большой", db)
    assert text == "город Мариуполь большой"
    assert corr == [
        {"from": "Маркуталь", "to": "Мариуполь", "confidence": 1.0, "method": "exact_match"}
    ]


def test_dictionary_fuzzy_match():
    db = CorrectionsDB([("Маркуталь", "Мариуполь")])
    # "Маркутель" vs "Маркуталь": 8/9 chars align → ratio 8/9 ≈ 0.889 ≥ 0.8
    text, corr = dictionary_correct("посёлок Маркутель", db)
    assert text == "посёлок Мариуполь"
    assert corr[0]["method"] == "similarity_match"
    assert abs(corr[0]["confidence"] - 8 / 9) < 1e-9


def test_dictionary_below_threshold():
    db = CorrectionsDB([("Маркуталь", "Мариуполь")])
    text, corr = dictionary_correct("слово Маркер", db)
    assert text == "слово Маркер"
    assert corr == []


def test_dictionary_first_occurrence_only():
    db = CorrectionsDB([("опечатка", "исправление")])
    # Token appears twice → each occurrence triggers its own suggestion
    # + replace(..., 1): both end up replaced, sequentially.
    text, corr = dictionary_correct("опечатка и опечатка", db)
    assert text == "исправление и исправление"
    assert len(corr) == 2


def test_reference_default_db_single_letters():
    # The reference default DB maps standalone letters to digits; the
    # fuzzy pass lowercases, so a lone "о" matches "О"→"0" at ratio 1.0
    # and replace() hits the first "о" in the running text.
    db = CorrectionsDB()
    text, corr = dictionary_correct("слово о деле", db)
    # first occurrence of "о" is inside "слово" → "сл0во о деле"
    assert text == "сл0во о деле"
    assert corr[0]["method"] == "similarity_match"


def test_full_pipeline_order():
    # Contextual pass runs FIRST; its output feeds the dictionary pass.
    db = CorrectionsDB([("проверка", "перепроверка")])
    text, corr = correct_text("пр0верка", db)
    assert text == "перепроверка"
    assert [c["method"] for c in corr] == ["contextual_russian_word", "exact_match"]


def test_is_russian_word():
    assert is_russian_word("слово")
    assert is_russian_word("сл0во")
    assert not is_russian_word("word")
    assert not is_russian_word("123")


def test_levenshtein_parity():
    # Defined for parity with correctors.py:92-119; unused in hot path.
    assert levenshtein_distance("кот", "кит") == 1
    assert levenshtein_distance("", "abc") == 3
    assert levenshtein_distance("abc", "abc") == 0


def test_fuzzy_prune_matches_bruteforce():
    # The quick_ratio pruning must not change results vs. a plain scan.
    from difflib import SequenceMatcher

    entries = [
        ("сертефикат", "сертификат"),
        ("арганизация", "организация"),
        ("Маркуталь", "Мариуполь"),
        ("документт", "документ"),
    ]
    db = CorrectionsDB(entries)
    tokens = ["сертификат", "сиртефекат", "органезация", "Маркутель", "документтт", "протокол"]
    for tok in tokens:
        got = db.find_similar(tok)
        best, best_sim = None, 0.0
        for o, c in entries:
            sim = SequenceMatcher(None, tok.lower(), o.lower()).ratio()
            if sim > best_sim and sim >= 0.8:
                best_sim, best = sim, (o, c, sim)
        assert got == best, tok
