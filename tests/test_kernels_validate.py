"""Kernel conformance: field extraction/validation
(/root/reference/core/validators.py)."""

from ocr_service_ray.kernels.validate import (
    extract_important_data,
    find_field,
    validate_critical_fields,
    validate_field,
)


def test_inn_found_valid():
    res = find_field("inn", "ИНН 7707083893 указан")
    assert ("7707083893", 0.9) in res


def test_inn_11_digits_low_confidence():
    # 11 digits matches \d{10,12} but fails the 10/12-length validator
    # → confidence 0.5 (validators.py:113).
    res = find_field("inn", "номер 12345678901 тут")
    assert ("12345678901", 0.5) in res


def test_snils_formats():
    assert ("123-456-789 01", 0.9) in find_field("snils", "СНИЛС 123-456-789 01")
    assert ("12345678901", 0.9) in find_field("snils", "снилс 12345678901")


def test_ogrn_boundary():
    # 13 digits: valid OGRN; 14 digits: pattern matches, validator fails.
    assert ("1234567890123", 0.9) in find_field("ogrn", "ОГРН 1234567890123")
    assert ("12345678901234", 0.5) in find_field("ogrn", "х 12345678901234 х")


def test_date_variants():
    for d in ["01.02.2023", "1/2/23", "15-12-1999"]:
        assert (d, 0.9) in find_field("date", f"дата {d} конец"), d


def test_email_phone():
    assert ("user@example.ru", 0.9) in find_field("email", "почта user@example.ru")
    found = find_field("phone", "тел +7 (495) 123-45-67")
    assert any(conf == 0.9 for _, conf in found)


def test_number_field():
    found = find_field("number", "Документ № 123/45 выдан")
    assert found and found[0][1] == 0.9


def test_validate_field_unknown():
    r = validate_field("nosuch", "x")
    assert not r.valid and r.confidence == 0.0


def test_validate_field_suggestion():
    # Invalid value + context containing a valid one → suggestion.
    r = validate_field("inn", "123", "правильный ИНН 7707083893")
    assert not r.valid
    assert r.suggested_correction == "7707083893"


def test_validate_critical_fields_missing():
    results = validate_critical_fields("пустой текст", ["inn", "snils"])
    assert set(results) == {"inn", "snils"}
    assert not results["inn"].valid
    assert results["inn"].confidence == 0.0
    assert "не найдено" in results["inn"].message


def test_validate_critical_fields_confidence_override():
    # The found confidence (0.9/0.5) overrides validate_field's value
    # (validators.py:190).
    results = validate_critical_fields("номер 12345678901", ["inn"])
    assert results["inn"].confidence == 0.5


def test_validate_critical_fields_all_by_default():
    results = validate_critical_fields("текст")
    assert len(results) == 10


def test_important_data():
    text = "Директор Иванов И.И. ИНН 7707083893 СНИЛС 123-456-789 01 № 42/1"
    data = extract_important_data(text)
    assert "7707083893" in data["inn"]
    assert "123-456-789 01" in data["snils"]
    assert data["numbers"]
    assert "Иванов" in data["surnames"]


def test_important_data_stopwords_and_sort():
    text = "Россия Р.Ф. Петров П.П. Иванов И.И."
    data = extract_important_data(text)
    assert "Россия" not in data["surnames"]
    assert data["surnames"] == sorted(data["surnames"])  # determinism fix


def test_surname_cap_10():
    names = [f"Фамили{chr(1072 + i)}" for i in range(12)]
    text = " ".join(f"{n} И.И." for n in names)
    data = extract_important_data(text)
    assert len(data["surnames"]) <= 10
