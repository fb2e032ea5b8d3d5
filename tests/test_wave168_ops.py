"""Wave-168 ops: divisor apportionment — textbook D'Hondt example,
Sainte-Lague small-party friendliness, exactness invariants."""

from ocr_service_ray.ops.apportion import apportion, apportion_report


def test_textbook_dhondt():
    # classic: votes A=100000 B=80000 C=30000 D=20000, 8 seats
    # D'Hondt: A4 B3 C1 D0
    w = {"A": 100000, "B": 80000, "C": 30000, "D": 20000}
    assert apportion(w, 8, "dhondt") == {"A": 4, "B": 3, "C": 1, "D": 0}


def test_sainte_lague_favors_small():
    # same votes under Sainte-Lague: A=4 B=3 C=1 D=0? divisors
    # 1,3,5..: A:100000,33333,20000,14286 B:80000,26667,16000
    # C:30000,10000 D:20000 -> top8: 100k,80k,33.3k,30k,26.7k,20k(A/5
    # =20000 vs D/1=20000 tie! w*d' cross: A*1 vs D*5: 100000 > 100000?
    # equal -> tie to smaller divisor: D (d=1) wins over A (d=5)
    w = {"A": 100000, "B": 80000, "C": 30000, "D": 20000}
    sl = apportion(w, 8, "sainte_lague")
    assert sum(sl.values()) == 8
    assert sl["D"] >= 1  # small party seated under SL


def test_seats_sum_and_monotone():
    w = {"x": 50, "y": 30, "z": 20}
    for seats in (1, 5, 10, 64):
        for m in ("dhondt", "sainte_lague"):
            a = apportion(w, seats, m)
            assert sum(a.values()) == seats
            # weight order respected
            assert a["x"] >= a["y"] >= a["z"]


def test_equal_weights_tie_by_party():
    a = apportion({"p": 10, "q": 10, "r": 10}, 4, "dhondt")
    # ties go to smaller party name: p gets the 4th seat
    assert a == {"p": 2, "q": 1, "r": 1}


def test_report_shape():
    out = apportion_report({"s1": 70, "s2": 30}, 10)
    assert list(out["party"]) == ["s1", "s2"]
    assert out["seats_dhondt"].sum() == 10
    assert out["seats_sainte_lague"].sum() == 10
    assert out.loc[0, "ideal_milli"] == 1000 * 10 * 70 // 100
