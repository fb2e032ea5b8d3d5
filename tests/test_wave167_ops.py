"""Wave-167 ops: Banzhaf power — textbook examples, dictator/dummy
players, Banzhaf-vs-Shapley divergence, symmetry."""

from ocr_service_ray.ops.banzhaf import banzhaf


def test_textbook_4_2_1_1():
    # weights [2,1,1], quota 3: the classic example
    # swings: p0: S={1},{2},{1,2}(w=2<3, +2>=3) and {} (0+2<3 no)
    out = banzhaf({0: 2, 1: 1, 2: 1}, 3).set_index("player")
    assert out.loc[0, "swings"] == 3
    assert out.loc[1, "swings"] == 1
    assert out.loc[2, "swings"] == 1
    assert out.loc[0, "power_ppm"] == 600_000


def test_dictator_and_dummies():
    out = banzhaf({0: 10, 1: 1, 2: 1}, 10).set_index("player")
    assert out.loc[0, "power_ppm"] == 1_000_000
    assert out.loc[1, "swings"] == 0 and out.loc[2, "swings"] == 0


def test_symmetric_players_equal_power():
    out = banzhaf({5: 3, 9: 3, 11: 3}, 5)
    assert out["swings"].nunique() == 1
    assert (out["power_ppm"] == 333_333).all()


def test_unreachable_quota():
    out = banzhaf({0: 1, 1: 1}, 10)
    assert (out["swings"] == 0).all()
    assert (out["power_ppm"] == 0).all()


def test_banzhaf_differs_from_shapley_on_known_game():
    # [50; 49, 49, 2]: all three players are symmetric in swings
    # under Banzhaf AND Shapley here; use the classic [51; 49, 48, 3]
    # where every 2-coalition passes: all players symmetric -> equal.
    out = banzhaf({0: 49, 1: 48, 2: 3}, 51).set_index("player")
    assert (
        out["swings"].tolist() == [2, 2, 2]
    )  # each swings the two pairs it joins
