"""Wave-145 ops: Viterbi decoding — brute-force enumeration parity
over all 2^n paths, closed forms, switch accounting."""

import itertools

import numpy as np
import pyarrow as pa

from ocr_service_ray.ops.viterbi import EMIT, START, TRANS, viterbi_decode


def _brute(obs):
    """Enumerate every path; max score, ties broken the way the DP
    does: smallest final state, then smallest predecessor working
    backwards — i.e. REVERSED-lexicographic minimum among optimal
    paths."""
    n = len(obs)
    best, best_path, best_rev = None, None, None
    for bits in itertools.product((0, 1), repeat=n):
        s = START[bits[0]] + EMIT[bits[0]][obs[0]]
        for t in range(1, n):
            s += TRANS[bits[t - 1]][bits[t]] + EMIT[bits[t]][obs[t]]
        rev = tuple(reversed(bits))
        if best is None or s > best or (s == best and rev < best_rev):
            best = s
            best_path = "".join(map(str, bits))
            best_rev = rev
    return best, best_path


def test_all_short_tokens_stay_state0():
    n, score, path, sw = viterbi_decode("a bb cc dd")
    assert path == "0000" and sw == 0
    assert score == 0 + 2 + 4 * 3 - 3  # start0 + emit + 3*(stay+emit)


def test_all_long_tokens_state1():
    n, score, path, sw = viterbi_decode("aaaaa bbbbbb ccccc")
    assert path == "111" and sw == 0


def test_single_long_token_absorbed():
    # one long token inside shorts: switching costs 2*(-3)-... the DP
    # decides; brute force is the referee
    toks = "aa bb cccccc dd ee"
    obs = [0 if len(t) <= 4 else 1 for t in toks.split(" ")]
    n, score, path, sw = viterbi_decode(toks)
    bscore, bpath = _brute(obs)
    assert score == bscore and path == bpath


def test_random_vs_brute():
    rng = np.random.RandomState(145)
    for _ in range(60):
        n = int(rng.randint(1, 11))
        toks = " ".join(
            ("x" * int(rng.choice([2, 6]))) for _ in range(n)
        )
        obs = [0 if len(t) <= 4 else 1 for t in toks.split(" ")]
        score, bpath = _brute(obs)
        n_, s_, p_, sw_ = viterbi_decode(toks)
        assert s_ == score
        assert p_ == bpath
        assert sw_ == sum(1 for a, b in zip(p_, p_[1:]) if a != b)


def test_dataset_pass(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.viterbi import viterbi_docs

    out = (
        viterbi_docs(
            rd.from_arrow(
                pa.table(
                    {
                        "doc_id": [1, 2, 3],
                        "text": ["a b c", "looong looong", ""],
                    }
                )
            ),
            "doc_id",
            "text",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["n_obs"]) == [3, 2, 1]  # ''.split(' ') == ['']
    assert out.loc[0, "path"] == "000"
    assert out.loc[1, "path"] == "11"
    assert out.loc[2, "path"] == "0"
