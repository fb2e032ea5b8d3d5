"""Wave-76: kNN label-noise audit (ops/similarity.label_noise_audit)
and near-dup cluster size histogram — planted mislabels, clean-data
silence, layout invariance."""

import numpy as np
import pyarrow as pa


def _emb_ds(mat, labels):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(mat)), pa.int64()),
                "embedding": pa.array(
                    list(mat.astype(np.float32)), pa.list_(pa.float32())
                ),
                "label": pa.array(labels, pa.int64()),
            }
        )
    )


def test_label_noise_flags_planted_mislabel_and_silent_on_clean():
    from ocr_service_ray.ops.similarity import label_noise_audit

    rng = np.random.default_rng(19)
    # two tight clusters far apart; labels follow clusters exactly
    a = rng.normal(loc=(5, 0, 0, 0), scale=0.1, size=(20, 4))
    b = rng.normal(loc=(-5, 0, 0, 0), scale=0.1, size=(20, 4))
    mat = np.vstack([a, b])
    labels = [0] * 20 + [1] * 20
    clean = label_noise_audit(_emb_ds(mat, labels))
    assert len(clean) == 0  # agreement everywhere → no rows
    # flip one label: exactly that row disagrees with its neighbors
    noisy = list(labels)
    noisy[3] = 1
    out = label_noise_audit(_emb_ds(mat, noisy))
    assert 3 in set(out["vec_id"])
    row = out[out["vec_id"] == 3].iloc[0]
    assert row["label"] == 1 and row["maj_label"] == 0


def test_label_noise_layout_invariance():
    import ray.data as rd

    from ocr_service_ray.ops.similarity import label_noise_audit

    rng = np.random.default_rng(23)
    mat = rng.normal(size=(150, 8))
    labels = rng.integers(0, 3, 150).tolist()
    d = _emb_ds(mat, labels)
    o1 = label_noise_audit(d)
    o2 = label_noise_audit(d.repartition(7))
    assert o1.equals(o2)


def test_dup_cluster_histogram_known_graph():
    import ray.data as rd

    from ocr_service_ray.ops.agg import grouped_agg
    from ocr_service_ray.ops.graph import connected_components

    # components: {1,2,3} (chain), {10,11} → sizes 3 and 2
    pairs = pa.table(
        {
            "id_a": pa.array([1, 2, 10], pa.int64()),
            "id_b": pa.array([2, 3, 11], pa.int64()),
        }
    )
    comps = connected_components(rd.from_arrow(pairs))
    sizes = grouped_agg(comps, ["cluster_id"], {"size": (None, "count")})
    hist = (
        grouped_agg(sizes, ["size"], {"n_clusters": (None, "count")})
        .to_pandas()
        .sort_values("size")
        .reset_index(drop=True)
    )
    assert list(hist["size"]) == [2, 3]
    assert list(hist["n_clusters"]) == [1, 1]
