"""Wave-139: span-structure profiling — template partition math,
reading-order preservation, char accounting."""

import pandas as pd
import pyarrow as pa


def _profile(docs_table):
    import ray.data as rd

    from ocr_service_ray.ops.agg import grouped_agg

    docs = rd.from_arrow(docs_table)

    def prof(b: pa.Table) -> pa.Table:
        structs, media, chars = [], [], []
        for spans in b["spans"].to_pylist():
            kinds = [s["kind"] for s in spans]
            structs.append("+".join(kinds))
            media.append(sum(1 for k in kinds if k != "text"))
            chars.append(
                sum(len(s["text"]) for s in spans if s["kind"] == "text")
            )
        return pa.table(
            {
                "structure": pa.array(structs),
                "m": pa.array(media, pa.int64()),
                "ch": pa.array(chars, pa.int64()),
            }
        )

    return (
        grouped_agg(
            docs.map_batches(prof, batch_format="pyarrow"),
            ["structure"],
            {
                "n_docs": (None, "count"),
                "media_spans": ("m", "sum"),
                "total_chars": ("ch", "sum"),
            },
        )
        .to_pandas()
        .sort_values("structure")
        .reset_index(drop=True)
    )


def _doc(doc_id, spans):
    return {"doc_id": doc_id, "spans": spans}


def test_span_structures_partition_and_count():
    from ocr_service_ray.pipelines.derive import derive_documents_batch

    src = pa.table(
        {
            "doc_id": list(range(1, 232)),
            "text": ["word " * 5] * 231,
        }
    )
    derived = derive_documents_batch(src)
    out = _profile(derived)
    # 231 = 3*7*11: every residue combination appears; 8 templates
    assert len(out) == 8
    assert out["n_docs"].sum() == 231
    # the all-media template appears exactly for multiples of 231
    full = out[out["structure"] == "text+pdf_page+image+area"]
    assert int(full["n_docs"].iloc[0]) == 1  # doc 231 only
    # media span accounting: sum over docs of indicator sums
    assert out["media_spans"].sum() == sum(
        (1 if n % 3 == 0 else 0)
        + (1 if n % 7 == 0 else 0)
        + (1 if n % 11 == 0 else 0)
        for n in range(1, 232)
    )


def test_span_reading_order_is_text_first():
    from ocr_service_ray.pipelines.derive import derive_documents_batch

    src = pa.table({"doc_id": [21], "text": ["hello world"]})
    spans = derive_documents_batch(src)["spans"].to_pylist()[0]
    kinds = [s["kind"] for s in spans]
    assert kinds[0] == "text"
    assert kinds == ["text", "pdf_page", "image"]  # 21 % 3 = 0, % 7 = 0
    offsets = [s["offset"] for s in spans]
    assert offsets == sorted(offsets) == [0, 1, 2]


def test_span_char_totals_exact():
    t = pa.table(
        {
            "doc_id": ["a", "b"],
            "spans": [
                [
                    {"kind": "text", "text": "abcde", "media_ref": "", "offset": 0},
                    {"kind": "image", "text": "", "media_ref": "m", "offset": 1},
                ],
                [
                    {"kind": "text", "text": "xy", "media_ref": "", "offset": 0},
                ],
            ],
        }
    )
    out = _profile(t)
    got = dict(zip(out["structure"], out["total_chars"]))
    assert got["text+image"] == 5
    assert got["text"] == 2
