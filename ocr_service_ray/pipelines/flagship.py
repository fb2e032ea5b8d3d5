"""Flagship extraction pipeline — the rebuild of the reference's
``POST /api/v1/process`` + ``batch_process`` flow
(``/root/reference/core/processor.py:97-468``) as one streaming Ray
Data plan (SURVEY.md §3.1):

    read(docs)                                 # spans stay list-typed per row
      → map_batches(OcrStage, concurrency=…)   # actor pool: resolve media + OCR
      → map_batches(KernelStage, concurrency=…)# assemble/correct/validate/quality
      → write / aggregate                      # caller-chosen sink

Design points for 100 TB scale:
- spans stay list-typed inside the row, so the per-document page merge
  (aggregation A1) is an in-kernel fold — NO shuffle anywhere on the
  per-document path;
- the OCR stage uses a SMALL batch size (media-heavy rows) while the
  kernel stage uses a larger one (text-only rows): skew from
  media-heavy documents is absorbed by fine task granularity instead
  of a pre-shuffle (the streaming executor load-balances batches
  across the pool);
- the corrections DB and (at test scale) the media registry are
  broadcast once via ``ray.put`` / constructor kwargs, never per
  batch; at scale the media side switches to the pushed-down ``scan``
  resolver (``stages/ocr.py``);
- no ``materialize()``/``take_all()`` on the main path — the plan is
  lazy end to end and the caller consumes it streaming.
"""

from __future__ import annotations

import pyarrow as pa

from ocr_service_ray import schema
from ocr_service_ray.sources.synth import corrections_entries
from ocr_service_ray.stages.extract import KernelStage
from ocr_service_ray.stages.ocr import OcrStage, media_table_to_registry


def read_documents(path: str, columns: list[str] | None = None):
    """Read the document table. Lance when the package is present
    (``ray.data.read_lance``); parquet is the sandbox fallback —
    identical Arrow schema either way. Columns are pruned at the read."""
    cols = columns or ["doc_id", "spans"]
    try:
        import lance  # noqa: F401
        import ray.data as rd

        return rd.read_lance(path, columns=cols)
    except ImportError:
        from ocr_service_ray.sources.readers import read_parquet_clean

        return read_parquet_clean(path, columns=cols)


def write_documents(ds, path: str, **kwargs):
    """Write an output table — the sink mirror of :func:`read_documents`
    (BASELINE.json's ``input_hint`` is a Lance table, so the flagship
    sink is Lance-symmetric): ``ds.write_lance`` when the package is
    present, partitioned parquet as the sandbox fallback — identical
    Arrow schema either way. For resumable sharded output wrap the
    pipeline in ``stages/checkpoint.run_checkpointed`` instead (its
    manifest row/byte accounting reads parquet footers)."""
    try:
        import lance  # noqa: F401

        return ds.write_lance(path, **kwargs)
    except ImportError:
        from ocr_service_ray.sources.sinks import write_parquet_sized

        return write_parquet_sized(ds, path, **kwargs)


def run_extraction(
    docs,
    media,
    corrections: list[tuple[str, str]] | None = None,
    *,
    engine: str = "synthetic",
    required_fields: list[str] | None = None,
    ocr_batch_size: int = 32,
    kernel_batch_size: int = 128,
    ocr_concurrency=(1, 8),
    kernel_concurrency=(1, 8),
    fused: bool = False,
    metrics_name: str | None = None,
):
    """Build the lazy extraction plan.

    Pool minimums are 1 (not 2): each pool's minimum actors are
    reserved UP FRONT by the streaming executor, so with two chained
    pools the combined minimum must stay below the smallest session's
    CPU count or upstream task operators (read_parquet, derive) are
    starved of CPUs and the plan stalls — observed as a deadlock at
    ``num_cpus=4`` with (2,8)+(2,8). The autoscaler still grows each
    pool to 8 when CPUs are free.

    ``docs``: a Dataset, a path, or an Arrow table.
    ``media``: an Arrow media table / registry dict (→ broadcast) or a
    path to the media dataset (→ per-batch pushed-down scan).
    Returns a Dataset with ``schema.OUT_SCHEMA`` — not yet executed.
    """
    import ray
    import ray.data as rd

    if isinstance(docs, str):
        ds = read_documents(docs)
    elif isinstance(docs, pa.Table):
        # Split an in-memory table into multiple blocks up front so the
        # actor pools actually fan out (one pa.Table → one block → one
        # task otherwise).
        n_chunks = max(1, min(32, docs.num_rows // max(1, ocr_batch_size)))
        step = -(-docs.num_rows // n_chunks)
        ds = rd.from_arrow(
            [docs.slice(i * step, step) for i in range(n_chunks)]
        )
    else:
        ds = docs

    if isinstance(media, pa.Table):
        media_source = ray.put(media_table_to_registry(media))
    elif isinstance(media, dict):
        media_source = ray.put(media)
    else:
        media_source = media  # path → ScanMediaResolver inside the actor

    corrections = corrections if corrections is not None else corrections_entries()

    if fused:
        from ocr_service_ray.stages.extract import FusedExtractStage

        return ds.map_batches(
            FusedExtractStage,
            batch_format="pyarrow",
            batch_size=kernel_batch_size,
            concurrency=kernel_concurrency,
            num_cpus=1,
            fn_constructor_kwargs={
                "media_source": media_source,
                "corrections": corrections,
                "engine": engine,
                "required_fields": required_fields,
                "metrics_name": metrics_name,
            },
        )

    ds = ds.map_batches(
        OcrStage,
        batch_format="pyarrow",
        batch_size=ocr_batch_size,
        concurrency=ocr_concurrency,
        num_cpus=1,
        fn_constructor_kwargs={
            "media_source": media_source,
            "engine": engine,
            "metrics_name": metrics_name,
        },
    )
    ds = ds.map_batches(
        KernelStage,
        batch_format="pyarrow",
        batch_size=kernel_batch_size,
        concurrency=kernel_concurrency,
        num_cpus=1,
        fn_constructor_kwargs={
            "corrections": corrections,
            "required_fields": required_fields,
            "metrics_name": metrics_name,
        },
    )
    return ds


def corpus_summary(out_ds) -> dict:
    """Corpus statistics (aggregation A7 — the reference's
    ``summary.json``, ``scripts/process_dataset_phase1.py:238-269``):
    vectorized map-side partials + driver merge of |blocks| rows
    (ops/agg.global_agg — the native global aggregate pays a per-row
    Python loop)."""
    from ocr_service_ray.ops.agg import global_agg

    return global_agg(
        out_ds,
        {
            "documents": (None, "count"),
            "mean_quality": ("overall_quality", "mean"),
            "mean_ocr_confidence": ("ocr_confidence", "mean"),
            "total_corrections": ("n_corrections", "sum"),
            "total_pages": ("total_pages", "sum"),
        },
    )
