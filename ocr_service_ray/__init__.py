"""ocr_service_ray — a Ray-Data-native document extraction engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of the reference `adel-safin/ocr-service`: per-document
OCR-style extraction over tables of interleaved text+media documents,
contextual autocorrection, field validation, quality scoring, feedback
aggregation — expressed as streaming ``ray.data.Dataset`` pipelines —
plus the training-data-scale operators (dedup, similarity search,
text analysis, multimodal plumbing) a 100 TB corpus pipeline needs.

Layout:
  kernels/    pure-Python/numpy scalar kernels (zero Ray) — also the oracle
  sources/    table readers/writers + deterministic synthetic corpus
  stages/     Ray Data stages (OCR actor pool, kernel stage, checkpointing)
  pipelines/  end-to-end Dataset plans (flagship extraction, feedback jobs)
  ops/        scale operators over generic tables (dedup, ANN, text, joins)
"""

__version__ = "0.1.0"
