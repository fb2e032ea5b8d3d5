"""Multi-format golden-reference readers (S5).

Reproduces ``/root/reference/utils/dataset_loader.py:95-152``: golden
texts live beside the documents as .txt/.docx/.doc/.xlsx files; the
loader normalizes the base name (leading index number stripped) and
extracts plain text per format. python-docx / openpyxl are not in this
sandbox, so those formats go through an import-try that keeps the
reference's own failure semantics (unreadable → "" with a warning) —
the .txt path, the name pairing and the Dataset assembly are real.
"""

from __future__ import annotations

import os
import warnings

import pyarrow as pa

TEXT_EXTS = (".txt", ".docx", ".doc", ".xlsx")


def normalize_golden_name(filename: str) -> str:
    """``dataset_loader.py:95-102`` — drop a leading index number
    ("1 АОСР" → "АОСР")."""
    parts = filename.split()
    if parts and parts[0].isdigit():
        return " ".join(parts[1:])
    return filename


def load_reference_text(reference_path: str) -> str:
    """``dataset_loader.py:104-152`` — per-format text extraction;
    every failure path returns "" exactly like the reference."""
    ext = os.path.splitext(reference_path)[1].lower()
    try:
        if ext == ".txt":
            with open(reference_path, "r", encoding="utf-8") as f:
                return f.read()
        if ext in (".docx", ".doc"):
            try:
                import docx
            except ImportError:
                warnings.warn(f"python-docx not installed; cannot read {reference_path}")
                return ""
            try:
                doc = docx.Document(reference_path)
                return "\n".join(p.text for p in doc.paragraphs)
            except Exception:
                # reference's .doc fallback: warn + skip (:129-134)
                warnings.warn(f"failed to read {reference_path}")
                return ""
        if ext == ".xlsx":
            try:
                import pandas as pd

                sheets = pd.read_excel(reference_path, sheet_name=None)
            except ImportError:
                warnings.warn(f"openpyxl not installed; cannot read {reference_path}")
                return ""
            texts = []
            for sheet_name, sheet_df in sheets.items():
                texts.append(f"Лист: {sheet_name}")
                texts.append(sheet_df.to_string())
            return "\n\n".join(texts)
        warnings.warn(f"unsupported golden format: {ext}")
        return ""
    except Exception as e:  # dataset_loader.py:149-151
        warnings.warn(f"error loading golden {reference_path}: {e}")
        return ""


def load_golden_table(golden_dir: str) -> pa.Table:
    """Scan a golden directory into a {name, golden_text} Arrow table
    (sorted by name — O1 deterministic order), ready for the J1 golden
    join against extraction output. Files the reference cannot read
    contribute "" rows, exactly like its per-file error handling."""
    rows = []
    for fname in sorted(os.listdir(golden_dir)):
        base, ext = os.path.splitext(fname)
        if ext.lower() not in TEXT_EXTS:
            continue
        rows.append(
            {
                "name": normalize_golden_name(base),
                "golden_text": load_reference_text(os.path.join(golden_dir, fname)),
            }
        )
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("name", pa.string()), ("golden_text", pa.string())])
    )
