"""Pure scalar kernels — zero Ray imports.

These functions reproduce the reference's per-document transform
semantics exactly (cited per function). They are used twice: inside
``map_batches`` stages (batched over Arrow columns) and in the
pure-Python oracle (``ocr_service_ray.oracle``) the conformance tests
compare against — conformance by construction.
"""

from ocr_service_ray.kernels.correct import (  # noqa: F401
    CorrectionsDB,
    DEFAULT_CORRECTIONS,
    contextual_correct,
    correct_text,
    is_russian_char,
    is_russian_word,
    levenshtein_distance,
)
from ocr_service_ray.kernels.validate import (  # noqa: F401
    FIELD_PATTERNS,
    extract_important_data,
    find_field,
    validate_critical_fields,
    validate_field,
)
from ocr_service_ray.kernels.quality import (  # noqa: F401
    check_image_quality,
    check_quality,
    detect_handwritten,
)
from ocr_service_ray.kernels.assemble import (  # noqa: F401
    AREAS_HEADER,
    MAIN_HEADER,
    PAGE_SEP,
    assemble_document,
    word_count,
)
from ocr_service_ray.kernels.spell import simple_spell_correct  # noqa: F401
