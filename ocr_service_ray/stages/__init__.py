"""Ray Data stages: media resolution + OCR actor pool, kernel stage,
checkpointed partitioned output."""
