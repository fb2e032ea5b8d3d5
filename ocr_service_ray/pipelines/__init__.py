"""End-to-end Dataset plans."""
