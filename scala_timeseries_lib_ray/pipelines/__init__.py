"""End-to-end pipelines: the tier cascade and training-data-prep operators."""
