"""Scalar/vector function surface: text analytics, dedup kernels,
similarity search, multimodal plumbing — the training-data-pipeline
extensions (first-class alongside the validation kernels)."""
