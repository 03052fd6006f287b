"""Training-data pipeline operators: dedup, similarity search, text analysis,
multimodal column plumbing — first-class components for 100 TB-scale corpus
construction (driver mandate), built over the documents/embeddings/images
tables."""

from . import dedup, multimodal, similarity, text  # noqa: F401
