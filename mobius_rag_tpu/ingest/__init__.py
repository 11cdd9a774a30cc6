from mobius_rag_tpu.ingest.featurize import build_lexical_weights, featurize_chunk  # noqa: F401
