from mobius_rag_tpu.ops.topk import cosine_topk, cosine_topk_pallas, cosine_topk_xla  # noqa: F401
