from mobius_rag_tpu.api.server import AppContext, build_app  # noqa: F401
