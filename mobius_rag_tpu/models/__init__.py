from mobius_rag_tpu.models.encoder import EncoderConfig, encode, init_params  # noqa: F401
from mobius_rag_tpu.models.tokenizer import HashTokenizer  # noqa: F401
