from mobius_rag_tpu.query.lexicon import Lexicon, LexiconEntry, LexiconExpansion  # noqa: F401
from mobius_rag_tpu.query.text import hash_bucket, stem, tokenize  # noqa: F401
