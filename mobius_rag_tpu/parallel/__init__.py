from mobius_rag_tpu.parallel.mesh import make_mesh  # noqa: F401
from mobius_rag_tpu.parallel.sharded import ShardedEngine  # noqa: F401
