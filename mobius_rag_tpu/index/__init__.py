from mobius_rag_tpu.index.store import ChunkRecord, ChunkStore, DeviceIndex, pack_bits  # noqa: F401
