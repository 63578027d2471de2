"""mmrag_tpu — TPU-native multimodal RAG framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``Sabarna07-tech/Multimodal-RAG-for-Image-Text-Search`` (mounted read-only at
``/root/reference``): PDF/YouTube ingestion, MiniLM + CLIP dual-modality
embedding, an HBM-resident sharded vector index with a fused Pallas
matmul+top-k kernel, cross-encoder reranking, z-score fusion, grounded
generation with abstention, notes/quiz products, and an HTTP serving layer —
designed TPU-first: static shapes, bucketed batching, bf16 MXU matmuls,
``shard_map`` corpus sharding over a device mesh.

Package layout:
  config / settings   — frozen defaults + typed env loader (reference-compatible)
  models/             — MiniLM (BERT-6L), CLIP ViT-B/32 dual tower, cross-encoder (pure JAX)
  ops/                — Pallas + XLA kernels: fused top-k, image preprocess, phash, fusion
  index/              — device-resident sharded vector store + version counters
  parallel/           — mesh construction, sharded multi-chip retrieval
  rag/                — embedding / index-build / retrieve / generate pipelines
  ingest/             — PDF, text chunking, video frames, YouTube ladder
  storage/            — SQLite catalogs (documents/chunks, notes)
  cache/              — TTL caches keyed by per-user index version
  serving/            — HTTP API (stdlib-native, FastAPI-compatible contract) + job queue
  utils/              — notes builder, profiling, misc
"""

__version__ = "0.1.0"
