"""cafe_tpu — a TPU-native CTR training framework with CAFE embedding compression.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of HugoZHL/CAFE
(SIGMOD'24 "CAFE: Towards Compact, Adaptive and Fast Embedding" and the TOIS'25
CAFE+ follow-up): DLRM / WDL / DCN dense towers, an embedding layer supporting
full / hash / QR / mixed-dimension / AdaEmbed / offline-hot / CAFE compression,
and a device-resident HotSketch that tracks per-feature importance online and
routes hot ids to exclusive embedding rows.

Design stance (vs. the reference's single-GPU PyTorch + ctypes C++ sketch):

* Everything is functional state in one checkpointable pytree — embedding
  tables, hash tables, sketch buckets, optimizer slots.
* The sketch query -> dual lookup -> blend -> grad-norm -> sketch insert ->
  row migration path is fused into ONE jitted train step. The reference pays
  2 ctypes crossings and 4 host<->device copies per field per step
  (ArtifactEvaluation/embeddings/sk_embedding_bag.py:78-180); here the whole
  thing stays in HBM.
* Scaling is SPMD over a jax.sharding.Mesh: dense towers data-parallel,
  embedding tables + sketch shards row-sharded, lookups exchanged with
  collectives (the reference has no working distributed path at all).
"""

__version__ = "0.1.0"
