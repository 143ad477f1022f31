"""Multi-chip parallelism: mesh construction + sharding rules.

The reference is single-process/single-node (SURVEY.md: no collectives
anywhere); its concurrency is request-level worker slots. Here slots become
batch lanes sharded over a ``dp`` mesh axis, and the 1B+ stretch LLM shards
weights megatron-style over ``tp`` (ICI collectives inserted by XLA from
sharding constraints — no hand-written NCCL analogs).
"""

from .mesh import make_mesh, llm_weight_shardings, llm_data_shardings

__all__ = ["make_mesh", "llm_weight_shardings", "llm_data_shardings"]
