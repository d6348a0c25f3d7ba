"""Shared model-forward contracts."""
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax


@jax.tree_util.register_dataclass
@dataclass
class AttentionMetadata:
    """Per-step attention inputs (TPU analogue of the reference's
    AttentionMetadata, attention/backends/abstract.py:106).

    All arrays are padded to the step's bucket shape.
      slot_mapping: (B, T) int32 linear KV slots (block*block_size+offset);
                    -1 on padding (scatter drops them).
      block_tables: (B, max_bpp) int32 physical page ids.
      context_lens: (B,) int32 total KV length after this step's tokens.
      seq_lens:     (B,) int32 number of new tokens this step per row.
      prefix_lens:  (B,) int32 tokens already cached before this step
                    (nonzero only for chunked prefill / prefix cache hits).
      state_slots:  (B,) int32 recurrent-state slot per row (Mamba/Jamba
                    layers; INT32_MAX on padding rows so state scatters
                    drop). None for pure-attention models.
    """
    slot_mapping: jax.Array
    block_tables: jax.Array
    context_lens: jax.Array
    seq_lens: jax.Array
    prefix_lens: jax.Array
    state_slots: Optional[jax.Array] = None


# KV cache for one layer: one fused array
# (num_blocks, 2, H_kv, block_size, head_dim); index 0 = K, 1 = V.
KVCache = jax.Array
