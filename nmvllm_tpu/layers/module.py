"""Minimal functional module system.

Models are static Python objects built once from a config; parameters live in
a separate nested-dict pytree (params[name] mirrors the module tree). Every
module provides:
  * ``init(rng) -> params``   — random initialization (dummy-load path),
  * ``specs() -> spec tree``  — a matching pytree of ``PartitionSpec`` used
    to shard params over the device mesh (axis names from parallel/mesh.py),
  * ``__call__(params, ...)`` — the pure forward function; model step
    functions run inside ``shard_map`` so arrays seen here are local shards
    and TP collectives are explicit ``psum``s.

This replaces torch ``nn.Module`` (reference model_executor/) with a design
where weight loading, quantization repack, and sharding are all explicit
transforms on the params pytree.
"""
from typing import Any, Dict, Optional

import jax
from jax.sharding import PartitionSpec as P


class Module:
    """Base class; subclasses define _children and/or own params."""

    def init(self, rng) -> Dict[str, Any]:
        raise NotImplementedError

    def specs(self) -> Any:
        """PartitionSpec pytree matching init()'s output."""
        raise NotImplementedError


def replicated_like(params: Any) -> Any:
    """Spec tree of fully-replicated PartitionSpecs matching params."""
    return jax.tree.map(lambda _: P(), params)
