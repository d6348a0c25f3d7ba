"""KV cache engine: allocation, sizing, swap, copy.

Reference: vllm/worker/cache_engine.py:15 (_allocate_kv_cache:70, swap:91,
copy:101, get_cache_block_size:105). TPU-native: one fused per-layer array
of shape (num_blocks, 2, num_kv_heads, block_size, head_dim) sharded over
the tp mesh axis on kv heads — K and V of a page are contiguous so the
decode kernel fetches a page in a single DMA. The host swap pool is pinned
numpy; swap moves whole pages with jax.device_put / device_get.
"""
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.config import CacheConfig, ModelConfig, ParallelConfig
from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.ops.cache_ops import copy_blocks as _copy_blocks_op
from nmvllm_tpu.parallel.mesh import TP_AXIS
from nmvllm_tpu.utils import STR_DTYPE_TO_JNP, get_dtype_bytes

logger = init_logger(__name__)

KVCaches = List[jax.Array]


@functools.partial(jax.jit, donate_argnums=(0,))
def _copy_blocks_stacked(kv, src, dst):
    """CoW page copies on the stacked (L, blocks, ...) PP cache."""
    return kv.at[:, dst].set(kv[:, src])


@functools.partial(jax.jit, donate_argnums=(0,))
def _swap_in_stacked(kv, dev_ids, pages):
    return kv.at[:, dev_ids].set(pages)


class CacheEngine:

    def __init__(self, cache_config: CacheConfig, model_config: ModelConfig,
                 parallel_config: ParallelConfig, mesh,
                 model=None, num_state_slots: int = 0) -> None:
        self.cache_config = cache_config
        self.model_config = model_config
        self.mesh = mesh
        # Pipeline parallelism stacks all layers into ONE array with the
        # layer axis sharded over the pp mesh axis (worker/pp_runner.py);
        # each stage then holds only its own layers' pages.
        self.pp = parallel_config.pipeline_parallel_size
        # Data-parallel decode: the block pool is sharded over the data
        # mesh axis — replica r holds pages [r*bpr, (r+1)*bpr); batch rows
        # ride their owning replica (core/block_manager.py seq_replica).
        self.dp = parallel_config.data_parallel_size
        # Stateful (Mamba/Jamba) models describe a heterogeneous per-layer
        # cache layout; plain models get uniform paged KV arrays.
        self.state_layout = None
        if model is not None and hasattr(model, "state_cache_layout"):
            self.state_layout = model.state_cache_layout(num_state_slots)
        # The cache holds ALL layers globally: the stacked PP layout
        # shards the layer axis over the pp mesh axis (get_num_layers is
        # the reference's per-stage count — multiply pp back out).
        self.num_layers = (model_config.get_num_layers(parallel_config) *
                           parallel_config.pipeline_parallel_size)
        self.total_kv_heads = model_config.get_total_num_kv_heads()
        self.head_dim = model_config.get_head_size()
        self.block_size = cache_config.block_size
        self.num_gpu_blocks = cache_config.num_gpu_blocks or 0
        self.num_cpu_blocks = cache_config.num_cpu_blocks or 0
        self.dtype_name = cache_config.kv_dtype_name(model_config.dtype)
        self.dtype = jnp.dtype(STR_DTYPE_TO_JNP.get(self.dtype_name,
                                                    self.dtype_name))
        self.kv_caches: KVCaches = []
        self.cpu_pool: Optional[np.ndarray] = None

    @staticmethod
    def get_cache_block_size(cache_config: CacheConfig,
                             model_config: ModelConfig,
                             parallel_config: ParallelConfig) -> int:
        """Bytes of one KV page across all layers (both K and V)."""
        head_dim = model_config.get_head_size()
        num_kv = model_config.get_total_num_kv_heads()
        num_layers = model_config.get_num_layers(parallel_config)
        dtype_name = cache_config.kv_dtype_name(model_config.dtype)
        itemsize = get_dtype_bytes(dtype_name)
        return (2 * num_kv * cache_config.block_size * head_dim * itemsize *
                num_layers)

    def allocate(self) -> KVCaches:
        from nmvllm_tpu.parallel.mesh import DATA_AXIS
        shape = (self.num_gpu_blocks, 2, self.total_kv_heads,
                 self.block_size, self.head_dim)
        block_axis = DATA_AXIS if self.dp > 1 else None

        def _alloc(shp, shard, dtype):
            return jax.jit(lambda: jnp.zeros(shp, dtype),
                           out_shardings=NamedSharding(self.mesh, shard))()

        if self.pp > 1:
            if self.state_layout is not None:
                raise ValueError("Stateful models are not supported with "
                                 "pipeline_parallel_size > 1.")
            from nmvllm_tpu.parallel.mesh import PP_AXIS
            with self.mesh:
                self.kv_caches = _alloc(
                    (self.num_layers,) + shape,
                    P(PP_AXIS, block_axis, None, TP_AXIS, None, None),
                    self.dtype)
            self._alloc_host_pool()
            return self.kv_caches

        self.kv_caches = []
        with self.mesh:
            for li in range(self.num_layers):
                desc = (self.state_layout[li]
                        if self.state_layout is not None else "kv")
                if desc == "kv":
                    self.kv_caches.append(
                        _alloc(shape,
                               P(block_axis, None, TP_AXIS, None, None),
                               self.dtype))
                else:
                    # ((conv_shape, conv_pspec), (ssm_shape, ssm_pspec))
                    # recurrent state pools; f32 for scan stability.
                    entries = tuple(_alloc(shp, spec, jnp.float32)
                                    for shp, spec in desc)
                    self.kv_caches.append(entries)
        self._alloc_host_pool()
        return self.kv_caches

    def _alloc_host_pool(self) -> None:
        if self.num_cpu_blocks > 0:
            # Host swap pool: (layers, cpu_blocks, 2, H, bs, d) in numpy.
            self.cpu_pool = np.zeros(
                (self.num_layers, self.num_cpu_blocks, 2,
                 self.total_kv_heads, self.block_size, self.head_dim),
                dtype=np.float32 if self.dtype_name == "float32"
                else np.float16 if "float8" not in self.dtype_name
                else np.uint8)

    # ---- page maintenance -------------------------------------------------
    def copy(self, src_to_dst: List[Tuple[int, int]]) -> None:
        if not src_to_dst:
            return
        src = jnp.asarray([s for s, _ in src_to_dst], jnp.int32)
        dst = jnp.asarray([d for _, d in src_to_dst], jnp.int32)
        if self.pp > 1:
            self.kv_caches = _copy_blocks_stacked(self.kv_caches, src, dst)
            return
        paged = [c for c in self.kv_caches if not isinstance(c, tuple)]
        copied = iter(_copy_blocks_op(paged, src, dst))
        self.kv_caches = [c if isinstance(c, tuple) else next(copied)
                          for c in self.kv_caches]

    def swap_out(self, src_to_dst: List[Tuple[int, int]]) -> None:
        if not src_to_dst:
            return
        dev_ids = [s for s, _ in src_to_dst]
        host_ids = [d for _, d in src_to_dst]
        gather = jnp.asarray(dev_ids, jnp.int32)
        if self.pp > 1:
            pages = np.asarray(self.kv_caches[:, gather])  # (L,P,2,H,bs,d)
            if "float8" in self.dtype_name:
                pages = pages.view(np.uint8)
            self.cpu_pool[:, host_ids] = pages.astype(self.cpu_pool.dtype,
                                                      copy=False)
            return
        for li, kv in enumerate(self.kv_caches):
            if isinstance(kv, tuple):  # recurrent state is never paged
                continue
            pages = np.asarray(kv[gather])  # (P, 2, H, bs, d)
            if "float8" in self.dtype_name:
                pages = pages.view(np.uint8)
            self.cpu_pool[li][host_ids] = pages.astype(self.cpu_pool.dtype,
                                                       copy=False)

    def swap_in(self, src_to_dst: List[Tuple[int, int]]) -> None:
        if not src_to_dst:
            return
        host_ids = [s for s, _ in src_to_dst]
        dev_ids = jnp.asarray([d for _, d in src_to_dst], jnp.int32)
        if self.pp > 1:
            host_pages = self.cpu_pool[:, host_ids]
            if "float8" in self.dtype_name:
                pages = jnp.asarray(host_pages).view(self.dtype)
            else:
                pages = jnp.asarray(host_pages).astype(self.dtype)
            self.kv_caches = _swap_in_stacked(self.kv_caches, dev_ids,
                                              pages)
            return
        new_caches = []
        for li, kv in enumerate(self.kv_caches):
            if isinstance(kv, tuple):
                new_caches.append(kv)
                continue
            host_pages = self.cpu_pool[li][host_ids]
            if "float8" in self.dtype_name:
                pages = jnp.asarray(host_pages).view(self.dtype)
            else:
                pages = jnp.asarray(host_pages).astype(self.dtype)
            new_caches.append(kv.at[dev_ids].set(pages))
        self.kv_caches = new_caches
