"""Multi-host (pod-slice) runtime utilities.

Reference topology: Ray actors + NCCL groups + driver-side
broadcast_tensor_dict (vllm/executor/ray_gpu_executor.py,
distributed/parallel_state.py:477). TPU-native replacement
(SURVEY.md §7 decision 1):

  * Process launch = the TPU pod runtime (one process per host);
    ``init_multihost`` wraps ``jax.distributed.initialize`` so
    ``jax.devices()`` returns the GLOBAL device set and pjit/shard_map
    collectives ride ICI within a slice and DCN across slices.
  * Control plane = deterministic host-replicated scheduling: every host
    runs the identical engine (same scheduler state, same RNG streams),
    so no per-step metadata broadcast is needed — the only cross-host
    agreement required is on the REQUEST STREAM, provided by
    ``broadcast_py`` (host-0 publishes admissions; the reference's
    shm/gloo broadcast analogue, built on multihost_utils).
  * KV/weights shard over the global mesh exactly as single-host: mesh
    axes don't distinguish ICI from DCN — XLA lays collectives onto the
    fastest links (keep the tp axis within a slice: build_pod_mesh
    orders devices host-major so contiguous tp groups stay intra-slice).
"""
import pickle
from typing import Any, Optional, Sequence

import numpy as np

from nmvllm_tpu.logger import init_logger

logger = init_logger(__name__)


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """Initialize the JAX distributed runtime (no-op when single-host).

    On TPU pods the arguments are inferred from the environment; returns
    the process index.
    """
    import jax
    if num_processes in (None, 1) and coordinator_address is None:
        try:
            if jax.process_count() > 1:
                return jax.process_index()
        except Exception:
            pass
        return 0
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    logger.info("jax.distributed initialized: process %d/%d",
                jax.process_index(), jax.process_count())
    return jax.process_index()


def build_pod_mesh(data_parallel_size: int, tensor_parallel_size: int):
    """Global (data, tp) mesh over every device of every host.

    Devices are ordered host-major so each tp group is contiguous —
    with tp <= devices-per-host, tp collectives stay on ICI and only the
    data axis (request replicas / DP all-reduces, which inference never
    needs per-step) crosses DCN.
    """
    import jax
    from jax.sharding import Mesh

    from nmvllm_tpu.parallel.mesh import AXIS_NAMES
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = data_parallel_size * tensor_parallel_size
    if n > len(devs):
        raise ValueError(f"mesh {data_parallel_size}x{tensor_parallel_size}"
                         f" needs {n} devices, have {len(devs)}")
    arr = np.asarray(devs[:n]).reshape(data_parallel_size, 1,
                                       tensor_parallel_size)
    return Mesh(arr, AXIS_NAMES)


def broadcast_py(obj: Any, is_source: Optional[bool] = None) -> Any:
    """Broadcast a picklable python object from host 0 to all hosts
    (the analogue of the reference's shm/gloo metadata broadcast,
    distributed/device_communicators/shm_broadcast.py). Single-host:
    identity."""
    import jax
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils
    if is_source is None:
        is_source = jax.process_index() == 0
    payload = pickle.dumps(obj) if is_source else b""
    data = np.frombuffer(payload.ljust(_round_len(len(payload)), b"\0"),
                         dtype=np.uint8)
    length = np.asarray([len(payload)], np.int64)
    length = multihost_utils.broadcast_one_to_all(length)
    buf = np.zeros((int(length[0]) + 255) // 256 * 256, np.uint8)
    buf[:data.size] = data[:buf.size]
    buf = multihost_utils.broadcast_one_to_all(buf)
    return pickle.loads(buf[:int(length[0])].tobytes())


def _round_len(n: int) -> int:
    return (n + 255) // 256 * 256


def check_pod_health(timeout_s: float = 30.0) -> None:
    """Cross-host liveness check (the reference's executor health chain,
    vllm/executor/executor_base.py:99 + ray_gpu_executor health checks).

    JAX collectives simply HANG when a peer process has died, so a
    naive probe would turn one dead host into a silently wedged pod.
    This runs a tiny process allgather on a watchdog thread and
    converts a hang into a descriptive RuntimeError that the engine's
    dead-propagation path (AsyncEngineDeadError -> /health 500) can
    surface. After a timeout the pod is NOT recoverable — the stuck
    collective leaves the distributed runtime wedged — the contract is
    clean failure, not failover (matches the reference: a dead Ray
    worker kills the engine).

    Single-host: no-op.
    """
    import jax
    if jax.process_count() == 1:
        return
    import threading

    from jax.experimental import multihost_utils

    done = threading.Event()
    errs = []

    def probe():
        try:
            multihost_utils.process_allgather(
                np.asarray([jax.process_index()], np.int32))
        except Exception as e:  # pragma: no cover - runtime-dependent
            errs.append(e)
        finally:
            done.set()

    t = threading.Thread(target=probe, daemon=True, name="pod-health")
    t.start()
    if not done.wait(timeout_s):
        raise RuntimeError(
            f"pod health check timed out after {timeout_s:.0f}s: a host "
            f"is unresponsive (process {jax.process_index()} of "
            f"{jax.process_count()} waiting in allgather). The pod must "
            "be restarted.")
    if errs:
        raise RuntimeError(f"pod health check failed: {errs[0]!r}")


def assert_same_across_hosts(value: Any, what: str = "engine state"):
    """Debug guard for the host-replicated scheduling contract: hashes a
    picklable value and checks every host agrees (the rebuild's answer
    to the reference's driver-authoritative scheduling)."""
    import hashlib

    import jax
    if jax.process_count() == 1:
        return
    digest = hashlib.sha256(pickle.dumps(value)).digest()[:8]
    mine = np.frombuffer(digest, np.uint8)
    from jax.experimental import multihost_utils
    theirs = multihost_utils.broadcast_one_to_all(mine)
    if not np.array_equal(mine, theirs):
        raise RuntimeError(
            f"host-replicated {what} diverged between processes "
            f"(deterministic scheduling contract violated)")
