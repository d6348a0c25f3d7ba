"""Shared Eigen-threading policy for virtual CPU meshes.

On a virtual mesh (``--xla_force_host_platform_device_count=N``), Eigen
threading interacts with XLA's 40s collective rendezvous two ways:
 - devices <= nproc: per-device nproc-wide Eigen pools oversubscribe the
   host and can starve the rendezvous -> single-threaded Eigen is both
   faster and reliable.
 - devices > nproc: single-threaded executors DEADLOCK -- only nproc
   device programs can run concurrently, each parked inside a collective
   waiting for peers that can never be scheduled (rendezvous.cc aborts
   after 40s). Multi-threaded Eigen lets collective thunks progress on
   the shared pool, so all participants reach the rendezvous.

This module owns the decision so the three call sites (tests/conftest.py,
__graft_entry__, dryrun subprocess env) cannot silently diverge
(ADVICE.md round 1). It must stay importable before jax initializes and
must not import jax itself.
"""
import os
import re


def single_threaded_eigen(n_devices: int) -> bool:
    """True when per-device single-threaded Eigen is safe (and faster)."""
    return n_devices <= (os.cpu_count() or 1)


def device_count_from_flags(flags: str, default: int = 1) -> int:
    m = re.search(r"xla_force_host_platform_device_count=(\d+)", flags)
    return int(m.group(1)) if m else default


def eigen_flag(n_devices: int) -> str:
    return ("--xla_cpu_multi_thread_eigen=" +
            str(not single_threaded_eigen(n_devices)).lower())


def apply_to_xla_flags(flags: str, n_devices: int = 0) -> str:
    """Append the Eigen flag to an XLA_FLAGS string if not already set.

    When ``n_devices`` is 0, the device count is parsed out of ``flags``
    (an externally-set xla_force_host_platform_device_count wins over any
    caller assumption).
    """
    if "xla_cpu_multi_thread_eigen" in flags:
        return flags
    if n_devices <= 0:
        n_devices = device_count_from_flags(flags)
    return (flags + " " + eigen_flag(n_devices)).strip()
