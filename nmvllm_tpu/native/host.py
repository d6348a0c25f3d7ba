"""ctypes binding + lazy build of the native host-runtime library.

Builds csrc/host/nm_host.cpp with g++ on first use (cached in
``<repo>/build/``, keyed by source hash — survives across processes).
pybind11 is not in this image, so the library exposes a plain C ABI and
numpy arrays are passed by pointer. All consumers must keep a Python
fallback: ``native_available()`` is False when no compiler is present
or ``NMVLLM_NATIVE_HOST=0``.
"""
import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _build() -> Optional[ctypes.CDLL]:
    from nmvllm_tpu import envs
    if not envs.NMVLLM_NATIVE_HOST:
        return None
    src = os.path.join(_repo_root(), "csrc", "host", "nm_host.cpp")
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    build_dir = os.path.join(_repo_root(), "build")
    os.makedirs(build_dir, exist_ok=True)
    so = os.path.join(build_dir, f"nm_host_{digest}.so")
    if not os.path.exists(so):
        tmp = so + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
               "-o", tmp]
        try:
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=120)
            os.replace(tmp, so)  # atomic: concurrent builders race safely
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.nm_reg_new.restype = ctypes.c_void_p
    lib.nm_reg_new.argtypes = [ctypes.c_int32]
    lib.nm_reg_destroy.argtypes = [ctypes.c_void_p]
    lib.nm_reg_set_seq.restype = ctypes.c_int32
    lib.nm_reg_set_seq.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                   ctypes.c_int32, ctypes.c_int32, i32p,
                                   ctypes.c_int32]
    lib.nm_reg_append_token.restype = ctypes.c_int32
    lib.nm_reg_append_token.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                        ctypes.c_int32, ctypes.c_int32]
    lib.nm_reg_clear_seq.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.nm_reg_get.restype = ctypes.c_int32
    lib.nm_reg_get.argtypes = [ctypes.c_void_p, ctypes.c_int32, i32p, i32p,
                               i32p]
    lib.nm_prepare_decode.restype = ctypes.c_int32
    lib.nm_prepare_decode.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int32,
                                      ctypes.c_int32, ctypes.c_int32,
                                      ctypes.c_int32, i32p, i32p, i32p,
                                      i32p, i32p]
    lib.nm_hash_block.restype = ctypes.c_uint64
    lib.nm_hash_block.argtypes = [ctypes.c_uint64, i32p, ctypes.c_int32]
    lib.nm_hash_blocks.argtypes = [ctypes.c_uint64, i32p, ctypes.c_int32,
                                   ctypes.c_int32,
                                   ctypes.POINTER(ctypes.c_uint64)]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    with _LOCK:
        if not _TRIED:
            _LIB = _build()
            _TRIED = True
    return _LIB


def native_available() -> bool:
    return _get_lib() is not None


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def hash_block_chain(prev_hash: int, tokens) -> int:
    """Chained content hash of one block given the previous block's hash
    (or a seed for block 0). Non-negative int63."""
    lib = _get_lib()
    arr = np.ascontiguousarray(tokens, dtype=np.int32)
    if lib is None:
        # Python fallback with identical semantics (FNV-1a 64).
        h = 0xcbf29ce484222325
        h = ((h ^ (prev_hash & 0xFFFFFFFFFFFFFFFF)) *
             0x100000001b3) & 0xFFFFFFFFFFFFFFFF
        for t in arr.tolist():
            h = ((h ^ (t & 0xFFFFFFFF)) * 0x100000001b3) & 0xFFFFFFFFFFFFFFFF
        return h & 0x7FFFFFFFFFFFFFFF
    return int(lib.nm_hash_block(
        ctypes.c_uint64(prev_hash & 0xFFFFFFFFFFFFFFFF), _i32p(arr),
        arr.size))


class NativeSeqRegistry:
    """Persistent per-sequence decode state (block table, length, last
    token) living in C memory; one-call padded batch assembly.

    The runner mirrors scheduler state into the registry incrementally
    (append_token per decoded token, set_seq on (re)allocation) and calls
    prepare_decode once per step instead of a per-row numpy loop.
    """

    def __init__(self, max_seqs: int):
        self._lib = _get_lib()
        assert self._lib is not None, "native host library unavailable"
        self._reg = ctypes.c_void_p(self._lib.nm_reg_new(max_seqs))
        assert self._reg.value, "nm_reg_new failed"
        self.max_seqs = max_seqs

    def __del__(self):
        lib, reg = getattr(self, "_lib", None), getattr(self, "_reg", None)
        if lib is not None and reg:
            lib.nm_reg_destroy(reg)

    def set_seq(self, slot: int, seq_len: int, last_token: int, table):
        t = np.ascontiguousarray(table, dtype=np.int32)
        rc = self._lib.nm_reg_set_seq(self._reg, slot, seq_len, last_token,
                                      _i32p(t), t.size)
        if rc != 0:
            raise RuntimeError(f"nm_reg_set_seq failed rc={rc}")

    def append_token(self, slot: int, token: int, new_block: int = -1):
        rc = self._lib.nm_reg_append_token(self._reg, slot, token, new_block)
        if rc != 0:
            raise RuntimeError(f"nm_reg_append_token failed rc={rc}")

    def clear_seq(self, slot: int):
        self._lib.nm_reg_clear_seq(self._reg, slot)

    def get(self, slot: int):
        """(seq_len, last_token, n_blocks) or None if slot not live."""
        a = ctypes.c_int32()
        b = ctypes.c_int32()
        c = ctypes.c_int32()
        rc = self._lib.nm_reg_get(self._reg, slot, ctypes.byref(a),
                                  ctypes.byref(b), ctypes.byref(c))
        if rc != 0:
            return None
        return a.value, b.value, c.value

    def prepare_decode(self, rows: np.ndarray, b_pad: int, block_size: int,
                       max_blocks_per_seq: int):
        """rows: (n,) int32 registry slots. Returns the five padded
        arrays (tokens, positions, slots, block_tables, ctx)."""
        n = int(rows.size)
        rows = np.ascontiguousarray(rows, dtype=np.int32)
        tokens = np.empty((b_pad, 1), np.int32)
        positions = np.empty((b_pad, 1), np.int32)
        slots = np.empty((b_pad, 1), np.int32)
        block_tables = np.empty((b_pad, max_blocks_per_seq), np.int32)
        ctx = np.empty((b_pad,), np.int32)
        rc = self._lib.nm_prepare_decode(
            self._reg, _i32p(rows), n, b_pad, block_size,
            max_blocks_per_seq, _i32p(tokens), _i32p(positions),
            _i32p(slots), _i32p(block_tables), _i32p(ctx))
        if rc != 0:
            raise RuntimeError(f"nm_prepare_decode failed rc={rc}")
        return tokens, positions, slots, block_tables, ctx
