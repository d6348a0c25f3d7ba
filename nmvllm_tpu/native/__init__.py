"""Native (C++) host-runtime components — see csrc/host/nm_host.cpp."""
from nmvllm_tpu.native.host import (NativeSeqRegistry, hash_block_chain,
                                    native_available)

__all__ = ["NativeSeqRegistry", "hash_block_chain", "native_available"]
