"""Usage telemetry (reference: vllm/usage/usage_lib.py:98).

The NM fork ships with telemetry default-OFF (envs.py:22-23); this rebuild
keeps the API surface but never transmits anything — environments with zero
egress are the deployment target. Data is only written to a local JSON file
for operator inspection.
"""
import json
import os
import platform
import time
from enum import Enum
from pathlib import Path
from typing import Any, Dict

_USAGE_DIR = Path(os.path.expanduser("~/.cache/nmvllm_tpu/usage"))


class UsageContext(str, Enum):
    UNKNOWN_CONTEXT = "UNKNOWN_CONTEXT"
    LLM_CLASS = "LLM_CLASS"
    API_SERVER = "API_SERVER"
    OPENAI_API_SERVER = "OPENAI_API_SERVER"
    ENGINE_CONTEXT = "ENGINE_CONTEXT"


def is_usage_stats_enabled() -> bool:
    # Always disabled (parity with NM fork defaults; no egress).
    return False


class UsageMessage:

    def __init__(self) -> None:
        self.data: Dict[str, Any] = {}

    def report_usage(self, model_architecture: str,
                     usage_context: UsageContext,
                     extra_kvs: Dict[str, Any] = None) -> None:
        self.data = {
            "timestamp": time.time(),
            "model_architecture": model_architecture,
            "context": str(usage_context),
            "platform": platform.platform(),
            **(extra_kvs or {}),
        }
        try:
            _USAGE_DIR.mkdir(parents=True, exist_ok=True)
            with open(_USAGE_DIR / "usage_stats.json", "w") as f:
                json.dump(self.data, f)
        except OSError:
            pass


usage_message = UsageMessage()
