"""Logging for nmvllm_tpu.

Mirrors the behavior of the reference logger (vllm/logger.py): a package-level
root logger with a single stream handler, env-configurable level, and a
``init_logger`` accessor used by every module.
"""
import logging
import os
import sys

_FORMAT = "%(levelname)s %(asctime)s %(filename)s:%(lineno)d] %(message)s"
_DATE_FORMAT = "%m-%d %H:%M:%S"

_root = logging.getLogger("nmvllm_tpu")


def _setup() -> None:
    if _root.handlers:
        return
    level = os.environ.get("NMVLLM_LOGGING_LEVEL", "INFO").upper()
    _root.setLevel(level)
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATE_FORMAT))
    _root.addHandler(handler)
    _root.propagate = False


def init_logger(name: str) -> logging.Logger:
    _setup()
    if name.startswith("nmvllm_tpu"):
        return logging.getLogger(name)
    return logging.getLogger(f"nmvllm_tpu.{name}")
