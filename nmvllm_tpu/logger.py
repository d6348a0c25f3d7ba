"""Logging for nmvllm_tpu.

Mirrors the behavior of the reference logger (vllm/logger.py): a package-level
root logger with a single stream handler, env-configurable level, and a
``init_logger`` accessor used by every module.
"""
import logging
import logging.config
import os
import sys

_FORMAT = "%(levelname)s %(asctime)s %(filename)s:%(lineno)d] %(message)s"
_DATE_FORMAT = "%m-%d %H:%M:%S"

_root = logging.getLogger("nmvllm_tpu")


def _setup() -> None:
    if _root.handlers:
        return
    if os.environ.get("NMVLLM_CONFIGURE_LOGGING", "1") in ("0", ""):
        # Host application owns logging (reference VLLM_CONFIGURE_LOGGING).
        _root.addHandler(logging.NullHandler())
        return
    cfg_path = os.environ.get("NMVLLM_LOGGING_CONFIG_PATH", "")
    if cfg_path:
        # Full dictConfig JSON (reference VLLM_LOGGING_CONFIG_PATH).
        import json
        with open(cfg_path) as f:
            logging.config.dictConfig(json.load(f))
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


_trace_installed = False


def maybe_enable_trace_function_call() -> None:
    """Log every nmvllm_tpu-internal call/return to a per-process file
    when NMVLLM_TRACE_FUNCTION is set (reference VLLM_TRACE_FUNCTION,
    vllm/logger.py enable_trace_function_call / utils.py:
    identify-the-hang debugging aid; high overhead, debugging only)."""
    global _trace_installed
    if _trace_installed or not os.environ.get("NMVLLM_TRACE_FUNCTION"):
        return
    import datetime
    import sys as _sys
    import tempfile
    root_dir = os.path.dirname(os.path.abspath(__file__))
    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    path = os.path.join(tempfile.gettempdir(),
                        f"nmvllm_trace_{stamp}_pid{os.getpid()}.log")
    fh = open(path, "a", buffering=1)
    _root.warning(
        "NMVLLM_TRACE_FUNCTION is set: logging every internal function "
        "call to %s. This slows everything down — debugging only.", path)

    def tracer(frame, event, arg):
        if event not in ("call", "return"):
            return
        code = frame.f_code
        if not code.co_filename.startswith(root_dir):
            return
        ts = datetime.datetime.now().strftime("%H:%M:%S.%f")
        fh.write(f"{ts} {event} {code.co_qualname} "
                 f"{code.co_filename}:{frame.f_lineno}\n")

    _sys.setprofile(tracer)
    import threading
    threading.setprofile(tracer)
    _trace_installed = True
