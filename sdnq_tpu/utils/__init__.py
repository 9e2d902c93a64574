import logging

from .profiling import (
    trace, Timer, ChipSpec, CHIPS, roofline, matmul_roofline, detect_chip,
    report_fraction,
)

# one stdlib logger, reference parity (sdnext.py:9: logging.getLogger("sdnq"))
log = logging.getLogger("sdnq_tpu")
_lvl = __import__("os").environ.get("SDNQ_TPU_LOG_LEVEL")
if _lvl:
    log.setLevel(_lvl.upper())

__all__ = ["trace", "Timer", "ChipSpec", "CHIPS", "roofline",
           "matmul_roofline", "detect_chip", "report_fraction", "log"]
