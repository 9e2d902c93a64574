import logging

from .profiling import (
    trace, Timer, ChipSpec, CHIPS, roofline, matmul_roofline, detect_chip,
    report_fraction,
)

# one stdlib logger, reference parity (sdnext.py:9: logging.getLogger("sdnq"))
log = logging.getLogger("sdnq_tpu")

__all__ = ["trace", "Timer", "ChipSpec", "CHIPS", "roofline",
           "matmul_roofline", "detect_chip", "report_fraction", "log"]
