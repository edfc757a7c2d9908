"""Console+file logger (utils/logger.py:31-94 equivalent: rank-0 colored
console, per-process log file)."""
from __future__ import annotations

import logging
import os
import sys


def setup_logger(output: str = None, name: str = "omni_pq_tpu",
                 distributed_rank: int = 0) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    if logger.handlers:
        return logger
    fmt = logging.Formatter(
        "[%(asctime)s %(name)s]: %(levelname)s %(message)s",
        datefmt="%m/%d %H:%M:%S")
    if distributed_rank == 0:
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.DEBUG)
        ch.setFormatter(fmt)
        logger.addHandler(ch)
    if output:
        os.makedirs(output, exist_ok=True)
        filename = os.path.join(output, f"log.rank{distributed_rank}.txt")
        fh = logging.FileHandler(filename)
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger
