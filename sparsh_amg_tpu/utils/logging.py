"""Structured logging (SURVEY.md §5.5: the reference printf's residual per
iteration and phase timings; here a std-logging logger plus a JSON-friendly
iteration record)."""
from __future__ import annotations

import logging


def get_logger(name: str = "sparsh_amg_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"))
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
    return logger


def iteration_log(iteration: int, relres: float, elapsed_s: float) -> dict:
    return {"iter": iteration, "relres": relres, "t": elapsed_s}
