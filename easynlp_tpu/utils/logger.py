"""Process-rank-aware logger (capability parity: reference easynlp/utils/logger.py)."""

import logging
import os
import sys

_LOGGER_NAME = "easynlp_tpu"


def init_logger(local_rank: int = 0, level: int = logging.INFO) -> logging.Logger:
    """Initialise the package logger. Non-zero ranks log at WARNING by default so
    multi-host runs don't interleave N copies of every line."""
    logger = logging.getLogger(_LOGGER_NAME)
    if logger.handlers:
        return logger
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(
        logging.Formatter(
            fmt="[%(asctime)s] [%(levelname)s] [rank{}] %(message)s".format(local_rank),
            datefmt="%Y-%m-%d %H:%M:%S",
        )
    )
    logger.addHandler(handler)
    if local_rank == 0 or os.environ.get("EASYNLP_LOG_ALL_RANKS"):
        logger.setLevel(level)
    else:
        logger.setLevel(logging.WARNING)
    logger.propagate = False
    return logger


logger = init_logger(int(os.environ.get("EASYNLP_PROCESS_INDEX", "0")))
