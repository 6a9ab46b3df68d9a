"""Colored per-process logger with file output and rate-limited helpers.

Rebuild of reference `efg/utils/logger.py:16-240`: `setup_logger` with color
console + per-process file sink, `log_first_n`, `log_every_n`,
`log_every_n_seconds`. Process identity comes from `jax.process_index()`
instead of torch.distributed ranks.
"""

from __future__ import annotations

import functools
import logging
import os
import sys
import time
from collections import Counter
from typing import Optional

try:
    from termcolor import colored
except ImportError:  # pragma: no cover
    def colored(text, *a, **k):
        return text


class _ColorFormatter(logging.Formatter):
    def formatMessage(self, record: logging.LogRecord) -> str:
        log = super().formatMessage(record)
        if record.levelno == logging.WARNING:
            prefix = colored("WARNING", "red", attrs=["blink"])
        elif record.levelno in (logging.ERROR, logging.CRITICAL):
            prefix = colored("ERROR", "red", attrs=["blink", "underline"])
        else:
            return log
        return prefix + " " + log


@functools.lru_cache()
def setup_logger(
    output: Optional[str] = None,
    process_index: Optional[int] = None,
    *,
    color: bool = True,
    name: str = "efg_tpu",
) -> logging.Logger:
    """Create (once) the framework logger. Rank-0 logs to stdout; every process
    logs to `<output>/log.txt.rank{i}` when `output` is given."""
    if process_index is None:
        process_index = int(os.environ.get("EFG_PROCESS_INDEX", "0"))

    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.propagate = False

    plain = logging.Formatter(
        "[%(asctime)s] %(name)s %(levelname)s: %(message)s", datefmt="%m/%d %H:%M:%S"
    )

    if process_index == 0:
        ch = logging.StreamHandler(stream=sys.stdout)
        ch.setLevel(logging.DEBUG)
        if color:
            ch.setFormatter(
                _ColorFormatter(
                    colored("[%(asctime)s %(name)s]: ", "green") + "%(message)s",
                    datefmt="%m/%d %H:%M:%S",
                )
            )
        else:
            ch.setFormatter(plain)
        logger.addHandler(ch)

    if output:
        filename = os.path.join(output, f"log.txt.rank{process_index}")
        os.makedirs(os.path.dirname(filename), exist_ok=True)
        fh = logging.StreamHandler(open(filename, "a"))
        fh.setLevel(logging.DEBUG)
        fh.setFormatter(plain)
        logger.addHandler(fh)

    return logger


_LOG_COUNTER: Counter = Counter()
_LOG_TIMER: dict = {}


def _caller_key():
    frame = sys._getframe(3)
    return (frame.f_code.co_filename, frame.f_lineno)


def log_first_n(lvl: int, msg: str, n: int = 1, *, name: str = "efg_tpu", key="caller") -> None:
    caller = _caller_key() if key == "caller" else (key, msg)
    _LOG_COUNTER[caller] += 1
    if _LOG_COUNTER[caller] <= n:
        logging.getLogger(name).log(lvl, msg)


def log_every_n(lvl: int, msg: str, n: int = 1, *, name: str = "efg_tpu") -> None:
    caller = _caller_key()
    _LOG_COUNTER[caller] += 1
    if n == 1 or _LOG_COUNTER[caller] % n == 1:
        logging.getLogger(name).log(lvl, msg)


def log_every_n_seconds(lvl: int, msg: str, n: int = 1, *, name: str = "efg_tpu") -> None:
    caller = _caller_key()
    last = _LOG_TIMER.get(caller)
    now = time.time()
    if last is None or now - last >= n:
        logging.getLogger(name).log(lvl, msg)
        _LOG_TIMER[caller] = now
