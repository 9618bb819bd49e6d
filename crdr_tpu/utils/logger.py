"""Logging utilities: colored console logger, AvgMeter, CSVLogger.

Matches the observable behavior of the reference logger (src/utils/logger.py):
singleton root logger per name, optional file handler with ANSI stripped, windowed
loss averaging, and append-row CSV logging.
"""

from __future__ import annotations

import csv
import logging
import os
import re
import sys
from collections import defaultdict
from typing import Dict, List, Optional

_ANSI_RE = re.compile(r"\x1b\[[0-9;]*m")

COLORS = {
    "DEBUG": "\x1b[36m",     # cyan
    "INFO": "\x1b[32m",      # green
    "WARNING": "\x1b[33m",   # yellow
    "ERROR": "\x1b[31m",     # red
    "CRITICAL": "\x1b[35m",  # magenta
}
RESET = "\x1b[0m"
BOLD = "\x1b[1m"

_initialized: Dict[str, logging.Logger] = {}


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        color = COLORS.get(record.levelname, "")
        return f"{color}{msg}{RESET}" if color else msg


class _StripAnsiFormatter(logging.Formatter):
    def format(self, record):
        return _ANSI_RE.sub("", super().format(record))


def get_root_logger(name: str = "crdr_tpu", log_file: Optional[str] = None,
                    log_level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if name in _initialized:
        if log_file is not None and not any(
            isinstance(h, logging.FileHandler) for h in logger.handlers
        ):
            _add_file_handler(logger, log_file)
        return logger

    logger.setLevel(logging.DEBUG)
    logger.propagate = False
    sh = logging.StreamHandler(sys.stdout)
    sh.setLevel(log_level if not os.environ.get("CRDR_DEBUG") else logging.DEBUG)
    sh.setFormatter(_ColorFormatter("%(asctime)s %(levelname)s: %(message)s", "%H:%M:%S"))
    logger.addHandler(sh)
    if log_file is not None:
        _add_file_handler(logger, log_file)
    _initialized[name] = logger
    return logger


def _add_file_handler(logger: logging.Logger, log_file: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
    fh = logging.FileHandler(log_file)
    fh.setLevel(logging.DEBUG)
    fh.setFormatter(_StripAnsiFormatter("%(asctime)s %(levelname)s: %(message)s"))
    logger.addHandler(fh)


def bolded_log(msg: str, level: str = "INFO", new_line: bool = False,
               prefix: str = "===== ", suffix: str = " =====") -> None:
    logger = get_root_logger()
    text = f"{BOLD}{prefix}{msg}{suffix}{RESET}"
    if new_line:
        text = "\n" + text
    getattr(logger, level.lower())(text)


def log_dict_items(d: Dict, level: str = "INFO", indent: bool = False) -> None:
    logger = get_root_logger()
    pad = "    " if indent else ""
    for k, v in d.items():
        getattr(logger, level.lower())(f"{pad}{k}: {v}")


class IndentedLog:
    """Context manager that logs a message before a block (reference parity shim)."""

    def __init__(self, level: str = "INFO", msg: str = ""):
        self.level = level
        self.msg = msg

    def __enter__(self):
        if self.msg:
            getattr(get_root_logger(), self.level.lower())(self.msg)
        return self

    def __exit__(self, *exc):
        return False


class AvgMeter:
    """Windowed mean of scalar loss values keyed by name."""

    def __init__(self):
        self._sums = defaultdict(float)
        self._counts = defaultdict(int)

    def update(self, values: Dict[str, float]) -> None:
        for k, v in values.items():
            self._sums[k] += float(v)
            self._counts[k] += 1

    def get_avg_values(self) -> Dict[str, float]:
        return {k: self._sums[k] / max(self._counts[k], 1) for k in self._sums}

    def reset(self) -> None:
        self._sums.clear()
        self._counts.clear()


class CSVLogger:
    """Append-row CSV logger; rewrites header when new keys appear."""

    def __init__(self, log_path: str, resume: bool = False):
        self.log_path = log_path
        os.makedirs(os.path.dirname(os.path.abspath(log_path)), exist_ok=True)
        self._fieldnames: List[str] = []
        self._rows: List[Dict] = []
        if resume and os.path.exists(log_path):
            with open(log_path, newline="") as f:
                reader = csv.DictReader(f)
                self._fieldnames = list(reader.fieldnames or [])
                self._rows = [dict(r) for r in reader]

    def update(self, row: Dict) -> None:
        row = {k: (f"{v:.6g}" if isinstance(v, float) else v) for k, v in row.items()}
        for k in row:
            if k not in self._fieldnames:
                self._fieldnames.append(k)
        self._rows.append(row)
        with open(self.log_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fieldnames)
            writer.writeheader()
            for r in self._rows:
                writer.writerow(r)
