"""Leveled logging.

Reference analog: the ``_Log`` singleton (ref:src/Log.cpp) with
Message/Verbose/Warning/Error levels; ``Log.Error`` terminates.  We use
stdlib logging; fatal errors raise instead of exiting so library users can
handle them.
"""

from __future__ import annotations

import logging
import sys

_FORMAT = "[%(levelname).1s %(asctime)s %(name)s] %(message)s"
_configured = False


def get_logger(name: str = "ngm-tpu") -> logging.Logger:
    global _configured
    if not _configured:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        root = logging.getLogger("ngm-tpu")
        root.addHandler(h)
        root.setLevel(logging.INFO)
        root.propagate = False
        _configured = True
    return logging.getLogger(name)
