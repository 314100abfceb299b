"""stdout tee to ``OUTPUT_DIR/log.txt`` (mirrors Dassl/dassl/utils/logger.py:12-73)."""

from __future__ import annotations

import os
import sys
import time


class Logger:
    """Writes to console and to a file simultaneously."""

    def __init__(self, fpath: str | None = None):
        self.console = sys.stdout
        self.file = None
        if fpath is not None:
            os.makedirs(os.path.dirname(fpath), exist_ok=True)
            self.file = open(fpath, "w")

    def __del__(self):
        self.close()

    def write(self, msg):
        self.console.write(msg)
        if self.file is not None:
            self.file.write(msg)
            if "\n" in msg:
                # line-buffer the file so a preempted/killed run keeps its log
                # tail (print() never calls flush on non-tty streams; fsync is
                # reserved for explicit flush())
                self.file.flush()

    def flush(self):
        self.console.flush()
        if self.file is not None:
            self.file.flush()
            os.fsync(self.file.fileno())

    def close(self):
        self.console.flush()
        if self.file is not None:
            self.file.close()
            self.file = None


def setup_logger(output: str | None = None) -> None:
    if output is None:
        return
    if output.endswith(".txt") or output.endswith(".log"):
        fpath = output
    else:
        fpath = os.path.join(output, "log.txt")
    if os.path.exists(fpath):
        # timestamp the old log like the reference does
        fpath += time.strftime("-%Y-%m-%d-%H-%M-%S")
    sys.stdout = Logger(fpath)
