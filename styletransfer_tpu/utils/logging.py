"""Application logging that cooperates with tqdm progress bars.

TPU-native rebuild of the reference ``stransfer/c_logging.py`` (reference
``c_logging.py:1-68``): one app-level logger named ``StyleTransfer`` at INFO,
a handler that routes console output through ``tqdm.write`` so progress bars
stay pinned at the bottom, and a truncating file handler at
``runs/runtime.log``.

Differences from the reference: handler setup is lazy (no filesystem side
effects at import time) and idempotent, so importing the package never
creates directories — important for test isolation.
"""

from __future__ import annotations

import logging
import os

from styletransfer_tpu import constants

_LOGGER_NAME = "StyleTransfer"

LOGGER_FORMATTER = logging.Formatter(
    "%(asctime)s [%(levelname)s] %(module)s.%(funcName)s #%(lineno)d - %(message)s"
)


class TqdmLoggingHandler(logging.StreamHandler):
    """Console handler that emits through ``tqdm.write`` on **stderr**.

    Keeps tqdm progress bars pinned at the bottom of the terminal instead of
    interleaving log lines with bar redraws (reference ``c_logging.py:27-48``).
    Emits to stderr — not ``tqdm.write``'s stdout default: stdout must stay
    clean for the line-oriented serving daemons (engines/daemon.py), whose
    clients read one protocol line per request. ``sys.stderr`` is resolved
    at emit time (not bound at handler construction) so stream redirection
    (pytest capture, shell ``2>``) always applies. Falls back to a plain
    stream write if tqdm is unavailable.
    """

    def emit(self, record: logging.LogRecord) -> None:
        import sys

        try:
            msg = self.format(record)
            try:
                import tqdm

                tqdm.tqdm.write(msg, file=sys.stderr)
            except ImportError:  # pragma: no cover - tqdm is a hard dep in practice
                sys.stderr.write(msg + "\n")
            sys.stderr.flush()
        except (KeyboardInterrupt, SystemExit):
            raise
        except Exception:  # noqa: BLE001 - match logging.Handler contract
            self.handleError(record)


_configured = False


def _configure(log_to_file: bool = True) -> logging.Logger:
    global _configured
    logger = logging.getLogger(_LOGGER_NAME)
    if _configured:
        return logger

    logger.setLevel(logging.INFO)
    logger.handlers = []

    console = TqdmLoggingHandler()
    console.setFormatter(LOGGER_FORMATTER)
    logger.addHandler(console)

    if log_to_file:
        # Truncate-per-run file log, same path/mode as the reference
        # (c_logging.py:50-58).
        try:
            os.makedirs(constants.RUNS_PATH, exist_ok=True)
            file_handler = logging.FileHandler(constants.LOG_PATH, mode="w+")
            file_handler.setFormatter(LOGGER_FORMATTER)
            logger.addHandler(file_handler)
        except OSError:
            # Read-only or otherwise unwritable working directory: console only.
            pass

    _configured = True
    return logger


def get_logger() -> logging.Logger:
    """Return the application-wide logger (reference ``c_logging.py:64-68``)."""
    return _configure()
