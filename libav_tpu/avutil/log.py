"""Leveled, per-object logging (reference: libavutil/log.h:34 AVClass,
log.h:180 av_log, log.c) with an overridable callback like
av_log_set_callback."""

from __future__ import annotations

import sys
from typing import Callable, Optional

QUIET = -8
PANIC = 0
FATAL = 8
ERROR = 16
WARNING = 24
INFO = 32
VERBOSE = 40
DEBUG = 48
TRACE = 56

_LEVEL_NAMES = {PANIC: "panic", FATAL: "fatal", ERROR: "error",
                WARNING: "warning", INFO: "info", VERBOSE: "verbose",
                DEBUG: "debug", TRACE: "trace"}

_level = INFO
_callback: Optional[Callable] = None


def set_level(level: int):
    """reference: log.c av_log_set_level"""
    global _level
    _level = level


def get_level() -> int:
    return _level


def set_callback(cb: Optional[Callable]):
    """reference: log.h av_log_set_callback"""
    global _callback
    _callback = cb


def log(obj, level: int, msg: str, *args):
    """reference: log.h:180 av_log(void *avcl, int level, fmt, ...)"""
    if level > _level:
        return
    text = (msg % args) if args else msg
    if _callback is not None:
        _callback(obj, level, text)
        return
    name = getattr(obj, "log_name", None) or (type(obj).__name__ if obj is not None else "")
    prefix = f"[{name}] " if name else ""
    sys.stderr.write(f"{prefix}{text}\n")


def error(obj, msg, *args):
    log(obj, ERROR, msg, *args)


def warning(obj, msg, *args):
    log(obj, WARNING, msg, *args)


def info(obj, msg, *args):
    log(obj, INFO, msg, *args)


def debug(obj, msg, *args):
    log(obj, DEBUG, msg, *args)
