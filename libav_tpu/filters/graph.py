"""Filter + FilterGraph core (reference: libavfilter/avfilter.h:120
AVFilter, :569 AVFilterGraph, graphparser.c parse_filter chains)."""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Type

from libav_tpu.avutil.error import AVError, EINVAL
from libav_tpu.avutil.frame import Frame
from libav_tpu.avutil.opt import OptionedObject

_FILTERS: Dict[str, Type["Filter"]] = {}


def register_filter(cls):
    _FILTERS[cls.NAME] = cls
    return cls


def get_filter(name: str) -> Type["Filter"]:
    if name not in _FILTERS:
        raise AVError(EINVAL, f"no such filter: {name!r}")
    return _FILTERS[name]


def list_filters() -> List[str]:
    return sorted(_FILTERS)


class Filter(OptionedObject):
    """reference: avfilter.h:120 AVFilter + AVFilterContext merged.

    Subclasses implement filter_frame(frame) -> List[Frame]; flush() ->
    List[Frame] for buffered filters (fps, trim...).
    """

    NAME = "null"
    TYPE = "video"    # or "audio"

    def __init__(self, args: str = "", **kwopts):
        self.init_defaults()
        self.next: Optional[Filter] = None
        if args:
            self._parse_args(args)
        for k, v in kwopts.items():
            self.set_opt(k, v)
        self._configured = False

    def _parse_args(self, args: str):
        """'w=320:h=240' or positional '320:240'
        (reference: graphparser.c option syntax)."""
        table = [o for o in self._opt_table().values() if o.type != "const"]
        for i, part in enumerate(args.split(":")):
            if not part:
                continue
            if "=" in part:
                k, v = part.split("=", 1)
                self.set_opt(k.strip(), v.strip())
            else:
                if i >= len(table):
                    raise AVError(EINVAL, f"{self.NAME}: too many args")
                self.set_opt(table[i].name, part)

    def configure(self, frame: Frame):
        """Called once with the first frame (link negotiation stand-in)."""

    def filter_frame(self, frame: Frame) -> List[Frame]:
        return [frame]

    def flush(self) -> List[Frame]:
        return []

    def push(self, frame: Frame) -> List[Frame]:
        """reference: avfilter.c:643 ff_filter_frame"""
        if not self._configured:
            self.configure(frame)
            self._configured = True
        out = self.filter_frame(frame)
        if self.next is None:
            return out
        result = []
        for f in out:
            result.extend(self.next.push(f))
        return result

    def push_eof(self) -> List[Frame]:
        out = self.flush()
        if self.next is None:
            return out
        result = []
        for f in out:
            result.extend(self.next.push(f))
        result.extend(self.next.push_eof())
        return result


class FilterGraph:
    """reference: avfiltergraph.c AVFilterGraph (linear chains +
    comma-separated parse; full DAG labels TODO)."""

    def __init__(self, description: str = ""):
        self.filters: List[Filter] = []
        if description:
            self.parse(description)

    def parse(self, description: str):
        """'scale=320:240,format=yuv420p' (reference: graphparser.c)."""
        for chunk in _split_chain(description):
            m = re.match(r"([a-zA-Z_][a-zA-Z_0-9]*)(?:=(.*))?$", chunk.strip())
            if not m:
                raise AVError(EINVAL, f"cannot parse filter spec {chunk!r}")
            name, args = m.group(1), m.group(2) or ""
            self.add(get_filter(name)(args))

    def add(self, f: Filter) -> Filter:
        if self.filters:
            self.filters[-1].next = f
        self.filters.append(f)
        return f

    def push(self, frame: Frame) -> List[Frame]:
        if not self.filters:
            return [frame]
        return self.filters[0].push(frame)

    def push_eof(self) -> List[Frame]:
        if not self.filters:
            return []
        return self.filters[0].push_eof()


def _split_chain(desc: str) -> List[str]:
    """Split on commas not inside quotes/escapes."""
    parts, cur, esc = [], "", False
    for ch in desc:
        if esc:
            cur += ch
            esc = False
        elif ch == "\\":
            esc = True
        elif ch == ",":
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    if cur.strip():
        parts.append(cur)
    return [p for p in parts if p.strip()]
