"""Introspectable option system (reference: libavutil/opt.h:234 AVOption,
opt.c av_opt_set family).

Every configurable context in the reference embeds an AVClass with an
AVOption table giving uniform string-based option setting and help output.
Here: classes declare OPTIONS = [Option(...)]; set_opt()/get_opt() walk the
table, parse strings by type, and apply range checks — same contract as
av_opt_set, including named constants and flag syntax ("+flag-flag2").
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

from libav_tpu.avutil.error import AVError, OPTION_NOT_FOUND, EINVAL
from libav_tpu.avutil.rational import Rational


@dataclass
class Option:
    """reference: opt.h:234 AVOption"""
    name: str
    help: str = ""
    type: str = "int"          # int|int64|float|double|string|rational|bool|flags|const
    default: Any = None
    min: Optional[float] = None
    max: Optional[float] = None
    unit: Optional[str] = None  # groups consts with their option
    const_value: Any = None     # for type == 'const'


def _parse_rational(s: str) -> Rational:
    if "/" in s:
        n, d = s.split("/")
        return Rational.reduce(int(n), int(d))
    if ":" in s:
        n, d = s.split(":")
        return Rational.reduce(int(n), int(d))
    f = float(s)
    return Rational.reduce(int(f * 100000), 100000)


class OptionedObject:
    """Mixin giving a class an option table (reference AVClass/AVOption)."""

    OPTIONS: Sequence[Option] = ()

    def _opt_table(self) -> Dict[str, Option]:
        table = {}
        for klass in type(self).__mro__:
            for o in getattr(klass, "OPTIONS", ()):
                table.setdefault(o.name, o)
        return table

    def init_defaults(self):
        """reference: opt.c av_opt_set_defaults"""
        for name, o in self._opt_table().items():
            if o.type != "const" and not hasattr(self, name):
                setattr(self, name, o.default)

    def set_opt(self, name: str, value: Any):
        """reference: opt.c av_opt_set (string in, typed field out)"""
        table = self._opt_table()
        o = table.get(name)
        if o is None or o.type == "const":
            raise AVError(OPTION_NOT_FOUND, name)
        v: Any
        if not isinstance(value, str):
            v = value
        elif o.type in ("int", "int64"):
            v = self._resolve_const(table, o, value)
            v = int(v)
        elif o.type in ("float", "double"):
            v = float(value)
        elif o.type == "bool":
            v = value.lower() in ("1", "true", "on", "yes")
        elif o.type == "rational":
            v = _parse_rational(value)
        elif o.type == "flags":
            v = self._parse_flags(table, o, value)
        else:
            v = value
        if o.type in ("int", "int64", "float", "double") and isinstance(v, (int, float)):
            if o.min is not None and v < o.min:
                raise AVError(EINVAL, f"{name}={v} below min {o.min}")
            if o.max is not None and v > o.max:
                raise AVError(EINVAL, f"{name}={v} above max {o.max}")
        setattr(self, name, v)

    def _resolve_const(self, table, o: Option, value: str):
        for c in table.values():
            if c.type == "const" and c.unit == o.unit and c.name == value:
                return c.const_value
        return value

    def _parse_flags(self, table, o: Option, value: str) -> int:
        """'+a-b+c' syntax (reference: opt.c set_string_flags)"""
        cur = getattr(self, o.name, o.default) or 0
        if value and value[0] not in "+-":
            cur = 0
            value = "+" + value
        import re
        for sign, name in re.findall(r"([+-])([A-Za-z0-9_]+)", value):
            bit = None
            for c in table.values():
                if c.type == "const" and c.unit == o.unit and c.name == name:
                    bit = c.const_value
            if bit is None:
                raise AVError(OPTION_NOT_FOUND, f"flag {name} for {o.name}")
            cur = (cur | bit) if sign == "+" else (cur & ~bit)
        return cur

    def get_opt(self, name: str) -> Any:
        if name not in self._opt_table():
            raise AVError(OPTION_NOT_FOUND, name)
        return getattr(self, name, None)

    def set_opts(self, opts: Dict[str, Any], ignore_unknown: bool = False) -> Dict[str, Any]:
        """Apply a dict of options; return the ones not consumed
        (reference: avformat.h:1495 options dict convention)."""
        leftover = {}
        for k, v in opts.items():
            try:
                self.set_opt(k, v)
            except AVError as e:
                if e.code == OPTION_NOT_FOUND and ignore_unknown:
                    leftover[k] = v
                else:
                    raise
        return leftover
