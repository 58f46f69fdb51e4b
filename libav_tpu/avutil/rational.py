"""Exact rational arithmetic for timestamps (reference: libavutil/rational.h
(155 lines) and mathematics.h:111 av_rescale_q).

Python's fractions would work but carries overhead in the demux hot path;
this is a minimal int-pair implementation with the exact same rounding
semantics as av_rescale_rnd (mathematics.c).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


class Rounding:
    """reference: mathematics.h:71 enum AVRounding"""
    ZERO = 0
    INF = 1
    DOWN = 2
    UP = 3
    NEAR_INF = 5
    PASS_MINMAX = 8192


@dataclass(frozen=True)
class Rational:
    """reference: rational.h:44 AVRational {int num, den}"""
    num: int = 0
    den: int = 1

    def __post_init__(self):
        pass

    @staticmethod
    def reduce(num: int, den: int) -> "Rational":
        # reference: rational.c av_reduce
        if den == 0:
            return Rational(0, 0) if num == 0 else Rational(1 if num > 0 else -1, 0)
        g = math.gcd(num, den)
        if g:
            num //= g
            den //= g
        if den < 0:
            num, den = -num, -den
        return Rational(num, den)

    def __mul__(self, o: "Rational") -> "Rational":
        return Rational.reduce(self.num * o.num, self.den * o.den)

    def __truediv__(self, o: "Rational") -> "Rational":
        return Rational.reduce(self.num * o.den, self.den * o.num)

    def __add__(self, o: "Rational") -> "Rational":
        return Rational.reduce(self.num * o.den + o.num * self.den, self.den * o.den)

    def __sub__(self, o: "Rational") -> "Rational":
        return Rational.reduce(self.num * o.den - o.num * self.den, self.den * o.den)

    def __float__(self) -> float:
        return self.num / self.den if self.den else float('nan')

    def inv(self) -> "Rational":
        return Rational(self.den, self.num)

    def __bool__(self) -> bool:
        return self.num != 0 and self.den != 0

    def __repr__(self) -> str:
        return f"{self.num}/{self.den}"


TIME_BASE = 1000000                      # reference: avutil.h AV_TIME_BASE
TIME_BASE_Q = Rational(1, TIME_BASE)
NOPTS_VALUE = -0x8000000000000000        # reference: avutil.h AV_NOPTS_VALUE


def rescale_rnd(a: int, b: int, c: int, rnd: int = Rounding.NEAR_INF) -> int:
    """a * b / c with explicit rounding; exact in Python ints.
    reference: mathematics.c av_rescale_rnd"""
    if c == 0:
        raise ZeroDivisionError("rescale by zero timebase")
    r = rnd & ~Rounding.PASS_MINMAX
    prod = a * b
    neg = (prod < 0) != (c < 0)
    ap, cp = abs(prod), abs(c)
    if r == Rounding.ZERO:
        q = ap // cp
    elif r == Rounding.INF:
        q = (ap + cp - 1) // cp
    elif r == Rounding.DOWN:
        return prod // c if c > 0 else (-prod) // (-c)
    elif r == Rounding.UP:
        return -((-prod) // c) if c > 0 else -(prod // (-c))
    else:  # NEAR_INF: round half away from zero
        q = (ap + cp // 2) // cp
    return -q if neg else q


def rescale(a: int, b: int, c: int) -> int:
    """reference: mathematics.c av_rescale (round to nearest)"""
    return rescale_rnd(a, b, c, Rounding.NEAR_INF)


def rescale_q(a: int, bq: Rational, cq: Rational,
              rnd: int = Rounding.NEAR_INF) -> int:
    """Rescale timestamp a from timebase bq to cq.
    reference: mathematics.c av_rescale_q_rnd"""
    if a == NOPTS_VALUE:
        return a
    return rescale_rnd(a, bq.num * cq.den, cq.num * bq.den, rnd)


def compare_ts(ts_a: int, tb_a: Rational, ts_b: int, tb_b: Rational) -> int:
    """reference: mathematics.c av_compare_ts"""
    a = ts_a * tb_a.num * tb_b.den
    b = ts_b * tb_b.num * tb_a.den
    return (a > b) - (a < b)


def gcd_q(a: Rational, b: Rational) -> Rational:
    lcm_den = a.den * b.den // math.gcd(a.den, b.den)
    g = math.gcd(a.num * (lcm_den // a.den), b.num * (lcm_den // b.den))
    return Rational.reduce(g, lcm_den)
