"""Expressions module — the reference's ``expressions`` JavaScript
expression compiler (expressions/js/JavascriptCompiler.java,
Javascript.g4 grammar, JavascriptCompiler.properties function table)
re-expressed as a compiler to a Spark Column.

Semantics follow the reference bytecode compiler:

- every value is a double; comparisons yield 1.0/0.0; ``!``, ``&&``,
  ``||`` and the ternary condition treat nonzero as true;
- bitwise ``& | ^ ~ << >> >>>`` operate on the (long) cast of the
  doubles and return doubles (JavascriptCompiler pushes J2D/D2J
  conversions around bitwise bytecodes);
- the function table is JavascriptCompiler.properties verbatim: abs,
  acos, acosh, asin, asinh, atan, atan2, atanh, ceil, cos, cosh, exp,
  floor, haversin (km), haversinMeters, ln, log10, logn, max, min,
  pow, sin, sinh, sqrt, tan, tanh;
- variables are ``ID ('.' ID | '[int]' | "['str']")*``
  (VariableContext.java): dotted members map to nested struct fields,
  indexes to getItem.

Divergences, documented: haversin uses the exact great-circle formula
(mean radius 6371.0087714 km) rather than SloppyMath's table-driven
approximation, and shift amounts must fold to constants (Spark's
shiftleft/shiftright take literal bit counts; non-constant shifts are
a compile error here instead of a JVM bytecode).

Compile once on the driver (the input is one expression string); the
resulting Column is pure Catalyst — whole-stage-codegen'd JVM
arithmetic, no Python in the row loop.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


class ExpressionError(ValueError):
    """Parse or compile failure (ParseException analog)."""


_EARTH_MEAN_RADIUS_KM = 6371.0087714

_TOKEN_RX = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<hex>0[xX][0-9a-fA-F]+)
  | (?P<octal>0[0-7]+)
  | (?P<num>(?:0|[1-9][0-9]*)(?:\.[0-9]*)?(?:[eE][+-]?[0-9]+)?|\.[0-9]+)
  | (?P<var>[_$a-zA-Z][_$a-zA-Z0-9]*
      (?:\[(?:'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*"|[0-9]+)\])*
      (?:\.[_$a-zA-Z][_$a-zA-Z0-9]*
      (?:\[(?:'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*"|[0-9]+)\])*)*)
  | (?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[-+*/%()!~<>&^|?:,])
    """,
    re.VERBOSE,
)


def _lex(src: str) -> list[str]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RX.match(src, pos)
        if m is None:
            raise ExpressionError(f"unexpected character at: {src[pos:]!r}")
        pos = m.end()
        if m.lastgroup != "ws":
            out.append((m.lastgroup, m.group()))
    out.append(("eof", ""))
    return out


# ---- AST -------------------------------------------------------------------


@dataclass(frozen=True)
class _Num:
    value: float


@dataclass(frozen=True)
class _Var:
    path: str  # raw variable text, e.g. "doc.field[0]"


@dataclass(frozen=True)
class _Call:
    name: str
    args: tuple


@dataclass(frozen=True)
class _Unary:
    op: str
    sub: object


@dataclass(frozen=True)
class _Bin:
    op: str
    left: object
    right: object


@dataclass(frozen=True)
class _Cond:
    cond: object
    then: object
    other: object


_ARITY = {
    "abs": 1, "acos": 1, "acosh": 1, "asin": 1, "asinh": 1, "atan": 1,
    "atan2": 2, "atanh": 1, "ceil": 1, "cos": 1, "cosh": 1, "exp": 1,
    "floor": 1, "haversin": 4, "haversinMeters": 4, "ln": 1, "log10": 1,
    "logn": 2, "max": 2, "min": 2, "pow": 2, "sin": 1, "sinh": 1,
    "sqrt": 1, "tan": 1, "tanh": 1,
}

# precedence ladder, loosest binding first (Javascript.g4 rule order,
# tightest rules listed first there)
_LEVELS = [
    ("||",),
    ("&&",),
    ("|",),
    ("^",),
    ("&",),
    ("==", "!="),
    ("<", "<=", ">", ">="),
    ("<<", ">>", ">>>"),
    ("+", "-"),
    ("*", "/", "%"),
]


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text):
        k, v = self.next()
        if v != text:
            raise ExpressionError(f"expected {text!r}, got {v!r}")

    def parse(self):
        e = self.expression()
        if self.peek()[0] != "eof":
            raise ExpressionError(f"trailing input: {self.peek()[1]!r}")
        return e

    def expression(self):
        # ternary is the loosest, right-associative
        cond = self.binary(0)
        if self.peek()[1] == "?":
            self.next()
            then = self.expression()
            self.expect(":")
            other = self.expression()
            return _Cond(cond, then, other)
        return cond

    def binary(self, level):
        if level == len(_LEVELS):
            return self.unary()
        ops = _LEVELS[level]
        left = self.binary(level + 1)
        while self.peek()[0] == "op" and self.peek()[1] in ops:
            op = self.next()[1]
            right = self.binary(level + 1)
            left = _Bin(op, left, right)
        return left

    def unary(self):
        k, v = self.peek()
        if k == "op" and v in ("!", "~", "-", "+"):
            self.next()
            return _Unary(v, self.unary())
        return self.primary()

    def primary(self):
        k, v = self.next()
        if v == "(":
            e = self.expression()
            self.expect(")")
            return e
        if k == "num":
            return _Num(float(v))
        if k == "hex":
            return _Num(float(int(v, 16)))
        if k == "octal":
            return _Num(float(int(v, 8)))
        if k == "var":
            if self.peek()[1] == "(":
                self.next()
                args = []
                if self.peek()[1] != ")":
                    args.append(self.expression())
                    while self.peek()[1] == ",":
                        self.next()
                        args.append(self.expression())
                self.expect(")")
                if v not in _ARITY:
                    raise ExpressionError(f"unknown function {v!r}")
                if len(args) != _ARITY[v]:
                    raise ExpressionError(
                        f"{v} expects {_ARITY[v]} arguments, got {len(args)}"
                    )
                return _Call(v, tuple(args))
            return _Var(v)
        raise ExpressionError(f"unexpected token {v!r}")


# ---- lowering to a Spark Column ---------------------------------------------


def _const(node) -> float | None:
    """Constant-fold the shift-amount subtree (the grammar allows any
    expression there; the Spark builtins need a literal bit count)."""
    if isinstance(node, _Num):
        return node.value
    if isinstance(node, _Unary) and node.op in ("-", "+"):
        v = _const(node.sub)
        return None if v is None else (-v if node.op == "-" else v)
    if isinstance(node, _Bin):
        a, b = _const(node.left), _const(node.right)
        if a is None or b is None:
            return None
        return {
            "+": a + b, "-": a - b, "*": a * b,
            "/": (a / b if b else math.nan), "%": (math.fmod(a, b) if b else math.nan),
        }.get(node.op)
    return None


def _bool(c: Column) -> Column:
    return c != F.lit(0.0)


def _as_double(c: Column) -> Column:
    return c.cast("double")


def _haversin(radius_km: float, args) -> Column:
    lat1, lon1, lat2, lon2 = (F.radians(a) for a in args)
    h = (
        F.pow(F.sin((lat2 - lat1) / 2), 2)
        + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin((lon2 - lon1) / 2), 2)
    )
    return F.lit(2.0 * radius_km) * F.asin(F.sqrt(h))


def _fn(name: str, args: list[Column]) -> Column:
    simple = {
        "abs": F.abs, "acos": F.acos, "acosh": F.acosh, "asin": F.asin,
        "asinh": F.asinh, "atan": F.atan, "atanh": F.atanh, "ceil": F.ceil,
        "cos": F.cos, "cosh": F.cosh, "exp": F.exp, "floor": F.floor,
        "ln": F.log, "log10": F.log10, "sin": F.sin, "sinh": F.sinh,
        "sqrt": F.sqrt, "tan": F.tan, "tanh": F.tanh,
    }
    if name in simple:
        return _as_double(simple[name](args[0]))
    if name == "atan2":
        return F.atan2(args[0], args[1])
    if name == "pow":
        return F.pow(args[0], args[1])
    if name == "min":
        return F.least(args[0], args[1])
    if name == "max":
        return F.greatest(args[0], args[1])
    if name == "logn":
        # MathUtil.log(base, x) = ln(x) / ln(base)
        return F.log(args[1]) / F.log(args[0])
    if name == "haversin":
        return _haversin(_EARTH_MEAN_RADIUS_KM, args)
    if name == "haversinMeters":
        return _haversin(_EARTH_MEAN_RADIUS_KM * 1000.0, args)
    raise ExpressionError(f"unknown function {name!r}")


_INDEX_RX = re.compile(r"\[('(?:\\.|[^'\\])*'|\"(?:\\.|[^\"\\])*\"|[0-9]+)\]")


def _var_column(path: str, bind) -> Column:
    """Lower ``a.b[0]['k']`` to nested getField/getItem accesses
    (VariableContext.java MEMBER / INT_INDEX / STR_INDEX pieces)."""
    # split the leading identifier, then alternate members and indexes
    m = re.match(r"[_$a-zA-Z][_$a-zA-Z0-9]*", path)
    col = bind(m.group())
    rest = path[m.end():]
    while rest:
        if rest[0] == ".":
            mm = re.match(r"\.([_$a-zA-Z][_$a-zA-Z0-9]*)", rest)
            col = col.getField(mm.group(1))
            rest = rest[mm.end():]
        else:
            mm = _INDEX_RX.match(rest)
            raw = mm.group(1)
            if raw[0] in "'\"":
                key = raw[1:-1].replace("\\'", "'").replace('\\"', '"')
                key = key.replace("\\\\", "\\")
                col = col.getItem(key)
            else:
                col = col.getItem(int(raw))
            rest = rest[mm.end():]
    return _as_double(col)


def _lower(node, bind) -> Column:
    if isinstance(node, _Num):
        return F.lit(float(node.value))
    if isinstance(node, _Var):
        return _var_column(node.path, bind)
    if isinstance(node, _Call):
        return _fn(node.name, [_lower(a, bind) for a in node.args])
    if isinstance(node, _Unary):
        if node.op == "-":
            return -_lower(node.sub, bind)
        if node.op == "+":
            return _lower(node.sub, bind)
        if node.op == "!":
            return F.when(_bool(_lower(node.sub, bind)), 0.0).otherwise(1.0)
        # ~ : D2J, bitwise not, J2D
        return _as_double(
            F.bitwise_not(_lower(node.sub, bind).cast("long"))
        )
    if isinstance(node, _Cond):
        return F.when(
            _bool(_lower(node.cond, bind)), _lower(node.then, bind)
        ).otherwise(_lower(node.other, bind))
    if isinstance(node, _Bin):
        op = node.op
        if op in ("<<", ">>", ">>>"):
            amt = _const(node.right)
            if amt is None:
                raise ExpressionError(
                    "shift amounts must be constant expressions"
                )
            l = _lower(node.left, bind).cast("long")
            shifted = {
                "<<": F.shiftleft, ">>": F.shiftright,
                ">>>": F.shiftrightunsigned,
            }[op](l, int(amt) & 63)
            return _as_double(shifted)
        a = _lower(node.left, bind)
        b = _lower(node.right, bind)
        if op in ("+", "-", "*", "/", "%"):
            return {
                "+": a + b, "-": a - b, "*": a * b, "/": a / b, "%": a % b
            }[op]
        if op in ("&", "|", "^"):
            al, bl = a.cast("long"), b.cast("long")
            out = {
                "&": al.bitwiseAND(bl),
                "|": al.bitwiseOR(bl),
                "^": al.bitwiseXOR(bl),
            }[op]
            return _as_double(out)
        if op in ("<", "<=", ">", ">=", "==", "!="):
            cond = {
                "<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b,
                "==": a == b, "!=": a != b,
            }[op]
            return F.when(cond, 1.0).otherwise(0.0)
        if op == "&&":
            return F.when(_bool(a) & _bool(b), 1.0).otherwise(0.0)
        if op == "||":
            return F.when(_bool(a) | _bool(b), 1.0).otherwise(0.0)
    raise ExpressionError(f"cannot lower {node!r}")


class Expression:
    """Compiled expression: ``variables`` is the free-variable root
    set (Bindings keys); ``column(bind)`` produces the Spark Column,
    with ``bind`` mapping a root name to a Column (default F.col)."""

    def __init__(self, source: str, ast):
        self.source = source
        self._ast = ast
        self.variables = tuple(sorted(self._roots(ast)))

    @staticmethod
    def _roots(node, acc=None):
        acc = set() if acc is None else acc
        if isinstance(node, _Var):
            acc.add(re.match(r"[_$a-zA-Z][_$a-zA-Z0-9]*", node.path).group())
        elif isinstance(node, _Call):
            for a in node.args:
                Expression._roots(a, acc)
        elif isinstance(node, _Unary):
            Expression._roots(node.sub, acc)
        elif isinstance(node, _Bin):
            Expression._roots(node.left, acc)
            Expression._roots(node.right, acc)
        elif isinstance(node, _Cond):
            for a in (node.cond, node.then, node.other):
                Expression._roots(a, acc)
        return acc

    def column(self, bind: Callable[[str], Column] | None = None) -> Column:
        return _as_double(_lower(self._ast, bind or F.col))

    def __repr__(self):
        return f"Expression({self.source!r})"


def _validate(node):
    """Fail fast at compile time (JavascriptCompiler raises on compile,
    not first use): reject non-constant shift amounts."""
    if isinstance(node, _Bin):
        if node.op in ("<<", ">>", ">>>") and _const(node.right) is None:
            raise ExpressionError("shift amounts must be constant expressions")
        _validate(node.left)
        _validate(node.right)
    elif isinstance(node, _Unary):
        _validate(node.sub)
    elif isinstance(node, _Call):
        for a in node.args:
            _validate(a)
    elif isinstance(node, _Cond):
        _validate(node.cond)
        _validate(node.then)
        _validate(node.other)


def compile_expression(source: str) -> Expression:
    """JavascriptCompiler.compile analog: source -> Expression."""
    ast = _Parser(_lex(source)).parse()
    _validate(ast)
    return Expression(source, ast)


class SimpleBindings:
    """expressions/SimpleBindings.java: map free variable names to
    value sources — here a Spark Column, a column name, or ANOTHER
    compiled Expression (expressions referencing expressions resolve
    recursively). ``validate()`` walks the binding graph rejecting
    cycles and dangling references exactly like the reference
    (SimpleBindings.java:81-112: 'Recursion error: Cycle detected' /
    'Invalid reference'); unresolved names also raise at ``resolve``
    time, matching getDoubleValuesSource. Use with
    ``Expression.column(bindings.resolve)``."""

    def __init__(self):
        self._map: dict[str, object] = {}

    def add(self, name: str, target) -> None:
        """target: a Column, a column-name string, or an Expression."""
        self._map[name] = target

    def resolve(self, name: str, _seen: tuple = ()) -> Column:
        if name in _seen:
            raise ValueError(
                f"Recursion error: Cycle detected {list(_seen)}->{name}"
            )
        if name not in self._map:
            raise ValueError(f"Invalid reference '{name}'")
        t = self._map[name]
        if isinstance(t, Expression):
            return t.column(
                lambda n, s=_seen + (name,): self.resolve(n, s)
            )
        if isinstance(t, str):
            return F.col(t)
        return t  # a ready Column

    def validate(self) -> None:
        for name in self._map:
            self.resolve(name)
