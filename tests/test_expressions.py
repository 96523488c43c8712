"""JavaScript expression compiler (expressions module): compiled Spark
Columns vs a pure-Python replay of JavascriptCompiler's double/long
bytecode semantics on deterministic rows."""

import math

import pandas as pd
import pytest

from lucene_spark.search.expressions import (
    ExpressionError,
    compile_expression,
)


def _j(x):  # Java (long) cast of a double: truncate toward zero
    return int(x)


def _ref_eval(expr, a, b, c):
    """Hand-evaluated expected values per expression key."""
    return {
        "a + b * c": a + b * c,
        "(a + b) * c": (a + b) * c,
        "a - b - c": a - b - c,
        "a / b % c": math.fmod(a / b, c),
        "-a + +b": -a + b,
        "a < b": 1.0 if a < b else 0.0,
        "a >= c == b > 0": 1.0 if (1.0 if a >= c else 0.0) == (1.0 if b > 0 else 0.0) else 0.0,
        "a != b && c > 1": 1.0 if (a != b) and (c > 1) else 0.0,
        "a == a || c < 0": 1.0,
        "!(a > b)": 0.0 if a > b else 1.0,
        "a > b ? a : b": a if a > b else b,
        "a > b ? a : b > c ? b : c": a if a > b else (b if b > c else c),
        "min(a, b) + max(b, c)": min(a, b) + max(b, c),
        "sqrt(abs(a)) + ln(c)": math.sqrt(abs(a)) + math.log(c),
        "pow(b, 2) - log10(c)": b * b - math.log10(c),
        "logn(2, c)": math.log(c) / math.log(2),
        "atan2(a, b) + cosh(1)": math.atan2(a, b) + math.cosh(1),
        "floor(a) + ceil(b) * exp(0)": math.floor(a) + math.ceil(b),
        "a & b": float(_j(a) & _j(b)),
        "a | b ^ c": float(_j(a) | (_j(b) ^ _j(c))),
        "~a": float(~_j(a)),
        "a << 2": float(_j(a) << 2),
        "a >> 1": float(_j(a) >> 1),
        "a >>> 1": float((_j(a) & 0xFFFFFFFFFFFFFFFF) >> 1),
        "0x1F + 010": 31.0 + 8.0,
        "1.5e2 + .25": 150.25,
        "a > 2 & b > 1": float((1 if a > 2 else 0) & (1 if b > 1 else 0)),
    }[expr]


ROWS = [(3.7, 2.0, 4.0), (1.0, 5.5, 2.0), (-2.5, 3.0, 8.0)]


@pytest.mark.parametrize("expr", [
    "a + b * c", "(a + b) * c", "a - b - c", "a / b % c", "-a + +b",
    "a < b", "a >= c == b > 0", "a != b && c > 1", "a == a || c < 0",
    "!(a > b)", "a > b ? a : b", "a > b ? a : b > c ? b : c",
    "min(a, b) + max(b, c)", "sqrt(abs(a)) + ln(c)",
    "pow(b, 2) - log10(c)", "logn(2, c)", "atan2(a, b) + cosh(1)",
    "floor(a) + ceil(b) * exp(0)", "a & b", "a | b ^ c", "~a",
    "a << 2", "a >> 1", "a >>> 1", "0x1F + 010", "1.5e2 + .25",
    "a > 2 & b > 1",
])
def test_expression_matches_java_semantics(spark, expr):
    e = compile_expression(expr)
    df = spark.createDataFrame(
        pd.DataFrame(ROWS, columns=["a", "b", "c"])
    )
    got = [r[0] for r in df.select(e.column()).collect()]
    want = [_ref_eval(expr, *row) for row in ROWS]
    assert got == pytest.approx(want, rel=1e-12), expr


def test_variables_reported():
    e = compile_expression("sqrt(popularity) + _score * doc.boost[0]")
    assert e.variables == ("_score", "doc", "popularity")


def test_struct_and_index_paths(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc": [{"boost": [2.0, 3.0], "w": {"k1": 7.0}}]})
    )
    e = compile_expression("doc.boost[1] + doc.w['k1']")
    assert [r[0] for r in df.select(e.column()).collect()] == [10.0]


def test_haversin_kilometers(spark):
    # Paris -> Berlin great-circle ~878 km
    e = compile_expression("haversin(48.8566, 2.3522, 52.52, 13.405)")
    df = spark.range(1)
    got = df.select(e.column()).collect()[0][0]
    assert got == pytest.approx(877.46, abs=1.0)
    m = compile_expression("haversinMeters(48.8566, 2.3522, 52.52, 13.405)")
    assert df.select(m.column()).collect()[0][0] == pytest.approx(
        got * 1000.0, rel=1e-9
    )


def test_score_binding(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pd.DataFrame({"s": [2.0, 8.0]}))
    e = compile_expression("ln(_score) / 2")
    col = e.column(lambda n: F.col("s") if n == "_score" else F.col(n))
    got = [r[0] for r in df.select(col).collect()]
    assert got == pytest.approx([math.log(2.0) / 2, math.log(8.0) / 2])


@pytest.mark.parametrize("bad", [
    "a +",                       # dangling operator
    "nosuchfn(a)",               # unknown function
    "min(a)",                    # wrong arity
    "a ? b",                     # ternary missing colon
    "a << b",                    # non-constant shift amount
    "a $ b",                     # bad token
    "(a",                        # unbalanced paren
    "a b",                       # trailing input
])
def test_parse_errors(bad):
    with pytest.raises(ExpressionError):
        compile_expression(bad)


def test_constant_shift_folding(spark):
    e = compile_expression("a << (1 + 2)")
    df = spark.createDataFrame(pd.DataFrame({"a": [3.0]}))
    assert df.select(e.column()).collect()[0][0] == 24.0


def test_simple_bindings_expression_composition(spark):
    from lucene_spark.search.expressions import SimpleBindings, compile_expression

    b = SimpleBindings()
    b.add("popularity", "n")
    b.add("recency", compile_expression("sqrt(popularity) + 1"))
    e = compile_expression("recency * 2 + popularity")
    b.validate()
    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(pd.DataFrame({"n": [4.0, 9.0]}))
    got = [r[0] for r in df.select(e.column(b.resolve)).collect()]
    assert got == [(2 + 1) * 2 + 4, (3 + 1) * 2 + 9]


def test_simple_bindings_cycle_and_dangling(spark):
    import pytest as _pytest

    from lucene_spark.search.expressions import SimpleBindings, compile_expression

    b = SimpleBindings()
    b.add("a", compile_expression("b + 1"))
    b.add("b", compile_expression("a + 1"))
    with _pytest.raises(ValueError, match="Cycle detected"):
        b.validate()
    d = SimpleBindings()
    d.add("x", compile_expression("missing + 1"))
    with _pytest.raises(ValueError, match="Invalid reference 'missing'"):
        d.validate()
