"""Safe transformer-expression compiler (the vault's execution engine).

The reference applies its transformer vault by ``eval``-ing numpy
expression strings per batch (ranking_transformers.py:177) — unsafe
for user-supplied JSON vaults and unusable as a Spark plan.  Here the
same expression language is *parsed once* into a validated AST
(whitelist grammar: X, numbers, arithmetic, comparisons, np.<fn> calls)
and compiled to either backend:

* ``to_numpy``  — a compiled callable ``f(X: ndarray) -> ndarray``
  with batch-local semantics, bit-compatible with the reference's
  eval (used inside scoring batches, preserving batch-local stats);
* ``to_spark``  — a ``pyspark.sql.Column`` expression tree that stays
  inside WholeStageCodegen.  Batch-stat calls (np.max(X), np.mean …)
  become *global* aggregate slots the caller precomputes in one pass
  and passes in — a deliberate, documented semantic upgrade
  (SURVEY.md §2.3: batch-local stats -> global aggregates).

Order-dependent ops (cumsum, diff, sort, argsort, reverse,
searchsorted) are rejected by the Spark backend — row order is not a
well-defined concept for a distributed column — and allowed in the
numpy backend only.
"""
from __future__ import annotations

import ast
from dataclasses import dataclass, field

import numpy as np

__all__ = ["ParsedExpr", "parse_expr", "ExprError", "STAT_FUNCS"]


class ExprError(ValueError):
    pass


_ALLOWED_BINOPS = {
    ast.Add: "+", ast.Sub: "-", ast.Mult: "*", ast.Div: "/", ast.Pow: "**",
    ast.Mod: "%",
}
_ALLOWED_CMPOPS = {
    ast.Gt: ">", ast.Lt: "<", ast.GtE: ">=", ast.LtE: "<=",
    ast.Eq: "==", ast.NotEq: "!=",
}

# np functions with a direct elementwise Spark mapping
_ELEMENTWISE = {
    "sqrt", "log", "log1p", "log2", "log10", "abs", "exp", "expm1",
    "exp2", "sin", "cos", "tan", "arcsin", "arccos", "arctan", "sinh",
    "cosh", "tanh", "arcsinh", "arccosh", "arctanh", "sign", "cbrt",
    "square", "power", "round", "clip", "where", "divide", "reciprocal",
    "isnan", "isinf", "isfinite", "greater", "less", "equal", "maximum",
    "minimum", "sinc", "polyval", "nan_to_num", "floor", "ceil",
    "logical_not", "searchsorted",
}
STAT_FUNCS = {
    "mean", "median", "std", "var", "min", "max", "percentile",
    # nan-variants: aggregate ignoring NaN (numpy semantics); the
    # Spark slot computation null-masks NaN before aggregating
    "nanmean", "nanmedian", "nanstd", "nanvar", "nanmax", "nanmin",
}
_ORDER_DEPENDENT = {"cumsum", "cumprod", "diff", "sort", "argsort"}

_ALLOWED_FUNCS = _ELEMENTWISE | STAT_FUNCS | _ORDER_DEPENDENT | {
    "zeros_like", "ones_like",
}


@dataclass
class ParsedExpr:
    """A validated transformer expression."""

    source: str
    tree: ast.Expression
    stat_slots: list[tuple[str, str]] = field(default_factory=list)
    # the actual ast.Call nodes, parallel to stat_slots — lets callers
    # translate a stat's INNER expression (np.median(np.square(X)))
    # instead of assuming the stat is over raw X
    stat_nodes: list = field(default_factory=list)
    order_dependent: bool = False

    # -- numpy backend ------------------------------------------------
    def to_numpy(self):
        code = compile(self.tree, "<vault>", "eval")

        def fn(X: np.ndarray) -> np.ndarray:
            with np.errstate(all="ignore"):
                out = eval(code, {"np": np, "len": len,
                                  "__builtins__": {}}, {"X": X})
            return np.broadcast_to(np.asarray(out), X.shape).copy() \
                if np.ndim(out) == 0 else np.asarray(out)

        return fn

    # -- Spark backend ------------------------------------------------
    def to_spark(self, x_col, stats: dict[str, float] | None = None):
        """Translate to a Column; ``x_col`` is the input Column,
        ``stats`` maps stat-slot keys (repr of the call) to scalars."""
        if self.order_dependent:
            raise ExprError(
                f"{self.source!r} is order-dependent; no distributed "
                "column semantics (numpy batch backend only)",
            )
        return _SparkTranslator(x_col, stats or {}).visit(self.tree.body)


def parse_expr(source: str) -> ParsedExpr:
    try:
        tree = ast.parse(source, mode="eval")
    except SyntaxError as exc:
        raise ExprError(f"unparseable expression {source!r}: {exc}") from exc
    v = _Validator()
    v.visit(tree.body)
    return ParsedExpr(
        source=source, tree=tree,
        stat_slots=v.stat_slots, stat_nodes=v.stat_nodes,
        order_dependent=v.order_dependent,
    )


class _Validator(ast.NodeVisitor):
    def __init__(self):
        self.stat_slots: list[tuple[str, str]] = []
        self.stat_nodes: list = []
        self.order_dependent = False

    def generic_visit(self, node):
        raise ExprError(f"disallowed syntax: {type(node).__name__}")

    def visit_Expression(self, node):
        self.visit(node.body)

    def visit_Constant(self, node):
        if not isinstance(node.value, (int, float)):
            raise ExprError(f"only numeric constants allowed, got {node.value!r}")

    def visit_Name(self, node):
        if node.id not in ("X", "len"):
            raise ExprError(f"unknown name {node.id!r}")

    def visit_Attribute(self, node):
        # bare np.<const> (not a call): numeric constants only
        if not (isinstance(node.value, ast.Name) and node.value.id == "np"
                and node.attr in ("e", "pi", "nan", "inf", "euler_gamma")):
            raise ExprError(f"attribute {ast.unparse(node)!r} not allowed")

    def visit_List(self, node):
        for el in node.elts:
            self.visit(el)

    def visit_Tuple(self, node):
        for el in node.elts:
            self.visit(el)

    def visit_BinOp(self, node):
        if type(node.op) not in _ALLOWED_BINOPS:
            raise ExprError(f"operator {type(node.op).__name__} not allowed")
        self.visit(node.left)
        self.visit(node.right)

    def visit_UnaryOp(self, node):
        if not isinstance(node.op, (ast.USub, ast.UAdd, ast.Invert)):
            raise ExprError("unary operator not allowed")
        self.visit(node.operand)

    def visit_Compare(self, node):
        if len(node.ops) != 1 or type(node.ops[0]) not in _ALLOWED_CMPOPS:
            raise ExprError("only single binary comparisons allowed")
        self.visit(node.left)
        self.visit(node.comparators[0])

    def visit_Subscript(self, node):
        # only X[::-1] (reverse) — order-dependent
        self.order_dependent = True
        self.visit(node.value)

    def visit_Slice(self, node):
        pass

    def visit_Call(self, node):
        if isinstance(node.func, ast.Name) and node.func.id == "len":
            for a in node.args:
                self.visit(a)
            return
        if not (
            isinstance(node.func, ast.Attribute)
            and isinstance(node.func.value, ast.Name)
            and node.func.value.id == "np"
        ):
            raise ExprError("only np.<fn>(...) calls allowed")
        fname = node.func.attr
        if fname not in _ALLOWED_FUNCS:
            raise ExprError(f"np.{fname} not in the whitelist")
        if fname in _ORDER_DEPENDENT or fname == "searchsorted":
            self.order_dependent = True
        if fname in STAT_FUNCS:
            self.stat_slots.append((fname, ast.unparse(node)))
            self.stat_nodes.append(node)
        for a in node.args:
            self.visit(a)
        for kw in node.keywords:
            if kw.arg not in ("out", "where", "prepend", "side", "nan"):
                raise ExprError(f"keyword {kw.arg!r} not allowed")
            if kw.arg == "side" and isinstance(kw.value, ast.Constant) \
                    and isinstance(kw.value.value, str):
                continue  # searchsorted side label (numpy backend only)
            self.visit(kw.value)


class _SparkTranslator:
    """Validated-AST -> pyspark Column."""

    def __init__(self, x_col, stats: dict[str, float]):
        from pyspark.sql import functions as F

        self.F = F
        self.x = x_col
        self.stats = stats

    def visit(self, node):
        meth = getattr(self, f"t_{type(node).__name__}", None)
        if meth is None:
            raise ExprError(f"spark backend: {type(node).__name__}")
        return meth(node)

    def t_Constant(self, node):
        return self.F.lit(float(node.value))

    def t_Name(self, node):
        return self.x

    def t_Attribute(self, node):
        return self.F.lit(float(getattr(np, node.attr)))

    def _np_div(self, num, den):
        """IEEE-754 float division (numpy semantics): x/0 -> +-inf,
        0/0 -> NaN.  Spark 4 ANSI mode raises DIVIDE_BY_ZERO even for
        doubles, so guard with a lazy CASE (branches don't evaluate
        unless selected in codegen)."""
        F = self.F
        inf, nan = float("inf"), float("nan")
        # null guard FIRST: with a null denominator `den != 0` is null
        # (not false), so without this the `num > 0` branch would map
        # non-null/null to +-inf where numpy-over-coerced-nulls yields
        # missing; null propagates as null, like every other operator
        return (
            F.when(den.isNull() | num.isNull(),
                   F.lit(None).cast("double"))
            .when(den != 0, num / den)
            .when(num > 0, F.lit(inf))
            .when(num < 0, F.lit(-inf))
            .otherwise(F.lit(nan))
        )

    def t_BinOp(self, node):
        left, right = self.visit(node.left), self.visit(node.right)
        op = type(node.op)
        if op is ast.Add:
            return left + right
        if op is ast.Sub:
            return left - right
        if op is ast.Mult:
            return left * right
        if op is ast.Div:
            return self._np_div(left, right)
        if op is ast.Pow:
            return self.F.pow(left, right)
        if op is ast.Mod:
            return left % right
        raise ExprError("binop")

    def t_UnaryOp(self, node):
        v = self.visit(node.operand)
        if isinstance(node.op, ast.USub):
            return -v
        return v

    def t_Compare(self, node):
        left = self.visit(node.left)
        right = self.visit(node.comparators[0])
        op = type(node.ops[0])
        return {
            ast.Gt: left > right, ast.Lt: left < right,
            ast.GtE: left >= right, ast.LtE: left <= right,
            ast.Eq: left == right, ast.NotEq: left != right,
        }[op]

    def _as_condition(self, node):
        """Translate a node in BOOLEAN context (np.where condition).

        numpy predicates (isnan, greater, ...) double as masks and as
        0/1 numerics; the value translation numericizes them, so the
        condition path re-derives the raw boolean instead."""
        F = self.F
        if isinstance(node, ast.Compare):
            return self.visit(node)
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)):
            name = node.func.attr
            if name == "isnan":
                return F.isnan(self.visit(node.args[0]))
            if name == "isinf":
                v = self.visit(node.args[0])
                return F.abs(v) == F.lit(float("inf"))
            if name == "isfinite":
                v = self.visit(node.args[0])
                return ~(F.isnan(v) | (F.abs(v) == F.lit(float("inf"))))
            if name == "greater":
                return self.visit(node.args[0]) > self.visit(node.args[1])
            if name == "less":
                return self.visit(node.args[0]) < self.visit(node.args[1])
            if name == "equal":
                return self.visit(node.args[0]) == self.visit(node.args[1])
            if name == "logical_not":
                return ~self._as_condition(node.args[0])
        # numpy truthiness: nonzero is true
        return self.visit(node) != self.F.lit(0.0)

    def t_Call(self, node):
        F = self.F
        name = node.func.attr
        key = ast.unparse(node)
        if name in STAT_FUNCS:
            if key not in self.stats:
                raise ExprError(f"missing stat slot {key!r}")
            return F.lit(float(self.stats[key]))
        args = node.args

        def bool2num(c):
            return F.when(c, F.lit(1.0)).otherwise(F.lit(0.0))

        if name == "where":
            cond = self._as_condition(args[0])
            return F.when(cond, self.visit(args[1])).otherwise(self.visit(args[2]))
        if name == "divide":
            num, den = self.visit(args[0]), self.visit(args[1])
            guarded = any(kw.arg == "where" for kw in node.keywords)
            if guarded:
                cond = self.visit(
                    next(kw.value for kw in node.keywords if kw.arg == "where"),
                )
                return F.when(cond, self._np_div(num, den)) \
                    .otherwise(F.lit(0.0))
            return self._np_div(num, den)
        if name == "reciprocal":
            v = self.visit(args[0])
            guarded = any(kw.arg == "where" for kw in node.keywords)
            if guarded:
                cond = self.visit(
                    next(kw.value for kw in node.keywords if kw.arg == "where"),
                )
                return F.when(cond, self._np_div(F.lit(1.0), v)) \
                    .otherwise(F.lit(0.0))
            return self._np_div(F.lit(1.0), v)
        if name == "clip":
            v = self.visit(args[0])
            lo, hi = self.visit(args[1]), self.visit(args[2])
            return F.least(F.greatest(v, lo), hi)
        if name == "round":
            v = self.visit(args[0])
            scale = int(args[1].value) if len(args) > 1 else 0
            # numpy rounds half-to-even; Spark round() is half-up.
            # bround matches numpy's banker's rounding.
            return F.bround(v, scale)
        if name == "power":
            return self.F.pow(self.visit(args[0]), self.visit(args[1]))
        if name == "square":
            v = self.visit(args[0])
            return v * v
        if name == "polyval":
            coeffs = [float(c.value) for c in args[0].elts]
            v = self.visit(args[1])
            acc = F.lit(float(coeffs[0]))
            for c in coeffs[1:]:
                acc = acc * v + F.lit(float(c))
            return acc
        if name == "sinc":
            v = self.visit(args[0])
            pix = F.lit(float(np.pi)) * v
            return F.when(v == 0, F.lit(1.0)) \
                .otherwise(self._np_div(F.sin(pix), pix))
        if name in ("maximum", "minimum"):
            a, b = self.visit(args[0]), self.visit(args[1])
            return F.greatest(a, b) if name == "maximum" else F.least(a, b)
        if name in ("greater", "less", "equal"):
            a, b = self.visit(args[0]), self.visit(args[1])
            return bool2num(
                {"greater": a > b, "less": a < b, "equal": a == b}[name],
            )
        if name in ("isnan", "isinf", "isfinite"):
            v = self.visit(args[0])
            if name == "isnan":
                return bool2num(F.isnan(v))
            if name == "isinf":
                return bool2num(F.abs(v) == F.lit(float("inf")))
            return bool2num(
                ~(F.isnan(v) | (F.abs(v) == F.lit(float("inf")))),
            )
        if name == "sign":
            return F.signum(self.visit(args[0]))
        if name == "abs":
            return F.abs(self.visit(args[0]))
        if name == "arcsin":
            return F.asin(self.visit(args[0]))
        if name == "arccos":
            return F.acos(self.visit(args[0]))
        if name == "arctan":
            return F.atan(self.visit(args[0]))
        if name == "arcsinh":
            v = self.visit(args[0])
            return F.log(v + F.sqrt(v * v + 1))
        if name == "arccosh":
            v = self.visit(args[0])
            return F.log(v + F.sqrt(v * v - 1))
        if name == "arctanh":
            v = self.visit(args[0])
            return F.lit(0.5) * F.log(self._np_div(1 + v, 1 - v))
        if name == "exp2":
            return F.pow(F.lit(2.0), self.visit(args[0]))
        if name == "expm1":
            return F.expm1(self.visit(args[0]))
        if name == "log1p":
            return F.log1p(self.visit(args[0]))
        if name == "cbrt":
            return F.cbrt(self.visit(args[0]))
        if name == "nan_to_num":
            v = self.visit(args[0])
            fill = F.lit(0.0)
            for kw in node.keywords:
                if kw.arg == "nan":
                    fill = self.visit(kw.value)
            return F.when(F.isnan(v), fill).otherwise(v)
        simple = {
            "sqrt": F.sqrt, "log": F.log, "log2": F.log2, "log10": F.log10,
            "exp": F.exp, "sin": F.sin, "cos": F.cos, "tan": F.tan,
            "sinh": F.sinh, "cosh": F.cosh, "tanh": F.tanh,
            "floor": F.floor, "ceil": F.ceil,
        }
        if name in simple:
            return simple[name](self.visit(args[0]))
        raise ExprError(f"spark backend: np.{name} unsupported")
