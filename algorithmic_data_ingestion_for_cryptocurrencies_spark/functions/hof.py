"""Higher-order-function helpers.

Catalyst evaluates a lambda body once PER ELEMENT, and any non-trivial
expression captured from the enclosing scope (a tokenize = regex
normalize + split, for example) is embedded in that body as a full
expression tree — so ``transform(sequence(1, n), i -> f(element_at(
big_expr, i)))`` re-runs ``big_expr`` n times per row: O(n²) work for
what reads as a linear pipeline. (Lambda *variables* are cheap bound
references; it is only captured expression TREES that re-evaluate.)

:func:`bind_array` hoists the expression: evaluate it once, then hand
it to the body as an element variable of a single-element outer
``transform``. Measured on 3-gram shingling over 150k documents:
18.3 s → 2.7 s for the identical output (r6).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, functions as F


def bind_array(arr: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``arr`` ONCE per row and bind it as a lambda variable
    for ``body`` (which may reference it any number of times — per
    element, per bucket, per window — at zero re-evaluation cost)."""
    return F.element_at(F.transform(F.array(arr), body), 1)


def materialize_once(df, col: Column, alias: str):
    """Project ``col`` through a Generate barrier so it is computed
    exactly ONCE per row no matter how many downstream expressions
    reference it.

    ``bind_array`` shares work *within* one expression tree; it cannot
    share the tree *across* consumers: ``withColumn`` aliases are
    re-inlined into every reference by CollapseProject, and a
    struct-typed result is worse — SimplifyExtractValueOps rewrites
    each field access into a fresh copy of the producing tree. A
    3-column stats struct consumed by a filter therefore evaluates its
    HOF pipeline ~5x per row (measured: the chunk-prep repetition gate
    at the 1.5M-doc tier ran 14.8 s duplicated vs 6.5 s behind this
    barrier, row-identical). ``explode(array(col))`` introduces a
    Generate node the optimizer cannot collapse through; the
    single-element array yields exactly one output row per input row
    (a NULL value still produces its row), so this is a pure
    projection barrier — narrow, no shuffle, codegen-compatible."""
    return df.select("*", F.explode(F.array(col)).alias(alias))
