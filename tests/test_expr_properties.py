"""Property-based tests (Hypothesis), mirroring the reference's proptest
suite (/root/reference/src/predicates.rs:1422-1475): membership truth
for random lists, negation involution for every operator, and full
forest agreement between the vectorized evaluator and the exact oracle
on generated expressions/events."""

from decimal import Decimal

import pandas as pd
from hypothesis import given, settings, strategies as st

from a_tree_spark.expr import (
    AttributeDefinition as A,
    AttributeTable,
    ForestBuilder,
    Op,
    evaluate_event,
    evaluate_leaf,
    make_predicate,
)
from a_tree_spark.expr.oracle import FALSE, TRUE, UNKNOWN
from a_tree_spark.expr.vector import BatchEvaluator

ATTRS = AttributeTable([
    A.integer("x"),
    A.integer_list("xs"),
    A.string("s"),
    A.string_list("ss"),
    A.boolean("b"),
    A.float("f"),
])

ints = st.integers(min_value=-50, max_value=50)
int_lists = st.lists(ints, min_size=1, max_size=12)
strs = st.sampled_from([f"v{i}" for i in range(30)])
str_lists = st.lists(strs, min_size=1, max_size=8)


# ---- membership truth (reference props 1-3) -------------------------


@settings(max_examples=200, deadline=None)
@given(haystack=int_lists, needle=ints)
def test_in_matches_python_membership(haystack, needle):
    predicate = make_predicate(ATTRS, "x", Op.IN, tuple(sorted(set(haystack))))
    assert evaluate_leaf(predicate, needle) == (TRUE if needle in haystack else FALSE)


@settings(max_examples=200, deadline=None)
@given(event=int_lists, literal=int_lists)
def test_one_of_matches_set_intersection(event, literal):
    predicate = make_predicate(ATTRS, "xs", Op.ONE_OF, tuple(sorted(set(literal))))
    expected = TRUE if set(event) & set(literal) else FALSE
    assert evaluate_leaf(predicate, sorted(set(event))) == expected


@settings(max_examples=200, deadline=None)
@given(literal=int_lists, data=st.data())
def test_all_of_true_for_any_subset(literal, data):
    subset = data.draw(st.lists(st.sampled_from(literal), max_size=len(literal)))
    predicate = make_predicate(ATTRS, "xs", Op.ALL_OF, tuple(sorted(set(literal))))
    assert evaluate_leaf(predicate, sorted(set(subset))) == TRUE


# ---- negation involution (reference predicates.rs:1161-1420) ---------

leaf_strategy = st.one_of(
    st.tuples(st.just("x"), st.sampled_from([Op.EQ, Op.NE, Op.LT, Op.LE, Op.GT, Op.GE]), ints),
    st.tuples(st.just("x"), st.sampled_from([Op.IN, Op.NOT_IN]),
              int_lists.map(lambda v: tuple(sorted(set(v))))),
    st.tuples(st.just("xs"), st.sampled_from([Op.ONE_OF, Op.NONE_OF, Op.ALL_OF]),
              int_lists.map(lambda v: tuple(sorted(set(v))))),
    st.tuples(st.just("x"), st.sampled_from([Op.IS_NULL, Op.IS_NOT_NULL]), st.none()),
    st.tuples(st.just("xs"), st.sampled_from([Op.IS_EMPTY, Op.IS_NOT_EMPTY]), st.none()),
    st.tuples(st.just("b"), st.sampled_from([Op.VAR, Op.NVAR]), st.none()),
)

value_strategy = st.one_of(st.none(), ints, int_lists, st.booleans())


@settings(max_examples=300, deadline=None)
@given(leaf=leaf_strategy, raw=value_strategy)
def test_negation_is_involutive_and_complementary(leaf, raw):
    name, op, operand = leaf
    predicate = make_predicate(ATTRS, name, op, operand)
    assert predicate.negate().negate() == predicate

    # shape the raw value to the attribute's kind
    if name == "x":
        value = raw if isinstance(raw, int) and not isinstance(raw, bool) else None
    elif name == "xs":
        value = sorted(set(raw)) if isinstance(raw, list) else None
    else:
        value = raw if isinstance(raw, bool) else None

    result = evaluate_leaf(predicate, value)
    negated = evaluate_leaf(predicate.negate(), value)
    if result == UNKNOWN:
        assert negated == UNKNOWN
    else:
        assert negated == (FALSE if result == TRUE else TRUE)


# ---- forest agreement: vectorized == oracle --------------------------

def _dedup_sort(v):
    # lists may contain null ELEMENTS (ADVICE round 3: the Arrow path
    # crashed on nulls inside string lists with member groups); sort
    # with a None-last key since None isn't comparable
    return sorted(set(v), key=lambda x: (x is None, x))


event_strategy = st.fixed_dictionaries({
    "x": st.one_of(st.none(), ints),
    "xs": st.one_of(st.none(), st.lists(st.one_of(st.none(), ints), max_size=6).map(_dedup_sort)),
    "s": st.one_of(st.none(), strs),
    "ss": st.one_of(st.none(), st.lists(st.one_of(st.none(), strs), max_size=5).map(_dedup_sort)),
    "b": st.one_of(st.none(), st.booleans()),
    "f": st.one_of(st.none(), st.decimals(min_value=-20, max_value=20, places=4)),
})


def leaf_text(draw) -> str:
    kind = draw(st.integers(0, 9))
    if kind == 0:
        return f"x = {draw(ints)}"
    if kind == 1:
        return f"x {draw(st.sampled_from(['<', '<=', '>', '>=', '<>']))} {draw(ints)}"
    if kind == 2:
        return f"x in {sorted(set(draw(int_lists)))}"
    if kind == 3:
        return f"xs one of {sorted(set(draw(int_lists)))}"
    if kind == 4:
        return f"xs all of {sorted(set(draw(int_lists)))}"
    if kind == 5:
        values = ", ".join(f"'{v}'" for v in sorted(set(draw(str_lists))))
        return f"ss none of [{values}]"
    if kind == 6:
        return f"s = '{draw(strs)}'"
    if kind == 7:
        return draw(st.sampled_from(["b", "not b", "x is null", "s is not null",
                                     "xs is empty", "ss is not empty"]))
    if kind == 8:
        # float literals cannot be negative in the DSL (reference lexer
        # quirk — hypothesis found the generator violating it)
        return f"f {draw(st.sampled_from(['>', '<=']))} {draw(st.integers(0, 19))}.{draw(st.integers(0, 99)):02d}"
    return f"x not in {sorted(set(draw(int_lists)))}"


@st.composite
def expression_strategy(draw) -> str:
    n = draw(st.integers(1, 4))
    parts = []
    for _ in range(n):
        text = leaf_text(draw)
        if draw(st.booleans()):
            text = f"not ({text})"
        parts.append(text)
    out = parts[0]
    for part in parts[1:]:
        out += f" {draw(st.sampled_from(['and', 'or']))} {part}"
    return out


@settings(max_examples=60, deadline=None)
@given(
    expressions=st.lists(expression_strategy(), min_size=1, max_size=12),
    events=st.lists(event_strategy, min_size=1, max_size=25),
)
def test_vectorized_forest_equals_oracle(expressions, events):
    builder = ForestBuilder(ATTRS)
    for sub_id, expression in enumerate(expressions):
        builder.insert(sub_id, expression)
    forest = builder.compile()

    pdf = pd.DataFrame({
        name: pd.Series([e[name] for e in events], dtype=object)
        for name in ATTRS.names()
    })
    rows, subs = BatchEvaluator(forest).evaluate(pdf)
    got: dict[int, set] = {}
    for row, sub in zip(rows.tolist(), subs.tolist()):
        got.setdefault(row, set()).add(sub)

    # two-phase access pruning must be semantics-invariant
    p_rows, p_subs = BatchEvaluator(forest, access_pruning=True).evaluate(pdf)
    pruned: dict[int, set] = {}
    for row, sub in zip(p_rows.tolist(), p_subs.tolist()):
        pruned.setdefault(row, set()).add(sub)

    # the Arrow fast path (mapInArrow matcher, round 3) must agree too,
    # including nulls, empty lists, and object-decimal fallback
    import pyarrow as pa

    batch = pa.record_batch({
        "x": pa.array([e["x"] for e in events], type=pa.int64()),
        "xs": pa.array([e["xs"] for e in events], type=pa.list_(pa.int64())),
        "s": pa.array([e["s"] for e in events], type=pa.string()),
        "ss": pa.array([e["ss"] for e in events], type=pa.list_(pa.string())),
        "b": pa.array([e["b"] for e in events], type=pa.bool_()),
        "f": pa.array([e["f"] for e in events], type=pa.decimal128(12, 4)),
    })
    a_rows, a_subs = BatchEvaluator(forest).evaluate_arrow(batch)
    arrow: dict[int, set] = {}
    for row, sub in zip(a_rows.tolist(), a_subs.tolist()):
        arrow.setdefault(row, set()).add(sub)

    for i, event in enumerate(events):
        expected = set(evaluate_event(forest, event))
        assert got.get(i, set()) == expected, (expressions, event)
        assert pruned.get(i, set()) == expected, (expressions, event)
        assert arrow.get(i, set()) == expected, (expressions, event)
