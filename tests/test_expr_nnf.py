"""Ported AST/NNF tests (reference src/ast.rs:101-364): De Morgan
recursion, double negation, commutative hash equality/stability."""

import pytest

from a_tree_spark.expr import (
    AttributeDefinition as A,
    AttributeTable,
    Op,
    parse,
)


@pytest.fixture
def attributes():
    return AttributeTable([
        A.boolean("a"), A.boolean("b"), A.boolean("c"),
        A.integer("price"), A.integer_list("ids"),
    ])


def shape(node):
    if node.tag == "value":
        return ("leaf", node.predicate.attr_name, node.predicate.op.value)
    return (node.tag, shape(node.left), shape(node.right))


def test_not_of_and_becomes_or_of_negations(attributes):
    # ¬(a ∧ b) => ¬a ∨ ¬b (src/ast.rs De Morgan)
    nnf = parse("not (a and b)", attributes).optimize()
    assert shape(nnf) == ("or", ("leaf", "a", "nvar"), ("leaf", "b", "nvar"))


def test_not_of_or_becomes_and_of_negations(attributes):
    nnf = parse("not (a or b)", attributes).optimize()
    assert shape(nnf) == ("and", ("leaf", "a", "nvar"), ("leaf", "b", "nvar"))


def test_double_negation_cancels(attributes):
    nnf = parse("not not a", attributes).optimize()
    assert shape(nnf) == ("leaf", "a", "var")
    nnf = parse("not (not (a and b))", attributes).optimize()
    assert shape(nnf) == ("and", ("leaf", "a", "var"), ("leaf", "b", "var"))


def test_negation_pushes_through_nested_tree(attributes):
    # ¬((a ∧ b) ∨ c) => (¬a ∨ ¬b) ∧ ¬c
    nnf = parse("not ((a and b) or c)", attributes).optimize()
    assert shape(nnf) == (
        "and",
        ("or", ("leaf", "a", "nvar"), ("leaf", "b", "nvar")),
        ("leaf", "c", "nvar"),
    )


def test_leaf_negation_flips_operator(attributes):
    cases = [
        ("not price < 5", Op.GE),
        ("not price <= 5", Op.GT),
        ("not price = 5", Op.NE),
        ("not price in [1, 2]", Op.NOT_IN),
        ("not ids one of [1]", Op.NONE_OF),
        ("not ids all of [1]", Op.NOT_ALL_OF),
        ("not price is null", Op.IS_NOT_NULL),
        ("not ids is empty", Op.IS_NOT_EMPTY),
    ]
    for text, op in cases:
        nnf = parse(text, attributes).optimize()
        assert nnf.tag == "value" and nnf.predicate.op is op, text


def test_commutative_hash_equality(attributes):
    # hash(a ∧ b) == hash(b ∧ a); and/or distinguished (src/ast.rs:312-345)
    ab = parse("a and b", attributes).optimize()
    ba = parse("b and a", attributes).optimize()
    a_or_b = parse("a or b", attributes).optimize()
    assert ab.id() == ba.id()
    assert ab.id() != a_or_b.id()


def test_hash_stability_across_processes(attributes):
    # blake2b-based ids are process-stable (unlike builtin hash) — pin one
    node = parse("a and b", attributes).optimize()
    assert node.id() == parse("a and b", attributes).optimize().id()
    leaf = parse("price = 5", attributes).optimize()
    assert leaf.id() == parse("price = 5", attributes).optimize().id()


def test_equivalent_literal_spellings_share_leaves(attributes):
    # sorted+deduped lists and normalized decimals give one CSE key
    x = parse("price in [3, 1, 2]", attributes).optimize()
    y = parse("price in [2, 3, 1, 1]", attributes).optimize()
    assert x.id() == y.id()
