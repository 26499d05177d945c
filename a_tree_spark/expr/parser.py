"""Recursive-descent parser for the boolean-expression DSL.

Grammar matched to the reference LALRPOP grammar
(/root/reference/src/grammar.lalrpop:15-254):

- ``and`` and ``or`` share ONE precedence level, left-associative —
  ``a and b or c and d`` parses as ``((a and b) or c) and d``
  (proven by reference test src/parser.rs:837-916);
- ``not`` binds looser than comparisons: ``not x > 2`` == ``not (x > 2)``
  (src/parser.rs:809-824) but tighter than and/or
  (``a and not b`` == ``a and (not b)``, src/atree.rs:895);
- reversed operands are normalized at parse: ``15 < price`` => ``price > 15``
  (src/grammar.lalrpop:85-112), ``1 = x`` => ``x = 1`` (:135-148);
- literal lists accept ``[..]`` or ``(..)`` and are sorted + deduplicated
  (src/grammar.lalrpop:237-244); empty lists are a parse error
  (src/parser.rs:311-319,621-629);
- attribute names resolve against the schema DURING parsing, so unknown
  attributes / type mismatches are parse-time errors.

Divergence from the reference (deliberate, documented): the reference
compares interned StringIds, whose ordering can disagree with string
ordering when expressions share literals (src/strings.rs:4-40) — a latent
bug in sorted-merge membership. We compare actual string values, which
matches the reference on its entire test suite and fixes the edge case.
"""

from __future__ import annotations

from decimal import Decimal

from .ast import Node, Op, make_predicate
from .errors import EmptyListError, ParserError
from .lexer import Token, lex
from .schema import AttributeTable

_CMP_TOKEN_TO_OP = {"LT": Op.LT, "LE": Op.LE, "GT": Op.GT, "GE": Op.GE}
_CMP_FLIP = {Op.LT: Op.GT, Op.LE: Op.GE, Op.GT: Op.LT, Op.GE: Op.LE}
_EQ_TOKEN_TO_OP = {"EQ": Op.EQ, "NE": Op.NE}
_LISTY_TOKEN_TO_OP = {
    "IN": Op.IN,
    "NOT_IN": Op.NOT_IN,
    "ONE_OF": Op.ONE_OF,
    "NONE_OF": Op.NONE_OF,
    "ALL_OF": Op.ALL_OF,
}
_NULLY_TOKEN_TO_OP = {
    "IS_NULL": Op.IS_NULL,
    "IS_NOT_NULL": Op.IS_NOT_NULL,
    "IS_EMPTY": Op.IS_EMPTY,
    "IS_NOT_EMPTY": Op.IS_NOT_EMPTY,
}


class _Parser:
    def __init__(self, tokens: list[Token], attributes: AttributeTable):
        self.tokens = tokens
        self.attributes = attributes
        self.pos = 0
        self.n = len(tokens)  # hot loop: peek/next run ~10x per token

    def peek(self) -> Token | None:
        pos = self.pos
        return self.tokens[pos] if pos < self.n else None

    def next(self) -> Token:
        pos = self.pos
        if pos >= self.n:
            raise ParserError("unexpected end of expression")
        self.pos = pos + 1
        return self.tokens[pos]

    def expect(self, kind: str) -> Token:
        token = self.next()
        if token.kind != kind:
            raise ParserError(
                f"expected {kind} at position {token.pos}, got {token.kind} "
                f"({token.value!r})"
            )
        return token

    # expr := unary (("and" | "or") unary)*   — flat, left-assoc
    def expression(self) -> Node:
        node = self.unary()
        while True:
            token = self.peek()
            if token is None or token.kind not in ("AND", "OR"):
                return node
            self.next()
            right = self.unary()
            node = Node.and_(node, right) if token.kind == "AND" else Node.or_(node, right)

    # unary := "not" unary | primary
    def unary(self) -> Node:
        token = self.peek()
        if token is not None and token.kind == "NOT":
            self.next()
            return Node.not_(self.unary())
        return self.primary()

    def primary(self) -> Node:
        token = self.peek()
        if token is None:
            raise ParserError("unexpected end of expression")

        if token.kind == "LPAREN":
            # Either a parenthesized sub-expression or a (..)-style list
            # used nowhere at primary position — the grammar only allows
            # expressions here.
            self.next()
            node = self.expression()
            self.expect("RPAREN")
            return node

        if token.kind in ("INTEGER", "FLOAT", "STRING"):
            return self.reversed_predicate()

        if token.kind == "IDENT":
            return self.identifier_predicate()

        raise ParserError(
            f"unexpected token {token.kind} ({token.value!r}) at position {token.pos}"
        )

    def identifier_predicate(self) -> Node:
        name = self.next().value
        token = self.peek()

        if token is not None and token.kind in _CMP_TOKEN_TO_OP:
            self.next()
            operand = self.numeric_value()
            return Node.value(
                make_predicate(self.attributes, name, _CMP_TOKEN_TO_OP[token.kind], operand)
            )

        if token is not None and token.kind in _EQ_TOKEN_TO_OP:
            self.next()
            operand = self.primitive_literal()
            return Node.value(
                make_predicate(self.attributes, name, _EQ_TOKEN_TO_OP[token.kind], operand)
            )

        if token is not None and token.kind in _LISTY_TOKEN_TO_OP:
            self.next()
            values = self.list_literal()
            return Node.value(
                make_predicate(self.attributes, name, _LISTY_TOKEN_TO_OP[token.kind], values)
            )

        if token is not None and token.kind in _NULLY_TOKEN_TO_OP:
            self.next()
            return Node.value(
                make_predicate(self.attributes, name, _NULLY_TOKEN_TO_OP[token.kind])
            )

        # bare boolean variable
        return Node.value(make_predicate(self.attributes, name, Op.VAR))

    def reversed_predicate(self) -> Node:
        """``15 < price`` / ``1 = exchange_id`` — literal on the left;
        normalized by flipping (src/grammar.lalrpop:85-148)."""
        literal_token = self.next()
        operand = literal_token.value
        if literal_token.kind == "STRING":
            # Strings are only legal in (reversed) equality.
            op_token = self.next()
            if op_token.kind not in _EQ_TOKEN_TO_OP:
                raise ParserError(
                    f"unexpected token {op_token.kind} after string literal"
                )
            name = self.expect("IDENT").value
            return Node.value(
                make_predicate(self.attributes, name, _EQ_TOKEN_TO_OP[op_token.kind], operand)
            )

        op_token = self.next()
        if op_token.kind in _CMP_TOKEN_TO_OP:
            name = self.expect("IDENT").value
            flipped = _CMP_FLIP[_CMP_TOKEN_TO_OP[op_token.kind]]
            return Node.value(make_predicate(self.attributes, name, flipped, operand))
        if op_token.kind in _EQ_TOKEN_TO_OP:
            name = self.expect("IDENT").value
            return Node.value(
                make_predicate(self.attributes, name, _EQ_TOKEN_TO_OP[op_token.kind], operand)
            )
        raise ParserError(
            f"unexpected token {op_token.kind} after literal at position {op_token.pos}"
        )

    def numeric_value(self) -> int | Decimal:
        token = self.next()
        if token.kind == "INTEGER":
            return token.value
        if token.kind == "FLOAT":
            return token.value
        raise ParserError(
            f"expected a numeric literal at position {token.pos}, got {token.kind}"
        )

    def primitive_literal(self) -> int | Decimal | str:
        token = self.next()
        if token.kind in ("INTEGER", "FLOAT", "STRING"):
            return token.value
        raise ParserError(
            f"expected a literal at position {token.pos}, got {token.kind}"
        )

    def list_literal(self) -> tuple:
        open_token = self.next()
        if open_token.kind == "LBRACKET":
            close = "RBRACKET"
        elif open_token.kind == "LPAREN":
            close = "RPAREN"
        else:
            raise ParserError(
                f"expected a list literal at position {open_token.pos}"
            )
        values: list = []
        elem_kind: str | None = None
        while True:
            token = self.peek()
            if token is not None and token.kind == close and not values:
                raise EmptyListError("empty literal lists are not allowed")
            token = self.next()
            if token.kind not in ("INTEGER", "STRING"):
                raise ParserError(
                    f"expected an integer or string list element at position "
                    f"{token.pos}, got {token.kind}"
                )
            if elem_kind is None:
                elem_kind = token.kind
            elif token.kind != elem_kind:
                raise ParserError(
                    f"mixed element types in list literal at position {token.pos}"
                )
            values.append(token.value)
            token = self.next()
            if token.kind == close:
                break
            if token.kind != "COMMA":
                raise ParserError(
                    f"expected ',' or '{close}' at position {token.pos}"
                )
        # sorted + deduplicated at parse (src/grammar.lalrpop:237-244)
        return tuple(sorted(set(values)))


def parse(text: str, attributes: AttributeTable) -> Node:
    """Parse a DSL expression against a schema. Raises ParserError /
    EventError subclasses exactly where the reference does."""
    tokens = lex(text)
    if not tokens:
        raise ParserError("empty expression")
    parser = _Parser(tokens, attributes)
    node = parser.expression()
    trailing = parser.peek()
    if trailing is not None:
        raise ParserError(
            f"unexpected trailing token {trailing.kind} at position {trailing.pos}"
        )
    return node
