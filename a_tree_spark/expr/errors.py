"""Error types for the boolean-expression DSL.

Mirrors the reference error surface (/root/reference/src/error.rs:1-18,
/root/reference/src/events.rs:9-38) so ported tests can assert on error
class, without copying the Rust type layout.
"""

from __future__ import annotations


class ATreeError(Exception):
    """Base class for all engine errors."""


class ParserError(ATreeError):
    """Lexical or syntactic error in a DSL expression."""


class LexicalError(ParserError):
    """Invalid token (reference: src/lexer.rs LexicalError)."""


class EventError(ATreeError):
    """Schema/type errors (reference: src/events.rs EventError)."""


class DuplicateAttribute(EventError):
    """Attribute declared twice (src/events.rs:229-231)."""


class NonExistingAttribute(EventError):
    """Expression or event references an undeclared attribute
    (src/events.rs:16-18)."""


class MismatchingTypes(EventError):
    """Predicate kind is invalid for the attribute's type — the reference
    has strict typing with no int<->float coercion
    (src/predicates.rs:86-130, src/events.rs:28-33)."""


class WrongType(EventError):
    """Event value has the wrong type for the attribute
    (src/events.rs:23-27)."""


class EmptyListError(ParserError):
    """Empty literal lists are a parse error
    (src/parser.rs:311-319,621-629)."""
