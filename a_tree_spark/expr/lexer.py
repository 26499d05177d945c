"""Tokenizer for the boolean-expression DSL.

Behavior-matched to the reference's logos lexer
(/root/reference/src/lexer.rs:18-117):

- multi-word keywords are single tokens with exactly one space
  ("one of", "not in", "is not null", ...);
- identifiers are ``[a-zA-Z_][a-zA-Z0-9_-]*`` (hyphens legal);
- integers ``-?[0-9]+``; floats ``[0-9]+\\.[0-9]*`` (NO negative float
  literals — "-1.5" lexes as Integer(-1) then an invalid "." token);
- strings are single- or double-quoted with backslash escapes kept RAW;
  the value is the slice with leading/trailing quote characters stripped
  (``trim_matches(['\\'', '"'])``, src/lexer.rs:72);
- longest match wins; on a length tie a keyword beats an identifier
  (the reference gets this via a post-lex fixup for "not",
  src/lexer.rs:108-113);
- ``true``/``false`` lex as boolean literals but no grammar production
  consumes them (src/grammar.lalrpop has no rule using "boolean").
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from decimal import Decimal
from typing import Iterator

from .errors import LexicalError


@dataclass(frozen=True)
class Token:
    kind: str
    value: object
    pos: int


# Literal keywords/operators, matched longest-first. Multi-word keywords
# use exactly one space, as in the reference's #[token(...)] literals.
_KEYWORDS: list[tuple[str, str]] = sorted(
    [
        ("is not empty", "IS_NOT_EMPTY"),
        ("is not null", "IS_NOT_NULL"),
        ("is empty", "IS_EMPTY"),
        ("is null", "IS_NULL"),
        ("not in", "NOT_IN"),
        ("one of", "ONE_OF"),
        ("none of", "NONE_OF"),
        ("all of", "ALL_OF"),
        ("and", "AND"),
        ("&&", "AND"),
        ("or", "OR"),
        ("||", "OR"),
        ("not", "NOT"),
        ("!", "NOT"),
        ("in", "IN"),
        ("true", "BOOLEAN"),
        ("false", "BOOLEAN"),
        ("<=", "LE"),
        (">=", "GE"),
        ("<>", "NE"),
        ("<", "LT"),
        (">", "GT"),
        ("=", "EQ"),
        ("(", "LPAREN"),
        (")", "RPAREN"),
        ("[", "LBRACKET"),
        ("]", "RBRACKET"),
        (",", "COMMA"),
    ],
    key=lambda kv: -len(kv[0]),
)

_IDENT_RE = re.compile(r"[a-zA-Z_][a-zA-Z0-9_-]*")
_INT_RE = re.compile(r"-?[0-9]+")
_FLOAT_RE = re.compile(r"[0-9]+\.[0-9]*")
_STRING_RE = re.compile(r"\"(\\.|[^\"\\])*\"|'(\\.|[^'\\])*'")
_WS_RE = re.compile(r"[ \t\n\r\f]+")


# first-character dispatch: only try the keywords that can start here
# (compile-path hot loop — 1e5-expression forests lex ~1e7 tokens)
_KW_BY_CHAR: dict = {}
for _lit, _kind in _KEYWORDS:
    _KW_BY_CHAR.setdefault(_lit[0], []).append((_lit, _kind))
_IDENT_START = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ_")
_NUM_START = set("0123456789-")
_WS = set(" \t\n\r\f")


def tokenize(text: str) -> Iterator[Token]:
    pos = 0
    n = len(text)
    while pos < n:
        c = text[pos]
        if c in _WS:
            pos = _WS_RE.match(text, pos).end()
            if pos >= n:
                break
            c = text[pos]

        candidates = []  # (len, kind, value)

        for literal, kind in _KW_BY_CHAR.get(c, ()):
            if text.startswith(literal, pos):
                value = literal == "true" if kind == "BOOLEAN" else literal
                candidates.append((len(literal), kind, value))
                break  # per-char keyword lists stay longest-first

        if c in _IDENT_START:
            ident = _IDENT_RE.match(text, pos).group()
            if not candidates:
                yield Token("IDENT", ident, pos)
                pos += len(ident)
                continue
            candidates.append((len(ident), "IDENT", ident))
        elif c in _NUM_START:
            m = _FLOAT_RE.match(text, pos)
            if m:
                candidates.append((len(m.group()), "FLOAT", Decimal(m.group())))
            else:
                m = _INT_RE.match(text, pos)
                if m:
                    candidates.append((len(m.group()), "INTEGER", int(m.group())))
        elif c in "'\"":
            m = _STRING_RE.match(text, pos)
            if m:
                # Reference trims *all* leading/trailing quote chars and keeps
                # escape sequences raw (src/lexer.rs:72, test :319-332).
                candidates.append((len(m.group()), "STRING", m.group().strip("'\"")))

        if not candidates:
            raise LexicalError(f"invalid token at position {pos}: {text[pos:pos+10]!r}")

        if len(candidates) == 1:
            length, kind, value = candidates[0]
        else:
            # Longest match wins; ties go to the keyword (listed first).
            best_len = max(c[0] for c in candidates)
            length, kind, value = next(c for c in candidates if c[0] == best_len)
        yield Token(kind, value, pos)
        pos += length


def lex(text: str) -> list[Token]:
    return list(tokenize(text))
