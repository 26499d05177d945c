"""Pure-Python semantic core: DSL lexer/parser, NNF, forest compiler,
exact single-node oracle matcher. Zero Spark dependencies (SURVEY.md §7.1
step 1-2)."""

from .ast import Node, NnfNode, Op, Predicate, make_predicate
from .compiler import CompiledForest, ForestBuilder, compile_forest
from .errors import (
    ATreeError,
    DuplicateAttribute,
    EmptyListError,
    EventError,
    LexicalError,
    MismatchingTypes,
    NonExistingAttribute,
    ParserError,
    WrongType,
)
from .lexer import Token, lex
from .oracle import ATreeMatcher, evaluate_event, evaluate_leaf, normalize_event
from .parser import parse
from .schema import AttributeDefinition, AttributeKind, AttributeTable

__all__ = [
    "ATreeError",
    "ATreeMatcher",
    "AttributeDefinition",
    "AttributeKind",
    "AttributeTable",
    "CompiledForest",
    "DuplicateAttribute",
    "EmptyListError",
    "EventError",
    "ForestBuilder",
    "LexicalError",
    "MismatchingTypes",
    "Node",
    "NnfNode",
    "NonExistingAttribute",
    "Op",
    "ParserError",
    "Predicate",
    "Token",
    "WrongType",
    "compile_forest",
    "evaluate_event",
    "evaluate_leaf",
    "lex",
    "make_predicate",
    "normalize_event",
    "parse",
]
