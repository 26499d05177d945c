"""Forest compiler: many expressions -> one shared DAG (CSE), flat arrays.

This is the driver-side analog of the reference's A-Tree insert path
(/root/reference/src/atree.rs:96-245): parse -> NNF -> canonical-hash
common-subexpression dedup -> dense node arena. Instead of a pointer DAG
we emit structure-of-arrays (SURVEY.md §4.7) that broadcasts cheaply to
executors and drives a vectorized tri-state evaluator:

- ``leaves``: unique Predicate list; each distinct leaf is evaluated ONCE
  per Arrow batch as a numpy column — the vectorized generalization of
  the reference's "evaluate each shared node once per event"
  (src/lib.rs:72-75).
- ``node_kind/left/right``: interior AND/OR nodes in topological
  (children-first) order; Kleene AND/OR become elementwise min/max over
  tri-state codes FALSE=0 < UNKNOWN=1 < TRUE=2, exactly the reference's
  success/failed/evaluated bitset triple (src/evaluation.rs:1-64)
  generalized to row vectors.
- ``node_subs``: node index -> subscription ids. Nodes can carry ids even
  when interior (an expression may equal a shared subexpression,
  src/atree.rs:111-119). Duplicate expressions under different ids share
  one node (src/atree.rs:1001-1014).

Insert/delete are recompile-and-rebroadcast (SURVEY.md §2.3): sharing is
recomputed from scratch, which compiles 1e5 expressions in seconds and is
the idiomatic Spark lifecycle for a broadcast index.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .ast import NnfNode, Predicate
from .parser import parse
from .schema import AttributeTable

LEAF, AND, OR = 0, 1, 2


@dataclass
class CompiledForest:
    attributes: AttributeTable
    leaves: list[Predicate]
    node_kind: list[int]          # LEAF/AND/OR per node
    node_left: list[int]          # leaf: index into leaves; and/or: node idx
    node_right: list[int]         # leaf: -1
    node_level: list[int]         # leaf: 0; interior: 1 + max(children)
    node_subs: dict[int, list]    # node idx -> subscription ids
    node_cost: list[int] = field(default_factory=list)

    @property
    def num_nodes(self) -> int:
        return len(self.node_kind)

    def subscriber_nodes(self) -> list[tuple[int, list]]:
        return sorted(self.node_subs.items())

    def to_graphviz(self) -> str:
        """DOT dump of the compiled DAG (reference to_graphviz,
        src/atree.rs:341-427 — debug parity, not byte parity)."""
        lines = ["digraph forest {"]
        for i in range(self.num_nodes):
            if self.node_kind[i] == LEAF:
                leaf = self.leaves[self.node_left[i]]
                label = f"{leaf.attr_name} {leaf.op.value}"
                if leaf.operand is not None:
                    label += f" {leaf.operand!r}"
            else:
                label = "and" if self.node_kind[i] == AND else "or"
            subs = self.node_subs.get(i)
            if subs:
                label += f"\\nsubs={sorted(subs)}"
            lines.append(f'  n{i} [label="{label}"];')
            if self.node_kind[i] != LEAF:
                lines.append(f"  n{i} -> n{self.node_left[i]};")
                lines.append(f"  n{i} -> n{self.node_right[i]};")
        lines.append("}")
        return "\n".join(lines)


class ForestBuilder:
    """Incremental subscription registry, compiled on demand.

    Mirrors the reference lifecycle API (new/insert/delete,
    src/atree.rs:66-339) with recompile-on-change semantics.
    """

    def __init__(self, attributes: AttributeTable | list | tuple):
        if not isinstance(attributes, AttributeTable):
            attributes = AttributeTable(attributes)
        self.attributes = attributes
        self._expressions: dict = {}   # sub_id -> NnfNode
        self._forest: CompiledForest | None = None

    def insert(self, sub_id, expression: str) -> None:
        node = parse(expression, self.attributes).optimize()
        self._expressions[sub_id] = node
        self._forest = None

    def delete(self, sub_id) -> None:
        """Reference delete is refcounted cascade (src/atree.rs:313-339);
        recompiling from surviving expressions is observably identical —
        shared nodes survive while any subscriber remains."""
        self._expressions.pop(sub_id, None)
        self._forest = None

    def compile(self) -> CompiledForest:
        if self._forest is None:
            self._forest = compile_forest(self.attributes, self._expressions)
        return self._forest


def compile_forest(attributes: AttributeTable, expressions: dict) -> CompiledForest:
    """expressions: sub_id -> NnfNode (pre-optimized) or DSL string."""
    leaves: list[Predicate] = []
    leaf_index: dict[tuple, int] = {}
    node_kind: list[int] = []
    node_left: list[int] = []
    node_right: list[int] = []
    node_level: list[int] = []
    node_cost: list[int] = []
    node_by_id: dict[int, int] = {}   # canonical id -> node idx
    node_subs: dict[int, list] = {}

    def intern_leaf(predicate: Predicate) -> int:
        key = predicate.key()
        idx = leaf_index.get(key)
        if idx is None:
            idx = len(leaves)
            leaf_index[key] = idx
            leaves.append(predicate)
        return idx

    import hashlib

    blake = hashlib.blake2b
    leaf_id_cache: dict[tuple, int] = {}   # predicate key -> canonical id

    def insert_node(node: NnfNode) -> tuple[int, int]:
        """Returns (node_idx, canonical_id); children-first recursion keeps
        topological order. Canonical ids hash compact byte payloads —
        repr() of nested tuples was ~15% of a 1e5-expression compile —
        and leaf ids memoize on the interned predicate key."""
        if node.tag == "value":
            key = node.predicate.key()
            canonical = leaf_id_cache.get(key)
            if canonical is None:
                canonical = leaf_id_cache[key] = node.id()
            existing = node_by_id.get(canonical)
            if existing is not None:
                return existing, canonical
            leaf_idx = intern_leaf(node.predicate)
            idx = len(node_kind)
            node_kind.append(LEAF)
            node_left.append(leaf_idx)
            node_right.append(-1)
            node_level.append(0)
            node_cost.append(node.predicate.cost())
            node_by_id[canonical] = idx
            return idx, canonical

        left_idx, left_id = insert_node(node.left)
        right_idx, right_id = insert_node(node.right)
        op = AND if node.tag == "and" else OR
        # commutative canonical id (reference src/ast.rs:30-54)
        a, b = (left_id, right_id) if left_id <= right_id else (right_id, left_id)
        payload = (
            (b"a" if node.tag == "and" else b"o")
            + a.to_bytes(8, "big") + b.to_bytes(8, "big")
        )
        canonical = int.from_bytes(
            blake(payload, digest_size=8).digest(), "big"
        )
        existing = node_by_id.get(canonical)
        if existing is not None:
            return existing, canonical
        idx = len(node_kind)
        node_kind.append(op)
        # cheap-first child ordering (reference src/atree.rs:133-137)
        if node_cost[left_idx] <= node_cost[right_idx]:
            node_left.append(left_idx)
            node_right.append(right_idx)
        else:
            node_left.append(right_idx)
            node_right.append(left_idx)
        node_level.append(1 + max(node_level[left_idx], node_level[right_idx]))
        extra = 50 if op == AND else 60
        node_cost.append(node_cost[left_idx] + node_cost[right_idx] + extra)
        node_by_id[canonical] = idx
        return idx, canonical

    for sub_id, expression in expressions.items():
        if isinstance(expression, str):
            expression = parse(expression, attributes).optimize()
        root_idx, _ = insert_node(expression)
        node_subs.setdefault(root_idx, []).append(sub_id)

    return CompiledForest(
        attributes=attributes,
        leaves=leaves,
        node_kind=node_kind,
        node_left=node_left,
        node_right=node_right,
        node_level=node_level,
        node_subs=node_subs,
        node_cost=node_cost,
    )
