"""Vectorized tri-state forest evaluator over Arrow/pandas record batches.

This is the batch generalization of the reference's per-event search
(/root/reference/src/atree.rs:255-311): instead of one tri-state bitset
memo per event (src/evaluation.rs:1-64), we keep one uint8 code vector
per DAG node across a whole batch of rows, with Kleene codes ordered
FALSE=0 < UNKNOWN=1 < TRUE=2 so that AND = elementwise min and OR =
elementwise max (identical truth tables to evaluate_and/evaluate_or,
src/atree.rs:612-672).

Execution strategy (SURVEY.md §4.8):
- each distinct leaf is evaluated once per batch as a numpy column
  (the CSE payoff — reference shares node evaluations per event,
  src/lib.rs:72-75);
- list-typed attributes are flattened once per batch into (flat values,
  row ids) so every one-of/all-of leaf over that attribute is a single
  vectorized membership + segmented reduction — no per-row Python;
- equality leaves over the same attribute are evaluated as ONE
  searchsorted + scatter for the whole group (the vectorized analog of
  the reference's access-predicate work-list, src/atree.rs:530-547);
- interior nodes are swept level by level with fancy-indexed min/max —
  a handful of numpy ops per DAG level, not per node;
- rows are processed in adaptive chunks sized so the node-value matrix
  stays CPU-cache-resident: with 32 concurrent executor workers the
  sweep is memory-bandwidth-bound, and an 8 MB working set per task
  measured ~30x faster than 50 MB (96k vs 3k rows/s/stage on a 10k-
  subscription forest) — the uint8 matrix never touches DRAM twice.
"""

from __future__ import annotations

from decimal import Decimal
from fractions import Fraction

import numpy as np
import pandas as pd

from .ast import Op
from .compiler import AND, LEAF, CompiledForest

FALSE, UNKNOWN, TRUE = np.uint8(0), np.uint8(1), np.uint8(2)

DECIMAL_SCALE = 6  # Float attrs are exact decimals at scale 6 (SURVEY §1.2)


def _tri_from_bool(result: np.ndarray, null_mask: np.ndarray) -> np.ndarray:
    out = np.where(result, TRUE, FALSE).astype(np.uint8, copy=False)
    if null_mask is not None and null_mask.any():
        out = np.where(null_mask, UNKNOWN, out)
    return out


class _ScalarColumn:
    """Null-separated numpy view of one scalar attribute column."""

    __slots__ = ("mask", "values", "str_series")

    def __init__(self, mask: np.ndarray, values, str_series=None):
        self.mask = mask
        self.values = values
        self.str_series = str_series


class _ListColumn:
    """Flattened once-per-batch representation of a list column."""

    __slots__ = ("mask", "lengths", "row_ids", "flat", "n")

    def __init__(self, series: pd.Series):
        n = len(series)
        self.n = n
        mask = np.zeros(n, dtype=bool)
        lengths = np.zeros(n, dtype=np.int64)
        chunks = []
        raw = series.to_numpy()
        for i in range(n):
            v = raw[i]
            if v is None or (isinstance(v, float) and np.isnan(v)):
                mask[i] = True
            else:
                lengths[i] = len(v)
                if len(v):
                    chunks.append(np.asarray(v))
        self.mask = mask
        self.lengths = lengths
        self.row_ids = np.repeat(np.arange(n, dtype=np.int64), lengths)
        if chunks:
            self.flat = np.concatenate(chunks)
        else:
            self.flat = np.empty(0, dtype=np.int64)


def _scaled_int_from_decimal_literal(literal: Decimal) -> Fraction:
    return Fraction(literal) * 10**DECIMAL_SCALE


def _decimal_threshold(op: Op, literal: Decimal) -> tuple[Op, int]:
    """Convert an exact-decimal comparison into an equivalent int64
    comparison over scale-6 fixed-point values. Exact: the literal is
    converted through Fraction, never through binary floats."""
    import math

    frac = _scaled_int_from_decimal_literal(literal)
    if frac.denominator == 1:
        return op, int(frac)
    # literal is not representable at scale 6; adjust threshold
    if op is Op.LT:   # v < frac  <=>  v <= floor(frac)  <=> v < floor+1
        return Op.LT, math.floor(frac) + 1
    if op is Op.LE:   # v <= frac <=>  v <= floor(frac)
        return Op.LT, math.floor(frac) + 1
    if op is Op.GT:   # v > frac  <=>  v >= ceil(frac)
        return Op.GE, math.ceil(frac)
    if op is Op.GE:
        return Op.GE, math.ceil(frac)
    raise AssertionError(op)


class _MemberGroup:
    """Inverted index over the membership leaves of one attribute.

    vocab: literal value -> dense vid; CSR (vid_offsets, vid_leaves) maps
    each vid to the group-leaf positions whose literal list contains it.
    Evaluation scatters each batch value occurrence into its leaves —
    the batch analog of the reference registering each predicate once in
    a global work-list and evaluating it once per event
    (src/atree.rs:558-591).
    """

    __slots__ = (
        "attr_index", "is_list", "leaf_idxs", "negated", "vocab",
        "vid_offsets", "vid_leaves", "n_leaves",
    )

    def __init__(self, forest, attr_index: int, is_list: bool, leaf_idxs: list[int]):
        self.attr_index = attr_index
        self.is_list = is_list
        self.leaf_idxs = leaf_idxs
        self.n_leaves = len(leaf_idxs)
        self.negated = np.array(
            [forest.leaves[i].op in (Op.NOT_IN, Op.NONE_OF) for i in leaf_idxs]
        )
        vocab: dict = {}
        per_vid_leaves: list[list[int]] = []
        for group_pos, leaf_idx in enumerate(leaf_idxs):
            for value in forest.leaves[leaf_idx].operand:
                vid = vocab.get(value)
                if vid is None:
                    vid = len(vocab)
                    vocab[value] = vid
                    per_vid_leaves.append([])
                per_vid_leaves[vid].append(group_pos)
        counts = np.array([len(v) for v in per_vid_leaves], dtype=np.int64)
        self.vid_offsets = np.concatenate([[0], np.cumsum(counts)])
        self.vid_leaves = (
            np.concatenate([np.asarray(v, dtype=np.int64) for v in per_vid_leaves])
            if per_vid_leaves
            else np.empty(0, dtype=np.int64)
        )
        self.vocab = vocab

    def _codes(self, values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Map raw values -> (valid_mask, vids). Ints use searchsorted on
        the sorted vocab; strings use a pandas hash map."""
        if len(values) == 0:
            return np.empty(0, dtype=bool), np.empty(0, dtype=np.int64)
        sample = values[0]
        if isinstance(sample, str) or values.dtype.kind in ("U", "O"):
            mapped = pd.Series(values).map(self.vocab)
            valid = mapped.notna().to_numpy()
            vids = mapped.fillna(0).to_numpy(dtype=np.int64)
            return valid, vids
        keys = np.fromiter(self.vocab.keys(), dtype=np.int64, count=len(self.vocab))
        vids_by_key = np.fromiter(self.vocab.values(), dtype=np.int64, count=len(self.vocab))
        order = np.argsort(keys)
        sorted_keys, sorted_vids = keys[order], vids_by_key[order]
        pos = np.searchsorted(sorted_keys, values)
        pos_clipped = np.minimum(pos, len(sorted_keys) - 1)
        valid = sorted_keys[pos_clipped] == values
        return valid, sorted_vids[pos_clipped]

    def evaluate(self, col, n: int) -> np.ndarray:
        """-> uint8 matrix (n_leaves, n)."""
        if self.is_list:
            values, rows = col.flat, col.row_ids
        else:
            values, rows = col.values if col.str_series is None else col.str_series.to_numpy(), np.arange(n)
        valid, vids = self._codes(np.asarray(values))
        occ_rows = rows[valid]
        occ_vids = vids[valid]

        hit = np.zeros((self.n_leaves, n), dtype=bool)
        if len(occ_vids):
            starts = self.vid_offsets[occ_vids]
            counts = self.vid_offsets[occ_vids + 1] - starts
            total = int(counts.sum())
            if total:
                # ragged gather: positions into vid_leaves for every
                # (occurrence, leaf) pair
                offsets = np.repeat(starts, counts)
                within = np.arange(total) - np.repeat(
                    np.concatenate([[0], np.cumsum(counts)[:-1]]), counts
                )
                pair_leaves = self.vid_leaves[offsets + within]
                pair_rows = np.repeat(occ_rows, counts)
                hit[pair_leaves, pair_rows] = True

        result = hit ^ self.negated[:, None]
        out = np.where(result, TRUE, FALSE).astype(np.uint8, copy=False)
        if col.mask.any():
            out[:, col.mask] = UNKNOWN
        return out


class BatchEvaluator:
    """Evaluates a CompiledForest over pandas record batches.

    The forest and this evaluator are both picklable state that ships to
    executors via closure capture / broadcast; all heavy work happens in
    numpy on Arrow-backed columns.
    """

    def __init__(self, forest: CompiledForest, memory_budget_bytes: int = 8 << 20):
        self.forest = forest
        self.memory_budget = memory_budget_bytes
        self._plan_leaf_groups()
        self._plan_levels()
        self._plan_subscribers()

    # ------------------------------------------------------------ planning

    def _plan_leaf_groups(self) -> None:
        """Group leaves per attribute for one-shot evaluation:

        - EQ leaves -> one searchsorted/map + scatter per attribute;
        - IN/NOT_IN and ONE_OF/NONE_OF leaves -> a broadcast *inverted
          index* (literal value -> leaf ids): each value occurrence in the
          batch scatters into exactly the leaves that list it, so work is
          O(occurrences x leaves-per-value) instead of O(leaves x rows).
          This is the vectorized restatement of the reference's global
          predicate work-list / access-predicate pass
          (src/atree.rs:530-591).

        Everything else evaluates per-leaf (still vectorized per batch).
        """
        forest = self.forest
        eq_groups: dict[int, list[int]] = {}
        member_groups: dict[tuple[int, bool], list[int]] = {}
        generic: list[int] = []
        for leaf_idx, leaf in enumerate(forest.leaves):
            if leaf.op is Op.EQ and not isinstance(leaf.operand, Decimal):
                eq_groups.setdefault(leaf.attr_index, []).append(leaf_idx)
            elif leaf.op in (Op.IN, Op.NOT_IN):
                member_groups.setdefault((leaf.attr_index, False), []).append(leaf_idx)
            elif leaf.op in (Op.ONE_OF, Op.NONE_OF):
                member_groups.setdefault((leaf.attr_index, True), []).append(leaf_idx)
            else:
                generic.append(leaf_idx)

        self.eq_groups: list[tuple[int, np.ndarray, list[int]]] = []
        for attr_index, leaf_idxs in eq_groups.items():
            if len(leaf_idxs) < 4:
                generic.extend(leaf_idxs)
                continue
            operands = [forest.leaves[i].operand for i in leaf_idxs]
            order = sorted(range(len(operands)), key=lambda i: operands[i])
            sorted_ops = np.array([operands[i] for i in order])
            sorted_leaf_idxs = [leaf_idxs[i] for i in order]
            self.eq_groups.append((attr_index, sorted_ops, sorted_leaf_idxs))

        self.member_groups: list[_MemberGroup] = []
        for (attr_index, is_list), leaf_idxs in member_groups.items():
            if len(leaf_idxs) < 2:
                generic.extend(leaf_idxs)
                continue
            self.member_groups.append(
                _MemberGroup(forest, attr_index, is_list, leaf_idxs)
            )
        self.generic_leaves = generic

    def _plan_levels(self) -> None:
        forest = self.forest
        by_level: dict[int, dict[int, list[int]]] = {}
        for i in range(forest.num_nodes):
            kind = forest.node_kind[i]
            if kind == LEAF:
                continue
            by_level.setdefault(forest.node_level[i], {}).setdefault(kind, []).append(i)
        self.levels: list[tuple[int, np.ndarray, np.ndarray, np.ndarray]] = []
        for level in sorted(by_level):
            for kind, nodes in by_level[level].items():
                nodes_arr = np.array(nodes, dtype=np.int64)
                left = np.array([forest.node_left[i] for i in nodes], dtype=np.int64)
                right = np.array([forest.node_right[i] for i in nodes], dtype=np.int64)
                self.levels.append((kind, nodes_arr, left, right))
        leaf_nodes = [i for i in range(forest.num_nodes) if forest.node_kind[i] == LEAF]
        self.leaf_node_idxs = np.array(leaf_nodes, dtype=np.int64)
        self.leaf_of_node = np.array(
            [forest.node_left[i] for i in leaf_nodes], dtype=np.int64
        )

    def _plan_subscribers(self) -> None:
        forest = self.forest
        node_idxs = []
        sub_ids = []
        for node_idx, subs in forest.node_subs.items():
            for sub in subs:
                node_idxs.append(node_idx)
                sub_ids.append(sub)
        self.sub_node_idxs = np.array(node_idxs, dtype=np.int64)
        self.sub_ids = np.array(sub_ids)

    # ------------------------------------------------------------ columns

    def _scalar_column(self, series: pd.Series, kind) -> _ScalarColumn:
        from .schema import AttributeKind

        mask = series.isna().to_numpy()
        if kind is AttributeKind.STRING:
            return _ScalarColumn(mask, None, series)
        if kind is AttributeKind.BOOLEAN:
            values = series.astype("boolean").fillna(False).to_numpy(dtype=bool)
            return _ScalarColumn(mask, values)
        if kind is AttributeKind.FLOAT:
            # Fast path: engine pre-scales decimals JVM-side to int64 at
            # scale 6. Slow path (tests/oracle): object Decimals.
            if series.dtype == object:
                values = np.array(
                    [0 if v is None else int(Decimal(v).scaleb(DECIMAL_SCALE))
                     for v in series],
                    dtype=np.int64,
                )
            else:
                values = series.fillna(0).to_numpy(dtype=np.int64)
            return _ScalarColumn(mask, values)
        # INTEGER: Arrow gives int64, or float64/object when nulls present
        if series.dtype == np.int64:
            values = series.to_numpy()
        else:
            if series.dtype == object:
                series = pd.to_numeric(series)
            values = series.fillna(0).to_numpy(dtype=np.int64)
        return _ScalarColumn(mask, values)

    def _columns(self, pdf: pd.DataFrame) -> dict[int, object]:
        """Build per-attribute column caches for the attributes the forest
        actually touches (column pruning at the Python layer too)."""
        forest = self.forest
        needed = {leaf.attr_index for leaf in forest.leaves}
        cache: dict[int, object] = {}
        for attr_index in needed:
            definition = forest.attributes.definition(attr_index)
            series = pdf[definition.name]
            if definition.kind.is_list:
                cache[attr_index] = _ListColumn(series)
            else:
                cache[attr_index] = self._scalar_column(series, definition.kind)
        return cache

    # ------------------------------------------------------------ leaves

    def _eval_generic_leaf(self, leaf, col, n: int) -> np.ndarray:
        op = leaf.op
        operand = leaf.operand

        if op in (Op.IS_NULL, Op.IS_NOT_NULL):
            result = col.mask if op is Op.IS_NULL else ~col.mask
            return np.where(result, TRUE, FALSE).astype(np.uint8, copy=False)
        if op in (Op.IS_EMPTY, Op.IS_NOT_EMPTY):
            empty = col.lengths == 0
            result = empty if op is Op.IS_EMPTY else ~empty
            return _tri_from_bool(result, col.mask)

        if op is Op.VAR:
            return _tri_from_bool(col.values, col.mask)
        if op is Op.NVAR:
            return _tri_from_bool(~col.values, col.mask)

        if op in (Op.EQ, Op.NE, Op.LT, Op.LE, Op.GT, Op.GE):
            if isinstance(operand, Decimal):
                cmp_op, threshold = (
                    _decimal_threshold(op, operand)
                    if op in (Op.LT, Op.LE, Op.GT, Op.GE)
                    else (op, None)
                )
                if op is Op.EQ or op is Op.NE:
                    frac = _scaled_int_from_decimal_literal(operand)
                    if frac.denominator != 1:
                        result = np.zeros(n, dtype=bool) if op is Op.EQ else np.ones(n, dtype=bool)
                    else:
                        result = col.values == int(frac)
                        if op is Op.NE:
                            result = ~result
                    return _tri_from_bool(result, col.mask)
                values, literal, op = col.values, threshold, cmp_op
            elif isinstance(operand, str):
                series = col.str_series
                if op is Op.EQ:
                    result = (series == operand).to_numpy(dtype=bool)
                else:
                    result = (series != operand).to_numpy(dtype=bool)
                return _tri_from_bool(result, col.mask)
            else:
                values, literal = col.values, operand
            if op is Op.EQ:
                result = values == literal
            elif op is Op.NE:
                result = values != literal
            elif op is Op.LT:
                result = values < literal
            elif op is Op.LE:
                result = values <= literal
            elif op is Op.GT:
                result = values > literal
            else:
                result = values >= literal
            return _tri_from_bool(result, col.mask)

        if op in (Op.IN, Op.NOT_IN):
            if isinstance(operand[0], str):
                result = col.str_series.isin(operand).to_numpy(dtype=bool)
            else:
                result = np.isin(col.values, np.array(operand, dtype=np.int64))
            if op is Op.NOT_IN:
                result = ~result
            return _tri_from_bool(result, col.mask)

        # list operators over the flattened column
        if isinstance(operand[0], str):
            member = pd.Series(col.flat).isin(operand).to_numpy(dtype=bool) \
                if len(col.flat) else np.empty(0, dtype=bool)
        else:
            member = np.isin(col.flat, np.array(operand, dtype=np.int64))
        n_rows = col.n
        if op in (Op.ONE_OF, Op.NONE_OF):
            hits = np.bincount(col.row_ids[member], minlength=n_rows) > 0
            result = hits if op is Op.ONE_OF else ~hits
        else:  # ALL_OF / NOT_ALL_OF: no non-member elements; empty -> all-of
            violations = np.bincount(col.row_ids[~member], minlength=n_rows) > 0
            result = ~violations if op is Op.ALL_OF else violations
        return _tri_from_bool(result, col.mask)

    def _eval_leaves(self, cache: dict, n: int) -> np.ndarray:
        forest = self.forest
        leaf_values = np.empty((len(forest.leaves), n), dtype=np.uint8)

        # grouped equality: one searchsorted + scatter per attribute
        for attr_index, sorted_ops, leaf_idxs in self.eq_groups:
            col = cache[attr_index]
            if sorted_ops.dtype.kind in ("U", "O"):
                codes = pd.Series(col.str_series).map(
                    {v: i for i, v in enumerate(sorted_ops)}
                )
                pos = codes.fillna(-1).to_numpy(dtype=np.int64)
                hit = pos >= 0
            else:
                pos = np.searchsorted(sorted_ops, col.values)
                pos_clipped = np.minimum(pos, len(sorted_ops) - 1)
                hit = sorted_ops[pos_clipped] == col.values
                pos = pos_clipped
            rows = np.arange(n)
            group_rows = np.full((len(leaf_idxs), n), FALSE, dtype=np.uint8)
            group_rows[pos[hit], rows[hit]] = TRUE
            if col.mask.any():
                group_rows[:, col.mask] = UNKNOWN
            leaf_values[leaf_idxs, :] = group_rows

        for group in self.member_groups:
            leaf_values[group.leaf_idxs, :] = group.evaluate(
                cache[group.attr_index], n
            )

        for leaf_idx in self.generic_leaves:
            leaf = self.forest.leaves[leaf_idx]
            leaf_values[leaf_idx] = self._eval_generic_leaf(
                leaf, cache[leaf.attr_index], n
            )
        return leaf_values

    # ------------------------------------------------------------ sweep

    def _chunk_rows(self, n_rows: int) -> int:
        nodes = max(1, self.forest.num_nodes)
        chunk = self.memory_budget // nodes
        return int(max(256, min(16384, chunk, max(n_rows, 1))))

    def evaluate(self, pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        """Returns (row_positions, sub_ids): one pair per (row, matching
        subscription). Row positions index into pdf."""
        n_total = len(pdf)
        if n_total == 0 or len(self.sub_ids) == 0:
            return np.empty(0, dtype=np.int64), self.sub_ids[:0]

        chunk = self._chunk_rows(n_total)
        out_rows: list[np.ndarray] = []
        out_subs: list[np.ndarray] = []
        for start in range(0, n_total, chunk):
            stop = min(start + chunk, n_total)
            piece = pdf.iloc[start:stop] if (start, stop) != (0, n_total) else pdf
            rows, subs = self._evaluate_chunk(piece)
            out_rows.append(rows + start)
            out_subs.append(subs)
        return np.concatenate(out_rows), np.concatenate(out_subs)

    def _evaluate_chunk(self, pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        forest = self.forest
        n = len(pdf)
        cache = self._columns(pdf)
        leaf_values = self._eval_leaves(cache, n)

        values = np.empty((forest.num_nodes, n), dtype=np.uint8)
        values[self.leaf_node_idxs] = leaf_values[self.leaf_of_node]

        for kind, nodes, left, right in self.levels:
            if kind == AND:
                values[nodes] = np.minimum(values[left], values[right])
            else:
                values[nodes] = np.maximum(values[left], values[right])

        matched = values[self.sub_node_idxs] == TRUE  # (n_subscribers, n)
        sub_pos, row_pos = np.nonzero(matched)
        return row_pos.astype(np.int64), self.sub_ids[sub_pos]
