"""Disjoint set (union-find) — internal/s2disjoint_set.h.

Stores a partition of a set into disjoint subsets with path compression
and union-by-size, so `union_` and `find_root` run in O(α(N)) amortized
(inverse Ackermann — effectively constant).  The reference uses this for
connected-component passes in S2ValidationQuery; here it also backs
driver-side component folding where a DataFrame connected-components
pass would be overkill (small per-task element counts).

Keys may be any hashable value (the reference is templated the same
way; its S2Point instantiation corresponds to passing point tuples).
"""

from __future__ import annotations

from typing import Hashable, Optional


class DisjointSet:
    """internal::DisjointSet<T> (s2disjoint_set.h:41-153)."""

    def __init__(self) -> None:
        # value -> (parent_value, size); parent == value marks a root.
        self._nodes: dict[Hashable, list] = {}

    def add(self, val: Hashable) -> bool:
        """Adds a new element as its own singleton subset.  Returns False
        (without changes) if the element is already present."""
        if val in self._nodes:
            return False
        self._nodes[val] = [val, 1]
        return True

    def find_root(self, val: Hashable) -> Optional[Hashable]:
        """Root of the element's subset, or None if absent.  Compresses
        the path like the reference's FindRoot/FindRootImpl pair."""
        node = self._nodes.get(val)
        if node is None:
            return None
        if node[0] == val:
            return val
        root = self._find_root_impl(node[0])
        node[0] = root[0]
        return root[0]

    def _find_root_impl(self, val: Hashable) -> list:
        node = self._nodes[val]
        if node[0] == val:
            return node
        root = self._find_root_impl(node[0])
        node[0] = root[0]
        return root

    def union_(self, a: Hashable, b: Hashable) -> bool:
        """Merges the subsets of a and b (union-by-size).  Returns False
        (without changes) when either element is absent."""
        na = self._nodes.get(a)
        nb = self._nodes.get(b)
        if na is None or nb is None:
            return False
        root_a = self._find_root_impl(na[0])
        root_b = self._find_root_impl(nb[0])
        if root_a[0] != root_b[0]:
            if root_a[1] < root_b[1]:
                root_a[0] = root_b[0]
                root_b[1] += root_a[1]
            else:
                root_b[0] = root_a[0]
                root_a[1] += root_b[1]
        return True

    def size(self) -> int:
        return len(self._nodes)

    def clear(self) -> None:
        self._nodes.clear()
