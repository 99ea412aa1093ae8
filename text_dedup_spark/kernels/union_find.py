"""Driver-local union-find — the single-node *oracle* for distributed CC.

Mirrors reference ``src/text_dedup/utils/union_find.py:6-81`` semantics
(path compression + union by rank). In the Spark engine this is only used by
tests to verify the distributed large-star/small-star connected-components
operator; it never runs in the hot path.
"""

from __future__ import annotations


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[int, int] = {}
        self.rank: dict[int, int] = {}

    def find(self, x: int) -> int:
        if x not in self.parent:
            self.parent[x] = x
            self.rank[x] = 0
            return x
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, x: int, y: int) -> None:
        px, py = self.find(x), self.find(y)
        if px == py:
            return
        if self.rank[px] < self.rank[py]:
            px, py = py, px
        self.parent[py] = px
        if self.rank[px] == self.rank[py]:
            self.rank[px] += 1

    def get_clusters(self) -> dict[int, int]:
        """id -> min-id of its component (normalized labels, SURVEY.md §7.3)."""
        roots: dict[int, int] = {}
        for x in list(self.parent):
            r = self.find(x)
            roots[r] = min(roots.get(r, r), x)
        return {x: roots[self.find(x)] for x in self.parent}
