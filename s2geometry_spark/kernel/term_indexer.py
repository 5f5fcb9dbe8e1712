"""S2RegionTermIndexer (s2region_term_indexer.cc): the ancestor/covering
term scheme behind indexed spatial containment queries.

This is the NAMED API for the scheme our distributed spatial join
already implements structurally (operators/spatial_join.py: points
explode to ancestor cells, polygons publish covering cells, the join is
an equi join on the shared terms).  Terms are strings
`prefix + [marker] + cell_token`; ANCESTOR terms are unmarked, COVERING
terms carry the marker character ('$' by default).

Guarantee (s2region_term_indexer.h:38-90): a query region intersects an
indexed region iff they share at least one term.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import cellid as K
from .cid import CID
from .coverer import RegionCoverer


@dataclass
class TermIndexerOptions:
    min_level: int = 0
    max_level: int = 30
    level_mod: int = 1
    max_cells: int = 8
    optimize_for_space: bool = False
    index_contains_points_only: bool = False
    marker: str = "$"

    def true_max_level(self) -> int:
        if self.level_mod == 1:
            return self.max_level
        return self.max_level - (self.max_level - self.min_level) % self.level_mod


ANCESTOR, COVERING = 0, 1


class TermIndexer:
    def __init__(self, options: TermIndexerOptions | None = None):
        self.options = options or TermIndexerOptions()

    def _coverer(self) -> RegionCoverer:
        o = self.options
        return RegionCoverer(
            max_cells=o.max_cells, min_level=o.min_level,
            max_level=o.max_level, level_mod=o.level_mod,
        )

    def _term(self, term_type: int, cid: CID, prefix: str) -> str:
        token = K.to_token(np.array([cid.id], dtype=np.uint64))[0]
        if term_type == ANCESTOR:
            return prefix + token
        return prefix + self.options.marker + token

    # ---- index terms (cc:47-130)
    def get_index_terms_point(self, p, prefix: str = "") -> list[str]:
        o = self.options
        leaf = CID(int(K.from_point(
            np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
        )[0]))
        return [
            self._term(ANCESTOR, leaf.parent(level), prefix)
            for level in range(o.min_level, o.max_level + 1, o.level_mod)
        ]

    def get_index_terms_region(self, region, prefix: str = "") -> list[str]:
        covering = self._coverer().get_covering(region)
        return self.get_index_terms_for_canonical_covering(covering, prefix)

    def get_index_terms_for_canonical_covering(
        self, covering: list[CID], prefix: str = ""
    ) -> list[str]:
        o = self.options
        assert not o.index_contains_points_only
        terms: list[str] = []
        prev_id: CID | None = None
        true_max = o.true_max_level()
        for cid in covering:
            level = cid.level()
            if level < true_max:
                terms.append(self._term(COVERING, cid, prefix))
            if level == true_max or not o.optimize_for_space:
                terms.append(self._term(ANCESTOR, cid.parent(level), prefix))
            level -= o.level_mod
            while level >= o.min_level:
                ancestor = cid.parent(level)
                if (prev_id is not None and prev_id.level() > level
                        and prev_id.parent(level) == ancestor):
                    break
                terms.append(self._term(ANCESTOR, ancestor, prefix))
                level -= o.level_mod
            prev_id = cid
        return terms

    # ---- query terms (cc:132-210)
    def get_query_terms_point(self, p, prefix: str = "") -> list[str]:
        o = self.options
        leaf = CID(int(K.from_point(
            np.array([p[0]]), np.array([p[1]]), np.array([p[2]])
        )[0]))
        level = o.true_max_level()
        terms = [self._term(ANCESTOR, leaf.parent(level), prefix)]
        if o.index_contains_points_only:
            return terms
        while level >= o.min_level:
            terms.append(self._term(COVERING, leaf.parent(level), prefix))
            level -= o.level_mod
        return terms

    def get_query_terms_region(self, region, prefix: str = "") -> list[str]:
        covering = self._coverer().get_covering(region)
        return self.get_query_terms_for_canonical_covering(covering, prefix)

    def get_query_terms_for_canonical_covering(
        self, covering: list[CID], prefix: str = ""
    ) -> list[str]:
        o = self.options
        terms: list[str] = []
        prev_id: CID | None = None
        true_max = o.true_max_level()
        for cid in covering:
            level = cid.level()
            terms.append(self._term(ANCESTOR, cid, prefix))
            if o.index_contains_points_only:
                prev_id = cid
                continue
            if o.optimize_for_space and level < true_max:
                terms.append(self._term(COVERING, cid, prefix))
            level -= o.level_mod
            while level >= o.min_level:
                ancestor = cid.parent(level)
                if (prev_id is not None and prev_id.level() > level
                        and prev_id.parent(level) == ancestor):
                    break
                terms.append(self._term(COVERING, ancestor, prefix))
                level -= o.level_mod
            prev_id = cid
        return terms
