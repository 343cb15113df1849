"""PySpark-native inverted-index + BM25 search engine (Lucene-core capabilities).

Public surface:

    from lucene_7_x_9_x_spark import (
        build_index, IndexWriter, IndexSearcher, IndexCatalog,
        maybe_merge, execute_merge, parse, query, get_spark)

Submodules: analysis (tokenizer), functions (bm25/smallfloat/codecs/
similarities), index (builder/writer/merge/catalog/checkindex), search
(query/queryparser/searcher/kernel/rescorer/highlighter), operators
(collectors/suggest), pipeline (dedup/similarity/textstats/multimodal),
streaming (nrt), corpus.
"""

from .analysis.tokenizer import Analyzer, STANDARD  # noqa: F401
from .index.builder import build_index  # noqa: F401
from .index.catalog import IndexCatalog  # noqa: F401
from .index.merge import TieredMergeConfig, execute_merge, find_merges, maybe_merge  # noqa: F401
from .index.writer import IndexWriter  # noqa: F401
from .search import query  # noqa: F401
from .search.queryparser import parse  # noqa: F401
from .search.searcher import IndexSearcher  # noqa: F401
from .session import get_spark  # noqa: F401

__all__ = [
    "Analyzer", "STANDARD", "build_index", "IndexCatalog", "IndexWriter",
    "IndexSearcher", "TieredMergeConfig", "execute_merge", "find_merges",
    "maybe_merge", "query", "parse", "get_spark",
]
