"""blacklab_spark — a PySpark-native inverted-index build + BM25 top-k query engine.

A brand-new engine with the query/data-processing capabilities of BlackLab's
Lucene-backed search core (reference: instituutnederlandsetaal/BlackLab),
re-expressed Spark-first: tokenize with vectorized Arrow/pandas UDFs, build
per-partition sorted posting lists (delta+varint blocks with skip/block-max
metadata), merge via a term-keyed shuffle with explicit salting of high-DF
terms, and serve top-k BM25 with block-max pruning — over tables of
multi-turn transcripts (conv_id, turn_idx, role, text, tool, ts).

Design blueprint: SURVEY.md. Not a port: the reference's Java/Lucene
iterators (BLSpans etc.) are replaced by DataFrame plans + pandas stages.
"""

from blacklab_spark.scoring import K1, B, idf, bm25
from blacklab_spark.tokenizer import tokenize, TOKEN_RE


def __getattr__(name):
    # lazy imports so pure-Python modules (codecs/oracle) never pull pyspark
    if name == "build_index" or name == "IndexPaths":
        from blacklab_spark import build
        return getattr(build, name)
    if name == "Corpus":
        from blacklab_spark.corpus import Corpus
        return Corpus
    if name == "get_spark":
        from blacklab_spark.session import get_spark
        return get_spark
    raise AttributeError(name)


__all__ = [
    "K1", "B", "idf", "bm25", "tokenize", "TOKEN_RE",
    "build_index", "IndexPaths", "Corpus", "get_spark",
]

__version__ = "0.1.0"
