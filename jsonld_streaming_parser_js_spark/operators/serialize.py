"""N-Quads serialization sink (W3C RDF 1.1 N-Quads).

The quad columns already hold N-Triples lexical terms (`<iri>`, `"lit"`,
`_:bnode` — parser.py emits canonical lexical forms, escapes included),
so serialization is pure JVM string concatenation: a narrow map over the
scan, no Python, no shuffle — linear at any corpus size. This is the
interchange-format twin of the parquet/Iceberg quad sinks
(plans/lineage.py): `df.write.text(...)` on the output column streams
N-Quads files directly.

Reference anchor: the reference emits RDF/JS quads whose N-Quads
rendering is exactly this concatenation (rdf-string serialization used
throughout /root/reference/test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def to_nquads(quads: DataFrame) -> DataFrame:
    """(url, blk, line): one N-Quads statement per quad. The default
    graph ('') omits the graph label, named graphs include it — the
    W3C N-Quads grammar's optional graphLabel."""
    with_graph = F.concat_ws(" ", "subj", "pred", "obj", "graph")
    without = F.concat_ws(" ", "subj", "pred", "obj")
    line = F.concat(
        F.when(F.col("graph") != "", with_graph).otherwise(without),
        F.lit(" ."))
    return quads.select("url", "blk", line.alias("line"))
