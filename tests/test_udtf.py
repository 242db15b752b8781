"""Python UDTF (Spark 4 user-defined TABLE function) — the last cell
of the §2.9 UDF-surface matrix (scalar pandas_udf, GROUPED_AGG,
mapInPandas, applyInPandas, applyInPandasWithState are covered by the
operator modules; this pins the table-function API).

A UDTF is the SLOW PATH for anything expressible with explode/HOFs —
`llm_text.chunk_documents` does this exact job as zero-Exchange
codegen expressions, which is why no production operator here uses a
UDTF. The test exists to (a) prove the API surface works end-to-end
(lateral correlated join over a real table), (b) pin the parity with
the declarative form so anyone reaching for a UDTF sees the
equivalent expression dataflow next to it.
"""

import pyspark.sql.functions as F
from pyspark.sql.functions import udtf

from flink_project_userbehavioranalysis_spark.io import load_table

SF = "/root/testdata/sf0.001"


@udtf(returnType="chunk_idx: int, chunk_text: string")
class FixedChunks:
    """Yield consecutive fixed-size token windows of a document."""

    def eval(self, text: str, size: int):
        if text is None:
            return
        toks = text.split(" ")
        for i in range(0, len(toks), size):
            yield i // size, " ".join(toks[i : i + size])


def test_udtf_lateral_join_matches_declarative(spark):
    docs = load_table(spark, SF, "documents")
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("fixed_chunks", FixedChunks)
    got = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk_text
        FROM udtf_docs d, LATERAL fixed_chunks(d.text, 8) c
        """
    )
    # declarative twin: sequence over chunk starts + slice/concat —
    # the form the engine actually ships (chunk_documents)
    toks = F.split("text", " ")
    n_chunks = F.ceil(F.size("toks") / F.lit(8.0)).cast("int")
    ref = (
        docs.select("doc_id", toks.alias("toks"))
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.array_join(F.slice("toks", i * 8 + 1, 8), " "),
                )
            ).alias("chunk_idx", "chunk_text"),
        )
    )
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in ref.collect())
    assert a == b and len(a) > 0
