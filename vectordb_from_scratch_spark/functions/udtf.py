"""Python UDTF surface (Spark 3.5+ table functions) — one row in, many
typed rows out, registered and callable from SQL. The reference has no
extensibility hooks beyond its Index trait (SURVEY §2.6 'UDF/UDAF/UDTF
surface'); this module demonstrates the UDTF end of ours with a
deterministic sentence splitter whose output the DuckDB oracle
reproduces with regexp_split + unnest.

(The engine's heavy lifting intentionally does NOT use UDTFs — explode
on expressions covers 1:N cheaper; this is the API surface demo. Even
so it is Arrow-optimized: rows cross the JVM/Python boundary in
batches, not one at a time — ArrowEvalPythonUDTF in the plan.)
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

__all__ = ["SplitSentences", "register_udtfs"]


@udtf(returnType="sentence_idx int, sentence string, n_words int", useArrow=True)
class SplitSentences:
    """text → one row per '.'-terminated sentence (trimmed, empties
    dropped), with its index and whitespace word count."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        idx = 0
        for raw in text.split("."):
            s = " ".join(raw.split())  # collapse whitespace, trim
            if s:
                yield idx, s, len(s.split())
                idx += 1


def register_udtfs(spark) -> None:
    spark.udtf.register("split_sentences", SplitSentences)
