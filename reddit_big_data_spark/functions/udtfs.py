"""Python UDTFs — the table-function corner of the §2.11 UDF surface.

The reference has no UDTF (SURVEY.md §2.11: UDAF/UDTF absent); Spark 4
added Python UDTFs, and this module demonstrates the surface with the
Arrow-optimized evaluator (``useArrow=True`` → ``ArrowEvalPythonUDTF``,
batched columnar transfer — the same sanctioned escape hatch as the
pandas UDFs, never row-at-a-time ``BatchEvalPython``).

UDTFs remain the slow path: everything here has a native
``split``/``explode`` twin (queries/text.py q26) that should be
preferred in hot paths. The point is API completeness with correct
plumbing — lateral join semantics, per-row fan-out, NULL handling —
pinned by q74's plain-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos int, token string", useArrow=True)
class PosTokens:
    """Lateral-explode a single-space-delimited text into (pos, token)
    rows, 0-based. Mirrors ``split(text, ' ')`` exactly — consecutive
    delimiters yield empty tokens, NULL text yields no rows — so a
    native-SQL oracle can reproduce it verbatim."""

    def eval(self, text: str):  # noqa: D102 - contract is the class doc
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield i, tok


def register_udtfs(spark: SparkSession) -> None:
    """Register every library UDTF on the session (idempotent)."""
    spark.udtf.register("pos_tokens", PosTokens)
