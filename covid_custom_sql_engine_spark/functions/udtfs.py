"""Python UDTF surface (table-valued functions).

The reference has no UDTFs (SURVEY §2.3); this is the beyond-reference
API surface: a Python class whose ``eval`` yields zero-or-more rows per
input row, consumed via LATERAL join in SQL or ``lateralJoin`` on the
DataFrame API.

Scale note: UDTFs execute Python per input row — the slow path. Use
them for genuinely procedural row→rows logic; anything expressible as
``explode(expression)`` (like this tokenizer, which exists as the
codegen ``text.tokens`` expression) should use the expression form in
hot paths. The UDTF here is the API demonstration, deliberately mirroring
an expression-form twin so the oracle can verify it.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos: int, token: string")
class TokenizeUDTF:
    """Yield (position, token) for each whitespace token, lowercased —
    the UDTF twin of ``text.tokens``."""

    def eval(self, text: str | None):  # noqa: D102 — contract is the class doc
        if text is None:
            return
        for i, tok in enumerate(text.lower().strip().split()):
            if tok:
                yield i, tok


def register_udtfs(spark) -> None:
    """Register all engine UDTFs in the session catalog."""
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
