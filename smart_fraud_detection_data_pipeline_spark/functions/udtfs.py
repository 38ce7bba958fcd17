"""Python UDTF surface (Spark 4) — the table-function door, gated use.

The reference has no UDF/UDAF/UDTF of any kind (SURVEY §2.10); the
engine's own rule is builtins first (a Python table function is
row-at-a-time on the slow path). This module exists because the API
family is part of a complete engine surface: when a user genuinely
needs a generator that can't be composed from explode/posexplode/
inline — stateful-per-row emission, external-library lookups — this is
the sanctioned shape for it.

`make_tokenize_udtf` mirrors posexplode(split(...)) on purpose: the
parity test (tests/test_udtf.py) pins that the UDTF and the builtin
agree row-for-row, which both documents the migration path OFF the
UDTF when semantics allow and keeps the UDTF wiring itself under test.

Closure contract as everywhere: the class is defined inside the
factory so cloudpickle ships it by value (a module-level UDTF class
pickles by reference and breaks when the driver launches outside the
repo).
"""

from __future__ import annotations


def make_tokenize_udtf():
    """Build the tokenize UDTF class (register with
    ``spark.udtf.register("tokenize", make_tokenize_udtf())``), emitting
    (pos, token) per whitespace token — the UDTF twin of
    ``posexplode(split(trim(text), '\\s+'))``."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate((text or "").strip().split()):
                yield i, tok

    return Tokenize
