"""Pure-Python RDF parse/serialize kernel (no Spark imports).

Per-document parsing kernels with the exact term/canonicalization semantics
of the reference implementation (dajobe/raptor); pandas UDFs in
``raptor_spark.operators.parse`` batch over these.
"""

from raptor_spark.kernel.terms import (  # noqa: F401
    KIND_URI,
    KIND_LITERAL,
    KIND_BLANK,
    ParseError,
    Triple,
    make_literal,
    nt_render_statement,
    nt_render_term,
)
