"""Record pretty-printing — byte-parity with the reference's Stringer.

Reference: ``Record.String`` (/root/reference/records/records.go:57-79),
golden-tested at /root/reference/records/records_test.go:59-85. Quirks
reproduced exactly:

- blob truncated at 100 chars, ``...`` appended only when longer
  (the Go Stringer slices BYTES; this implementation counts characters,
  so parity is exact for ASCII blobs and intentionally rune-safe — never
  splitting a multi-byte character — beyond it);
- embedding truncated at 5 elements, 2-decimal fixed precision;
- with >5 elements every shown element is followed by ``", "`` and then
  ``" ..."`` is appended — yielding the double space in ``"5.00,  ..."``;
  with <=5 the trailing ``", "`` is stripped;
- wrapper: ``Embedding{Embedding: %s, EmbedderId: %s, Blob: %v, Id: %s}``.

Both a driver-side function (for Rows) and a Column expression (pure
Catalyst — formats a whole DataFrame without Python) are provided.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def format_embedding(embedding: list[float] | None) -> str:
    emb = list(embedding or [])
    shown = [f"{v:.2f}" for v in emb[:5]]
    if len(emb) > 5:
        return "[" + "".join(s + ", " for s in shown) + " ...]"
    return "[" + ", ".join(shown) + "]"


def record_str(blob: str, embedding: list[float] | None,
               embedder_id: str, record_id: str) -> str:
    b = blob or ""
    shown_blob = b[:100] + ("..." if len(b) > 100 else "")
    return (
        f"Embedding{{Embedding: {format_embedding(embedding)}, "
        f"EmbedderId: {embedder_id}, Blob: {shown_blob}, Id: {record_id}}}"
    )


def record_str_column(blob: Column, embedding: Column,
                      embedder_id: Column, record_id: Column) -> Column:
    """The same format as a native expression — pretty-print a whole
    records DataFrame with zero Python in the plan."""
    # Java %.2f rounds HALF_UP where Go/Python round half to even — they
    # differ only on exactly-representable halves (0.125), which real data
    # never hits. bround would fix that but LOSES the sign of -0.0
    # ("0.00" where Go prints "-0.00"), which real data does hit.
    # NULL alignment with the driver-side record_str: a NULL embedding
    # formats as "[]" and a NULL blob as "" — without the coalesce, size()
    # of a NULL array is NULL, the when() falls through, and format_string
    # renders the literal string "null".
    embedding = F.coalesce(embedding, F.array().cast("array<double>"))
    blob = F.coalesce(blob, F.lit(""))
    shown = F.transform(F.slice(embedding, 1, 5),
                        lambda v: F.format_string("%.2f", v))
    emb_str = F.when(
        F.size(embedding) > 5,
        F.concat(F.lit("["),
                 F.aggregate(shown, F.lit(""),
                             lambda acc, s: F.concat(acc, s, F.lit(", "))),
                 F.lit(" ...]")),
    ).otherwise(F.concat(F.lit("["), F.array_join(shown, ", "), F.lit("]")))
    blob_str = F.when(
        F.length(blob) > 100,
        F.concat(F.substring(blob, 1, 100), F.lit("...")),
    ).otherwise(blob)
    return F.format_string(
        "Embedding{Embedding: %s, EmbedderId: %s, Blob: %s, Id: %s}",
        emb_str, embedder_id, blob_str, record_id,
    )
