"""Unicode cross-engine parity probe for the text-operator surface.

The driver's gate data is pure ASCII (verified in round 2), so the
cross-engine hash discipline of the text operators — identical results
from Spark and DuckDB — has never been exercised on the text a real
100 TB corpus is made of: CJK, emoji (ZWJ sequences, astral-plane
codepoints that are surrogate PAIRS in the JVM's UTF-16), RTL scripts,
combining marks in both NFC and NFD, zero-width characters, exotic
whitespace, control bytes. Engine divergence candidates: UTF-16 vs
codepoint length semantics, Java vs RE2 regex class/word-boundary
behavior, locale-sensitive case folding (Turkish İ, German ß).

This tool appends ~16 adversarial documents to a COPY of the sf0.001
tables and re-runs the driver comparison (same normalization as
tools/self_correctness.py) for every query whose oracle reads the
documents table. A mismatch is a FINDING: a place where the engine's
answers silently fork from the oracle the moment non-ASCII text
arrives. Results: one JSON line; --write records UNICHECK.json.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCHEMA_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Each row: (text, lang, source). doc_id/n_chars derived. One hazard per
# row, so a mismatch localizes itself.
ADVERSARIAL_TEXTS = [
    ("春眠不覚暁 処処聞啼鳥 夜来風雨声 花落知多少", "ja", "probe-cjk"),
    ("family 👨‍👩‍👧‍👦 flags 🇯🇵🇺🇸 fire 🔥 ok", "en", "probe-emoji"),
    ("اللغة العربية جميلة جدا ونصها يمتد من اليمين", "ar", "probe-rtl"),
    ("עברית היא שפה שמית עתיקה מאוד", "he", "probe-rtl"),
    ("élève café naïve façade déjà vu", "fr", "probe-nfc"),
    ("élève café naïve façade", "fr",
     "probe-nfd"),
    ("İstanbul ırmak IŞIK ışık ĞÜŞİÖÇ ğüşiöç", "tr", "probe-turkish"),
    ("Straße GROSSE STRASSE Maß über Äpfel", "de", "probe-german"),
    ("𝒜𝒷𝒸 𝔘𝔫𝔦𝔠𝔬𝔡𝔢 𝟙𝟚𝟛 𐍈𐍉 surrogate pairs", "en", "probe-astral"),
    ("tab\there newline\nhere carriage\rreturn", "en", "probe-control"),
    ("zero​width‍joined﻿text here", "en", "probe-zerowidth"),
    ("ideographic　space non breaking thin space", "en",
     "probe-whitespace"),
    ("контакт: ünïcode@exämple.com тел +1 555 0100 44", "ru",
     "probe-pii-unicode"),
    ("한국어 텍스트와 자모 한한 분해형", "ko", "probe-hangul"),
    ("́combining mark first and alone ́", "en", "probe-combining"),
    ("ASCII control test with vertical\x0btab and bell\x07 char", "en",
     "probe-ctrlbytes"),
]


def _norm(v):
    # lockstep with tools/self_correctness.py::_norm — sign-sensitive
    # since round 9 (repr distinguishes -0.0 from 0.0, like the
    # driver's byte hash; the round-8 covariance lesson)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(round(v, 6))
    if isinstance(v, (int, bool)):
        return v
    return str(v) if v is not None else None


def _synthesize(out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    for t in TABLES:
        src = f"{SCHEMA_SF_DIR}/{t}.parquet"
        part = src if os.path.isfile(src) else os.path.join(
            src, sorted(x for x in os.listdir(src)
                        if x.endswith(".parquet"))[0])
        tab = pq.read_table(part)
        if t == "documents":
            import unicodedata
            base = max(x.as_py() for x in tab["doc_id"]) + 1
            extra = [{"doc_id": base + i,
                      "text": (unicodedata.normalize("NFD", txt)
                               if source == "probe-nfd" else txt),
                      "lang": lang, "source": source,
                      "n_chars": len(unicodedata.normalize("NFD", txt)
                                     if source == "probe-nfd" else txt)}
                     for i, (txt, lang, source)
                     in enumerate(ADVERSARIAL_TEXTS)]
            tab = pa.concat_tables(
                [tab, pa.Table.from_pylist(extra, schema=tab.schema)])
        os.makedirs(f"{out_dir}/{t}.parquet", exist_ok=True)
        pq.write_table(tab, f"{out_dir}/{t}.parquet/part-00000.parquet")


def main() -> int:
    import duckdb

    import __spark_entry__ as em
    from go_simple_embedding_database_spark.session import get_spark

    spark = get_spark(app_name="unicode-probe")
    # Deterministic scratch path: a random name would mint a NEW set of
    # fingerprinted warehouse artifacts (bucketed tables, IVF indexes)
    # per run — stable names make reruns reuse instead of accumulate.
    scratch = os.path.join(tempfile.gettempdir(), "gsed-unicode-probe")
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    results: dict[str, dict] = {}
    try:
        _synthesize(scratch)
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM '{scratch}/{t}.parquet/*.parquet'")
        oracles = em.oracle_sql()
        for name, fn in em.queries().items():
            sql = oracles.get(name)
            if sql is None or "documents" not in sql.lower():
                continue  # text surface only: oracle must read documents
            try:
                sdf = fn(spark, scratch)
                srows = sorted(tuple(_norm(v) for v in r)
                               for r in sdf.collect())
                rel = con.sql(sql)
                drows = sorted(tuple(_norm(v) for v in r)
                               for r in rel.fetchall())
                results[name] = {
                    "rows_match": len(srows) == len(drows),
                    "schema_match": [c.lower() for c in sdf.columns]
                                     == [c.lower() for c in rel.columns],
                    "hash_match": srows == drows,
                    "spark_rows": len(srows), "oracle_rows": len(drows),
                    "err": None,
                }
                if not results[name]["hash_match"]:
                    diff_s = [r for r in srows if r not in drows][:3]
                    diff_d = [r for r in drows if r not in srows][:3]
                    results[name]["spark_only"] = [
                        [str(x)[:80] for x in r] for r in diff_s]
                    results[name]["oracle_only"] = [
                        [str(x)[:80] for x in r] for r in diff_d]
            except Exception as exc:
                results[name] = {
                    "rows_match": False, "schema_match": False,
                    "hash_match": False, "spark_rows": None,
                    "oracle_rows": None,
                    "err": f"{type(exc).__name__}: {exc}".splitlines()[0][:200],
                }
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    failures = {k: (v["err"] or "hash_mismatch")
                for k, v in results.items() if not v["hash_match"]}
    if "--write" in sys.argv:
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "UNICHECK.json"), "w") as fh:
            json.dump({"n_queries": len(results),
                       "n_hash_match": len(results) - len(failures),
                       "failures": failures, "results": results},
                      fh, indent=1, sort_keys=True)
    print(json.dumps({"n_queries": len(results),
                      "n_hash_match": len(results) - len(failures),
                      "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
