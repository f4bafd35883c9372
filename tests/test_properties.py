"""Property-based tests (hypothesis) — each example carries a BATCH of
generated cases through one DataFrame round-trip, so Spark action count
stays low while hypothesis explores the input space.

The reference ships no property tests (SURVEY §5); these pin the
cross-implementation equivalences the oracle strategy depends on:
Python-twin == Catalyst-expression for shingles, formatting, chunking,
and the cosine kernel against numpy.
"""

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from go_simple_embedding_database_spark.functions.formatting import (
    record_str,
    record_str_column,
)
from go_simple_embedding_database_spark.functions.kernels import cosine_similarity
from go_simple_embedding_database_spark.functions.text import (
    chunk_text,
    shingles,
    shingles_py,
)

# Printable ASCII + whitespace: Java's default \s is ASCII-only, and
# shingles_py mirrors that with re.ASCII — non-ASCII whitespace is out of
# contract for both.
TEXTS = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126) | st.just("\n") | st.just("\t"),
    max_size=200,
)

SETTINGS = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SETTINGS
@given(st.lists(TEXTS, min_size=1, max_size=30))
def test_shingles_py_matches_spark(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [sorted(r.s) for r in
           df.select(shingles(F.col("text")).alias("s")).collect()]
    want = [sorted(shingles_py(t)) for t in texts]
    assert got == want


@SETTINGS
@given(st.lists(
    st.tuples(
        TEXTS,
        st.lists(st.floats(min_value=-100, max_value=100,
                           allow_nan=False).map(lambda v: v * math.pi / 3),
                 max_size=8),
    ),
    min_size=1, max_size=30,
))
def test_record_str_column_matches_python(spark, cases):
    rows = [(blob, emb, "e", str(i)) for i, (blob, emb) in enumerate(cases)]
    df = spark.createDataFrame(
        rows, "blob string, embedding array<double>, embedder_id string, id string")
    got = [r.s for r in df.select(record_str_column(
        F.col("blob"), F.col("embedding"), F.col("embedder_id"), F.col("id")
    ).alias("s")).collect()]
    want = [record_str(*r) for r in rows]
    assert got == want


@SETTINGS
@given(st.lists(TEXTS, min_size=1, max_size=30),
       st.integers(min_value=1, max_value=50))
def test_chunk_text_roundtrip(spark, texts, size):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = df.select("text", chunk_text(F.col("text"), size).alias("c")).collect()
    for r in rows:
        assert "".join(r.c) == r.text
        assert all(len(ch) <= size for ch in r.c)
        assert len(r.c) == max(math.ceil(len(r.text) / size), 1)


VECS = st.integers(min_value=2, max_value=16).flatmap(
    lambda d: st.tuples(
        st.lists(st.floats(min_value=-1e3, max_value=1e3, allow_nan=False,
                           width=32), min_size=d, max_size=d),
        st.lists(st.floats(min_value=-1e3, max_value=1e3, allow_nan=False,
                           width=32), min_size=d, max_size=d),
    )
)


@SETTINGS
@given(st.lists(VECS, min_size=1, max_size=30))
def test_cosine_matches_numpy(spark, pairs):
    df = spark.createDataFrame(pairs, "x array<double>, y array<double>")
    got = [r.c for r in df.select(
        cosine_similarity(F.col("x"), F.col("y")).alias("c")).collect()]
    for (x, y), g in zip(pairs, got):
        xa, ya = np.array(x), np.array(y)
        denom = np.linalg.norm(xa) * np.linalg.norm(ya)
        want = 0.0 if denom == 0 else float(xa @ ya) / denom
        assert g == pytest.approx(want, rel=1e-9, abs=1e-12)


# -- round-2: packing + funnel invariants --------------------------------------


@SETTINGS
@given(
    st.lists(st.tuples(st.sampled_from(["s0", "s1", "s2"]), TEXTS),
             min_size=1, max_size=25),
    st.integers(min_value=1, max_value=64),
)
def test_packing_conservation(spark, docs, capacity):
    """Invariants for any corpus/capacity: token mass is conserved, start
    offsets are the exact per-shard prefix sums in order, and bin indices
    are start_token // capacity."""
    from go_simple_embedding_database_spark.operators.packing import (
        assign_pack_bins)
    rows = [(i, src, txt) for i, (src, txt) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = assign_pack_bins(df, capacity=capacity, partition_cols=["source"])
    got = sorted(out.collect(), key=lambda r: (r.source, r.doc_id))
    offset = {}
    for r in got:
        assert r.start_token == offset.get(r.source, 0), r
        offset[r.source] = r.start_token + r.n_tokens
        assert r.bin == r.start_token // capacity
        end_incl = r.start_token + r.n_tokens - 1
        assert r.spans_bins == end_incl // capacity - r.bin + 1
        assert r.n_tokens >= 1  # separator floor


@SETTINGS
@given(st.lists(
    st.tuples(st.integers(min_value=1, max_value=5),
              st.integers(min_value=0, max_value=50),
              st.sampled_from(["signup", "view", "click", "purchase"])),
    min_size=1, max_size=40))
def test_funnel_matches_python_oracle(spark, evs):
    """funnel_times == a brute-force per-user Python fold for any event
    set (including duplicate timestamps and out-of-order stages)."""
    import datetime as dt
    from go_simple_embedding_database_spark.operators.funnel import funnel_times
    stages = ["signup", "view", "click", "purchase"]
    base = dt.datetime(2024, 1, 1)
    rows = [(u, base + dt.timedelta(hours=h), t) for u, h, t in evs]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    got = {r.user_id: tuple(r[f"{s}_ts"] for s in stages)
           for r in funnel_times(df, stages).collect()}
    want = {}
    for u in {e[0] for e in rows}:
        mine = [(ts, t) for (uu, ts, t) in rows if uu == u]
        prev, out = None, []
        for s in stages:
            cand = [ts for ts, t in mine
                    if t == s and (prev is None or ts > prev)]
            prev = min(cand) if cand else None
            out.append(prev)
            if prev is None:
                out += [None] * (len(stages) - len(out))
                break
        want[u] = tuple(out)
    assert got == want


@given(edges=st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)).filter(lambda p: p[0] != p[1]),
    min_size=1, max_size=60))
@SETTINGS
def test_union_find_matches_distributed_cc(spark, edges):
    """The hybrid's two engines must agree on random graphs: driver
    union-find (small-graph path) == distributed min-label loop, both
    labeling every node with its component minimum."""
    from go_simple_embedding_database_spark.operators import dedup as dd

    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    local = {r.node: r.comp for r in
             dd.connected_components(df).collect()}
    dist = {r.node: r.comp for r in
            dd.connected_components(df, small_graph_edges=0).collect()}
    assert local == dist
    # and against a pure-Python reference closure
    want = dd._union_find(edges)
    assert local == want


@SETTINGS
@given(rows=st.lists(
    st.tuples(st.integers(0, 40),
              st.sampled_from(["a", "b", "c", "dup dup", ""]),
              st.integers(0, 5)),
    min_size=1, max_size=40, unique_by=lambda r: r[0]))
def test_dedup_keep_min_by_matches_window_formulation(spark, rows):
    """The min_by-aggregate survivor selection must equal the classic
    row_number-window formulation row for row, on corpora mixing heavy
    duplicates (few distinct texts), empty strings, and scattered ids —
    the exchange-volume rewrite may not change semantics."""
    from pyspark.sql import Window

    from go_simple_embedding_database_spark.operators import dedup as dd

    df = spark.createDataFrame(rows, "doc_id bigint, text string, extra bigint")
    got = sorted(tuple(r) for r in dd.exact_dedup_keep(df).collect())
    w = Window.partitionBy(dd.content_hash("text")).orderBy("doc_id")
    want = sorted(tuple(r) for r in
                  df.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1).drop("_rn").collect())
    assert got == want


@given(rows=st.lists(
    st.tuples(st.integers(0, 30), st.text(max_size=5)),
    min_size=0, max_size=30, unique_by=lambda r: r[0]),
    new_rows=st.lists(
    st.tuples(st.integers(0, 30), st.text(max_size=5)),
    min_size=0, max_size=30, unique_by=lambda r: r[0]))
@SETTINGS
def test_snapshot_diff_upsert_roundtrip(spark, rows, new_rows):
    """Diff law: applying the diff's inserts+updates via upsert and
    dropping its deletes reconstructs the new snapshot exactly."""
    from go_simple_embedding_database_spark.sources.maintenance import (
        snapshot_diff, upsert)

    old = spark.createDataFrame(rows, "id bigint, text string")
    new = spark.createDataFrame(new_rows, "id bigint, text string")
    d = snapshot_diff(old, new, ["id"], ["text"])
    changed_ids = {r.id for r in d.collect()
                   if r.change_type in ("insert", "update")}
    deleted_ids = {r.id for r in d.collect() if r.change_type == "delete"}
    updates = new.filter(F.col("id").isin(changed_ids)) if changed_ids \
        else new.limit(0)
    rebuilt = upsert(old, updates, ["id"])
    if deleted_ids:
        rebuilt = rebuilt.filter(~F.col("id").isin(deleted_ids))
    assert sorted((r.id, r.text) for r in rebuilt.collect()) == \
        sorted((r.id, r.text) for r in new.collect())


@SETTINGS
@given(vecs=st.lists(
    st.lists(st.floats(min_value=-4, max_value=4,
                       allow_nan=False, allow_infinity=False),
             min_size=4, max_size=4),
    min_size=3, max_size=24, unique_by=lambda v: tuple(v)))
def test_kmeans_assignment_is_nearest_centroid(spark, vecs):
    """Invariant of the quantized protocol: every point's assigned cell is
    at least as close (in quantized space) as every other centroid, with
    ties broken toward the smaller cell id."""
    from go_simple_embedding_database_spark.operators.clustering import (
        kmeans_fit)
    k = min(3, len(vecs))
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    assign, cents = kmeans_fit(df, k=k, n_iter=2)
    got = {r.vec_id: r.cluster_id for r in assign.collect()}
    for i, v in enumerate(vecs):
        q = np.round(np.asarray(v) * 1000)
        d = [float(((q - np.asarray(c)) ** 2).sum()) for c in cents]
        best = min(range(k), key=lambda j: (d[j], j))
        assert got[i] == best


@SETTINGS
@given(texts=st.lists(TEXTS, min_size=1, max_size=20))
def test_span_stats_bounds_and_totals(spark, texts):
    """dup_frac in [0,1]; n_dup_spans <= n_spans; every doc emits a row
    (blank docs restored at 0/0 → 0.0 under the r10 degenerate-document
    convention); duplicating the whole corpus drives every SPAN-BEARING
    doc fully cross-doc-duplicated."""
    from go_simple_embedding_database_spark.operators.dedup import (
        duplicated_span_stats)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = duplicated_span_stats(df, n=3).collect()
    assert len(rows) == len(texts)
    for r in rows:
        assert 0 <= r.n_dup_spans <= r.n_spans
        assert 0.0 <= r.dup_frac <= 1.0
    # full-corpus copy: every span of every doc now exists in its twin;
    # gramless (blank) docs stay at the 0/0 → 0.0 convention
    twin = spark.createDataFrame(
        [(i + 10000, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    rows2 = duplicated_span_stats(df.unionByName(twin), n=3).collect()
    assert len(rows2) == 2 * len(texts)
    assert all(r.dup_frac == (1.0 if r.n_spans > 0 else 0.0)
               for r in rows2)


@SETTINGS
@given(edges=st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)).filter(
        lambda e: e[0] != e[1]),
    min_size=1, max_size=24, unique=True))
def test_pagerank_mass_and_determinism(spark, edges):
    """Integer PageRank invariants: every node gets a rank; ranks are
    positive; re-running yields the identical bigints (bit-exact, no
    float accumulation order to drift)."""
    from go_simple_embedding_database_spark.operators.graph import pagerank
    df = spark.createDataFrame(edges, "src long, dst long")
    r1 = {r.node: r.rank for r in pagerank(df, n_iter=3).collect()}
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    assert set(r1) == nodes
    assert all(v > 0 for v in r1.values())
    r2 = {r.node: r.rank for r in pagerank(df, n_iter=3).collect()}
    assert r1 == r2


@SETTINGS
@given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**32 - 1))
def test_codec_ppm_bmp_roundtrip_and_resize_shape(w, h, seed):
    """PPM and BMP encode->decode are exact inverses for any raster
    (BMP exercises every row-padding residue via arbitrary widths), and
    nearest-neighbor resize (a) hits the requested shape, (b) only emits
    pixels present in the source."""
    from tests.test_codecs import _bmp24

    from go_simple_embedding_database_spark.functions import codecs

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(codecs.decode_image(codecs.encode_ppm(arr)), arr)
    assert np.array_equal(codecs.decode_image(_bmp24(arr)), arr)
    tw, th = int(rng.integers(1, 16)), int(rng.integers(1, 16))
    out = codecs.resize_nearest(arr, tw, th)
    assert out.shape == (th, tw, 3)
    src_px = {tuple(p) for p in arr.reshape(-1, 3)}
    assert {tuple(p) for p in out.reshape(-1, 3)} <= src_px


@SETTINGS
@given(st.integers(0, 2**60 - 1), st.integers(0, 59), st.integers(1, 7),
       st.integers(0, 2**32 - 1))
def test_pigeonhole_banding_never_loses_a_close_pair(fp_a, n_flips, budget,
                                                     seed):
    """The banding soundness property the equi-join relies on: ANY pair
    within the Hamming budget shares at least one exact band when the
    fingerprint splits into budget+1 bands. Exercised directly on the
    band splitter with random fingerprints and random <=budget bit
    flips."""
    from go_simple_embedding_database_spark.operators.dedup import (
        SIMHASH_BITS, _pigeonhole_bands)

    rng = np.random.default_rng(seed)
    flips = rng.choice(SIMHASH_BITS, size=min(n_flips, budget),
                       replace=False)
    fp_b = fp_a
    for b in flips:
        fp_b ^= 1 << int(b)

    def bands_py(fp, nbands):
        base, rem = divmod(SIMHASH_BITS, nbands)
        out, off = [], 0
        for i in range(nbands):
            wdt = base + (1 if i < rem else 0)
            out.append((fp >> off) & ((1 << wdt) - 1))
            off += wdt
        return out

    nbands = budget + 1
    a, b = bands_py(fp_a, nbands), bands_py(fp_b, nbands)
    assert any(x == y for x, y in zip(a, b)), (
        f"pair at hamming {len(flips)} <= {budget} shares no band")
    # the Column twin (_pigeonhole_bands) is pinned against brute force
    # end-to-end in test_dedup.test_simhash_banding_equals_bruteforce;
    # keep a reference so the import above stays honest
    assert callable(_pigeonhole_bands) and SIMHASH_BITS == 60


@SETTINGS
@given(st.data())
def test_png_decode_inverts_any_filter_choice(data):
    """decode(encode(pixels, any per-row filter mix)) == pixels for every
    color type — pins the scanline unfiltering (the only stateful part of
    the PNG codec) against ground truth under random shapes, pixel values
    and filter assignments."""
    from go_simple_embedding_database_spark.functions import codecs
    from tests.test_codecs import _png

    h = data.draw(st.integers(1, 6), label="h")
    w = data.draw(st.integers(1, 6), label="w")
    color_type = data.draw(st.sampled_from([0, 2, 4, 6]), label="ct")
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1),
                                          label="seed"))
    arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.int64)
    filters = [data.draw(st.sampled_from([0, 1, 2, 3, 4]), label=f"f{y}")
               for y in range(h)]
    out = codecs.decode_image(_png(arr, color_type=color_type,
                                   filters=filters))
    a8 = arr.astype(np.uint8)
    if color_type == 2:
        expect = a8
    elif color_type == 6:
        expect = a8[:, :, :3]
    else:
        expect = np.repeat(a8[:, :, :1], 3, axis=2)
    assert np.array_equal(out, expect)


@SETTINGS
@given(st.data())
def test_gif_and_avi_video_roundtrip_any_shape(data):
    """encode->decode is exact for GIF (any palette size <= 256, any
    frame count, interlaced or not — pins the LZW coder pair and the
    compositing path) and shape/close for MJPEG-AVI (lossy per-frame
    JPEG, so assert dimensions + frame count + bounded error)."""
    from go_simple_embedding_database_spark.functions import codecs

    h = data.draw(st.integers(1, 12), label="h")
    w = data.draw(st.integers(1, 12), label="w")
    n = data.draw(st.integers(1, 4), label="frames")
    levels = data.draw(st.sampled_from([2, 3, 4]), label="levels")
    interlace = data.draw(st.booleans(), label="interlace")
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1),
                                          label="seed"))
    frames = [(rng.integers(0, levels, size=(h, w, 3)) * (255 // levels))
              .astype(np.uint8) for _ in range(n)]
    gw, gh, out = codecs.decode_gif(codecs.encode_gif(frames,
                                                      interlace=interlace))
    assert (gw, gh, len(out)) == (w, h, n)
    for got, want in zip(out, frames):
        assert np.array_equal(got, want)
    if h >= 8 and w >= 8:            # AVI needs sane JPEG block content
        aw, ah, jpegs = codecs.decode_avi_mjpeg(
            codecs.encode_avi_mjpeg(frames, quality=95))
        assert (aw, ah, len(jpegs)) == (w, h, n)
        dec = codecs.decode_image(jpegs[0])
        assert np.abs(dec.astype(float) - frames[0].astype(float)).mean() < 16


@SETTINGS
@given(st.data())
def test_progressive_jpeg_equals_baseline_decode(data):
    """For ANY image, quality and subsampling, the progressive (SOF2)
    encode decodes to EXACTLY the same pixels as the baseline encode —
    both modes share one quantized-coefficient pipeline, so equality
    isolates the progressive entropy layer (DC shift/refine, EOB runs,
    refinement correction bits) with zero lossy tolerance."""
    from go_simple_embedding_database_spark.functions import codecs

    h = data.draw(st.integers(1, 20), label="h")
    w = data.draw(st.integers(1, 20), label="w")
    q = data.draw(st.sampled_from([15, 50, 90]), label="q")
    sub = data.draw(st.sampled_from(["444", "420"]), label="sub")
    gray = data.draw(st.booleans(), label="gray")
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1),
                                          label="seed"))
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, size=shape, dtype=np.int64).astype(np.uint8)
    b = codecs.decode_image(codecs.encode_jpeg(img, quality=q, subsample=sub))
    p = codecs.decode_image(codecs.encode_jpeg(img, quality=q, subsample=sub,
                                               progressive=True))
    assert np.array_equal(b, p)


@SETTINGS
@given(st.data())
def test_png_all_depths_roundtrip(data):
    """PNG depth coverage: every legal (depth, color type) combination
    round-trips under random filters and interlace — 16-bit keeps the
    high byte, sub-byte gray rescales exactly, palette indices map
    through the table untouched."""
    from tests.test_codecs import _png

    from go_simple_embedding_database_spark.functions import codecs

    h = data.draw(st.integers(1, 10), label="h")
    w = data.draw(st.integers(1, 10), label="w")
    depth = data.draw(st.sampled_from([1, 2, 4, 8, 16]), label="depth")
    interlace = data.draw(st.sampled_from([0, 1]), label="interlace")
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1),
                                          label="seed"))
    filters = [int(rng.integers(0, 5)) for _ in range(h)]
    if depth == 16:
        g = rng.integers(0, 65536, size=(h, w), dtype=np.int64)
        out = codecs.decode_image(_png(g, color_type=0, depth=16,
                                       filters=filters, interlace=interlace))
        assert np.array_equal(out[:, :, 0], (g >> 8).astype(np.uint8))
    elif depth == 8:
        a = rng.integers(0, 256, size=(h, w, 3), dtype=np.int64)
        out = codecs.decode_image(_png(a, color_type=2, filters=filters,
                                       interlace=interlace))
        assert np.array_equal(out, a.astype(np.uint8))
    else:
        top = (1 << depth) - 1
        g = rng.integers(0, top + 1, size=(h, w), dtype=np.int64)
        out = codecs.decode_image(_png(g, color_type=0, depth=depth,
                                       filters=filters, interlace=interlace))
        assert np.array_equal(out[:, :, 0],
                              (g * (255 // top)).astype(np.uint8))


@SETTINGS
@given(st.data())
def test_tiff_roundtrip_any_shape_compression(data):
    """TIFF encode->decode is exact for any raster across byte order,
    strip size, compression scheme and predictor — pins the IFD writer/
    reader pair, both LZW's early-change width growth and PackBits RLE,
    and the differencing predictor's mod-256 cumsum inverse."""
    from go_simple_embedding_database_spark.functions import codecs

    h = data.draw(st.integers(1, 16), label="h")
    w = data.draw(st.integers(1, 16), label="w")
    be = data.draw(st.booleans(), label="big_endian")
    rps = data.draw(st.sampled_from([1, 3, 100]), label="rows_per_strip")
    comp = data.draw(st.sampled_from(["none", "lzw", "packbits"]),
                     label="compression")
    pred = data.draw(st.sampled_from([1, 2]), label="predictor")
    gray = data.draw(st.booleans(), label="gray")
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1),
                                          label="seed"))
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, size=shape, dtype=np.int64).astype(np.uint8)
    t = codecs.encode_tiff(img, big_endian=be, rows_per_strip=rps,
                           compression=comp, predictor=pred)
    out = codecs.decode_image(t)
    expect = np.repeat(img[:, :, None], 3, axis=2) if gray else img
    assert np.array_equal(out, expect)


# --- truncation pairs vs brute force -----------------------------------------

# Tiny alphabet + short words maximize accidental prefix/suffix structure
# so the property actually exercises hits, not just the empty case.
_TRUNC_DOCS = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=40),
    min_size=1, max_size=14,
)


def _brute_affix(rows, min_len, suffix):
    out = set()
    for ia, ta in rows:
        if len(ta) < min_len:
            continue
        for ib, tb in rows:
            if len(tb) <= len(ta):
                continue
            ok = tb.endswith(ta) if suffix else tb.startswith(ta)
            if ok:
                out.add((ia, ib))
    return out


@SETTINGS
@given(_TRUNC_DOCS, st.integers(min_value=1, max_value=8))
def test_prefix_pairs_match_brute_force(spark, texts, min_len):
    from go_simple_embedding_database_spark.operators.dedup import (
        prefix_truncation_pairs)
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in prefix_truncation_pairs(
        df, min_len=min_len, max_bucket=1000).collect()}
    assert got == _brute_affix(rows, min_len, suffix=False)


@SETTINGS
@given(_TRUNC_DOCS, st.integers(min_value=1, max_value=8))
def test_suffix_pairs_match_brute_force(spark, texts, min_len):
    from go_simple_embedding_database_spark.operators.dedup import (
        suffix_truncation_pairs)
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in suffix_truncation_pairs(
        df, min_len=min_len, max_bucket=1000).collect()}
    assert got == _brute_affix(rows, min_len, suffix=True)


# --- ngram novelty vs brute force --------------------------------------------

@SETTINGS
@given(st.lists(TEXTS, min_size=1, max_size=14))
def test_ngram_novelty_matches_brute_force(spark, texts):
    from go_simple_embedding_database_spark.operators.retrieval import (
        ngram_novelty)
    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_grams, r.novelty)
           for r in ngram_novelty(df).collect()}
    # brute force: first occurrence = min doc_id over docs carrying the gram
    grams = {i: set(shingles_py(t)) - {""} for i, t in rows}
    first = {}
    for i, gs in grams.items():
        for g in gs:
            first[g] = min(first.get(g, i), i)
    want = {i: (len(gs), round(sum(first[g] == i for g in gs) / len(gs), 6))
            for i, gs in grams.items() if gs}
    assert got == want


# --- gif_scan duration vs encoder --------------------------------------------

@SETTINGS
@given(st.integers(min_value=1, max_value=5),
       st.integers(min_value=0, max_value=600))
def test_gif_scan_duration_matches_encoder(spark, n_frames, delay_cs):
    from go_simple_embedding_database_spark.functions import codecs
    rng = np.random.default_rng(n_frames * 1000 + delay_cs)
    frames = [(rng.integers(0, 2, (4, 5, 3)) * 128).astype(np.uint8)
              for _ in range(n_frames)]
    gif = codecs.encode_gif(frames, delay_cs=delay_cs)
    n, dur = codecs.gif_scan(gif)
    assert n == n_frames
    assert dur == pytest.approx(n_frames * delay_cs / 100.0)


# --- bloom prune: no false negatives, exact-join transparency -----------------

@SETTINGS
@given(keys=st.lists(st.integers(min_value=-2**40, max_value=2**40),
                     min_size=1, max_size=120, unique=True),
       probes=st.lists(st.integers(min_value=-2**40, max_value=2**40),
                       min_size=1, max_size=200))
def test_bloom_prune_never_drops_a_matching_row(spark, keys, probes):
    """For ANY key/probe sets: prune-then-exact-join == plain join (the
    bitset may pass extra rows, never lose one)."""
    from go_simple_embedding_database_spark.operators.sketch import bloom_prune
    kdf = spark.createDataFrame([(k,) for k in keys], "k long")
    fact = spark.createDataFrame([(i, p) for i, p in enumerate(probes)],
                                 "fid long, k long")
    got = sorted(r.fid for r in
                 bloom_prune(fact, kdf, "k").join(kdf, "k").collect())
    want = sorted(i for i, p in enumerate(probes) if p in set(keys))
    assert got == want


# --- approx quantile verdict: rank-interval logic vs brute force --------------

@SETTINGS
@given(vals=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                               allow_nan=False, width=32),
                     min_size=1, max_size=400))
def test_percentile_sketch_honors_rank_tolerance(spark, vals):
    """The contract approx_order_quantiles' verdict asserts: for any
    column, percentile_approx(acc=2000) returns an element whose rank
    interval [count(<v), count(<=v)] intersects [n(q-tol), n(q+tol)]
    at tol=0.005 — checked brute-force in Python against the exact
    sorted order."""
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    a50, a90 = df.agg(
        F.percentile_approx("x", [0.5, 0.9], 2000)).first()[0]
    n, tol = len(vals), 0.005
    for q, v in ((0.5, a50), (0.9, a90)):
        lt = sum(1 for x in vals if x < v)
        le = sum(1 for x in vals if x <= v)
        assert lt <= (q + tol) * n and le >= (q - tol) * n, (q, v, lt, le, n)


# --- DSIR: Spark weights vs a pure-Python recomputation -----------------------

def _half_up(x: float) -> int:
    """Spark F.round(x, 0) semantics (HALF_UP, away from zero) — Python's
    built-in round() is half-to-even and would fork on exact halves."""
    import math
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


@SETTINGS
@given(docs=st.lists(st.tuples(TEXTS, st.booleans()),
                     min_size=1, max_size=20))
def test_dsir_weights_match_python_brute_force(spark, docs):
    """For ANY corpus/target split, every per-doc weight_micro equals a
    from-scratch Python recomputation (ngram_bag_py tokens, md5 bucket,
    math.log lambda, half-up micro quantization, exact int sum) — the
    whole cross-engine-determinism design in one property."""
    import hashlib
    import math

    from go_simple_embedding_database_spark.functions.text import (
        ngram_bag_py)
    from go_simple_embedding_database_spark.operators import dsir

    B = dsir.DEFAULT_BUCKETS
    rows = [(i, t, flag) for i, (t, flag) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt boolean")
    got = {r.doc_id: (r.n_grams, r.weight_micro) for r in
           dsir.dsir_weights(df, "doc_id", "text", F.col("tgt")).collect()}

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:4], 16) % B

    ct, cr = {}, {}
    for i, t, flag in rows:
        for g in ngram_bag_py(t):
            b = bucket(g)
            cr[b] = cr.get(b, 0) + 1
            if flag:
                ct[b] = ct.get(b, 0) + 1
    Ct, Cr = sum(ct.values()), sum(cr.values())

    def lam_micro(b):
        lam = (math.log(ct.get(b, 0) + 1.0) - math.log(Ct + float(B))
               - math.log(cr.get(b, 0) + 1.0) + math.log(Cr + float(B)))
        return _half_up(lam * dsir.LAMBDA_SCALE)

    for i, t, flag in rows:
        grams = ngram_bag_py(t)
        want = (len(grams), sum(lam_micro(bucket(g)) for g in grams))
        assert got[i] == want, (i, t, got[i], want)


@SETTINGS
@given(texts=st.lists(st.one_of(TEXTS, st.none()), min_size=1, max_size=20))
def test_ngram_bag_py_matches_spark(spark, texts):
    from go_simple_embedding_database_spark.functions.text import (
        ngram_bag, ngram_bag_py)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r.g for r in
           df.select(ngram_bag(F.col("text")).alias("g")).collect()]
    assert got == [ngram_bag_py(t) for t in texts]


# --- embedding moments: Spark GEMM vs numpy on quantized ints -----------------

@SETTINGS
@given(vecs=st.lists(
    st.lists(st.integers(min_value=-1000, max_value=1000),
             min_size=4, max_size=4),
    min_size=2, max_size=40))
def test_embedding_moments_match_numpy_property(spark, vecs):
    """For ANY vector set (values i/1000 — never a rounding-half
    boundary after the float32 round-trip), the distributed GEMM
    moments equal numpy's int64 sums EXACTLY: n, per-dim sums, and the
    full Gram upper triangle."""
    import numpy as np

    from go_simple_embedding_database_spark.operators import pca

    x = [[v / 1000.0 for v in row] for row in vecs]
    df = spark.createDataFrame(
        [(i, row) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>")
    m = {(r.dim_i, r.dim_j): r.v
         for r in pca.embedding_moments(df, dim=4).collect()}
    xq = np.round(np.asarray(x, dtype=np.float32).astype(np.float64)
                  * pca.EMB_SCALE).astype(np.int64)
    g, s = xq.T @ xq, xq.sum(axis=0)
    assert m[(-1, -1)] == len(vecs)
    for i in range(4):
        assert m[(i, -1)] == s[i]
        for j in range(i, 4):
            assert m[(i, j)] == g[i, j]
