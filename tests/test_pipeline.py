"""End-to-end encode pipeline tests: bit-identical decode, compressed-size
bar (≤ Parquet zstd), exact resume under fault injection, salted
source-partitioned mode. Mirrors the reference's expected-results oracle
discipline (/root/reference/src/expected_results.py:309-431) at pipeline
granularity. Run: python -m pytest -x -q
"""

import json
import os
import shutil

import pytest

from poc_parquet_aggregator_spark.encode import (
    decode_verify,
    encode_dataset,
    encode_dataset_by_source,
    read_manifest,
)
from poc_parquet_aggregator_spark.plans import get_spark
from poc_parquet_aggregator_spark.sources import write_token_table

N_DOCS = 6000
DOCS_PER_FILE = 2000


@pytest.fixture(scope="module")
def spark():
    s = get_spark(
        "pipeline_tests",
        cores=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s


@pytest.fixture(scope="module")
def token_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tokens")
    write_token_table(str(d), N_DOCS, docs_per_file=DOCS_PER_FILE)
    return str(d)


def test_encode_decode_bit_identical_and_ratio(spark, token_dir, tmp_path):
    out = str(tmp_path / "enc")
    m = encode_dataset(spark, token_dir, out)
    assert m["files_encoded"] == N_DOCS // DOCS_PER_FILE
    # north rule bar: compressed bytes ≤ reference Parquet(zstd) bytes
    assert m["ratio_vs_parquet_zstd"] <= 1.0
    v = decode_verify(spark, token_dir, out)
    assert v["bit_identical"], v


def test_resume_skips_committed_and_is_deterministic(spark, token_dir, tmp_path):
    out = str(tmp_path / "enc")
    m1 = encode_dataset(spark, token_dir, out)
    manifest1 = read_manifest(out)
    # full resume: nothing re-encoded
    m2 = encode_dataset(spark, token_dir, out)
    assert m2["files_encoded"] == 0
    assert m2["files_skipped"] == m1["files_total"]
    # fault injection: lose one manifest record → exactly one file re-encoded
    stems = sorted(manifest1)
    os.remove(os.path.join(out, "_manifest", f"{stems[0]}.json"))
    m3 = encode_dataset(spark, token_dir, out)
    assert m3["files_encoded"] == 1
    # determinism: re-encoded record identical (checksum, bytes, codecs)
    manifest2 = read_manifest(out)
    a = {k: v for k, v in manifest1[stems[0]].items() if k != "committed_at"}
    b = {k: v for k, v in manifest2[stems[0]].items() if k != "committed_at"}
    assert a == b
    assert decode_verify(spark, token_dir, out)["bit_identical"]


def test_stale_staging_cleaned(spark, token_dir, tmp_path):
    out = str(tmp_path / "enc")
    encode_dataset(spark, token_dir, out)
    staging = os.path.join(out, "_staging", "file_stem=garbage")
    os.makedirs(staging)
    with open(os.path.join(staging, "junk.parquet"), "w") as f:
        f.write("junk")
    stems = sorted(read_manifest(out))
    os.remove(os.path.join(out, "_manifest", f"{stems[0]}.json"))
    encode_dataset(spark, token_dir, out)
    assert not os.path.exists(os.path.join(out, "_staging"))
    assert decode_verify(spark, token_dir, out)["bit_identical"]


def test_changed_input_re_encodes(spark, token_dir, tmp_path):
    out = str(tmp_path / "enc")
    src = str(tmp_path / "src")
    shutil.copytree(token_dir, src)
    encode_dataset(spark, src, out)
    # replace one input file with different content (different size)
    write_token_table(src, 1000, seed=99, docs_per_file=1000)
    files = sorted(os.listdir(src))
    m = encode_dataset(spark, src, out)
    assert m["files_encoded"] >= 1
    assert decode_verify(spark, src, out)["bit_identical"]


def test_salted_source_mode(spark, token_dir, tmp_path):
    out = str(tmp_path / "enc_salted")
    m = encode_dataset_by_source(spark, token_dir, out, n_salts=4)
    # skew defused: head source is ~60% of tokens; with 4 salts no bucket
    # should exceed ~1/4 of that plus slack
    assert m["max_bucket_token_share"] < 0.25
    assert m["ratio_vs_parquet_zstd"] <= 1.0
    assert decode_verify(spark, token_dir, out)["bit_identical"]
    m2 = encode_dataset_by_source(spark, token_dir, out, n_salts=4)
    assert m2["buckets_skipped"] == m2["buckets_total"]


def test_salted_lost_manifest_re_encodes(spark, token_dir, tmp_path):
    """Regression: a committed bucket whose manifest record is lost must be
    re-encoded on resume (the job summary defines the bucket universe)."""
    import glob as g

    out = str(tmp_path / "enc_salted")
    m0 = encode_dataset_by_source(spark, token_dir, out, n_salts=4)
    manifests = sorted(
        p
        for p in g.glob(out + "/_manifest/*.json")
        if not os.path.basename(p).startswith("_")  # skip job-level records
    )
    os.remove(manifests[0])
    m = encode_dataset_by_source(spark, token_dir, out, n_salts=4)
    assert m["buckets_total"] == m0["buckets_total"]
    assert m["buckets_skipped"] == m0["buckets_total"] - 1
    assert decode_verify(spark, token_dir, out)["bit_identical"]


def test_empty_input_file_committed_once(spark, token_dir, tmp_path):
    """A 0-row input file gets a zero manifest record so resume skips it
    instead of rescanning forever."""
    import pyarrow.parquet as pq

    from poc_parquet_aggregator_spark.sources import token_table_schema

    src = str(tmp_path / "src")
    shutil.copytree(token_dir, src)
    pq.write_table(
        token_table_schema().empty_table(), f"{src}/tokens-empty.parquet",
        compression="zstd",
    )
    out = str(tmp_path / "enc")
    m1 = encode_dataset(spark, src, out)
    assert m1["files_encoded"] == m1["files_total"]
    m2 = encode_dataset(spark, src, out)
    assert m2["files_encoded"] == 0
    assert decode_verify(spark, src, out)["bit_identical"]


def test_selective_decode(spark, token_dir, tmp_path):
    """Source pruning + doc_id zone-map skipping return exactly the
    matching rows (compared against a full-decode filter)."""
    from pyspark.sql import functions as F

    from poc_parquet_aggregator_spark.encode import read_decoded

    out = str(tmp_path / "enc_salted")
    encode_dataset_by_source(spark, token_dir, out, n_salts=4)
    full = read_decoded(spark, out)

    by_src = read_decoded(spark, out, sources=["src00"])
    assert by_src.count() == full.filter(F.col("source") == "src00").count()
    assert by_src.filter(F.col("source") != "src00").count() == 0

    lo, hi = "doc-000000001000", "doc-000000001099"
    by_range = read_decoded(spark, out, doc_id_range=(lo, hi))
    expect = full.filter((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi))
    assert by_range.count() == expect.count() == 100


def test_manifest_lineage_fields(spark, token_dir, tmp_path):
    out = str(tmp_path / "enc")
    encode_dataset(spark, token_dir, out)
    rec = next(iter(read_manifest(out).values()))
    for field in ("snapshot", "checksum", "bytes_in", "bytes_out", "codecs", "n_tokens"):
        assert field in rec, field
    assert rec["bytes_out"] < rec["bytes_in"]
    assert any(k.startswith("values_g") for k in rec["codecs"])


def test_sequence_table_adapter(spark, token_dir):
    """One read entry point for both worlds: path → parquet; table ident →
    session catalog (Iceberg on a cluster), with clear failures where the
    runtime is absent instead of opaque catalog errors."""
    import pytest as _pytest

    from poc_parquet_aggregator_spark.sources import (
        has_iceberg,
        iceberg_input_files,
        read_sequence_table,
    )

    df = read_sequence_table(spark, token_dir)
    assert df.count() == N_DOCS
    assert set(df.columns) == {"doc_id", "tokens", "n_tok", "source"}

    with _pytest.raises(ValueError):
        read_sequence_table(spark, token_dir, snapshot_id=123)
    with _pytest.raises(ValueError):
        iceberg_input_files(spark, token_dir)
    if not has_iceberg(spark):  # sandbox: no iceberg-spark-runtime JAR
        with _pytest.raises(RuntimeError):
            iceberg_input_files(spark, "cat.db.tokens")
        with _pytest.raises(RuntimeError):
            read_sequence_table(spark, "cat.db.tokens", snapshot_id=1)


def test_manifest_compaction(spark, token_dir, tmp_path):
    """Compaction folds loose per-file JSONs into a JSONL segment; resume
    semantics (skip committed, re-encode on snapshot mismatch) are
    unchanged, and compaction is idempotent."""
    import glob as _glob
    import os as _os

    from poc_parquet_aggregator_spark.encode import compact_manifest

    out = str(tmp_path / "enc")
    encode_dataset(spark, token_dir, out)
    before = read_manifest(out)
    n_loose = len(_glob.glob(_os.path.join(out, "_manifest", "*.json")))
    assert n_loose >= len(before)

    stats = compact_manifest(out)
    assert stats["absorbed"] == len(before)
    assert read_manifest(out) == before
    assert not [
        p
        for p in _glob.glob(_os.path.join(out, "_manifest", "*.json"))
        if not _os.path.basename(p).startswith("_")
    ]

    # resume after compaction: everything skipped
    m = encode_dataset(spark, token_dir, out)
    assert m["files_encoded"] == 0 and m["files_skipped"] == m["files_total"]

    # new commits land as loose JSONs and override the segment on read
    files = sorted(_glob.glob(_os.path.join(token_dir, "*.parquet")))
    stem = _os.path.basename(files[0]).rsplit(".", 1)[0]
    seg = _glob.glob(_os.path.join(out, "_manifest", "_compacted-*.jsonl"))
    assert len(seg) == 1

    # second compaction with nothing loose is a no-op
    stats2 = compact_manifest(out)
    assert stats2["absorbed"] == 0
    assert read_manifest(out) == before
    assert stem in before


def test_perfile_layout_source_filter_not_pruned(spark, token_dir, tmp_path):
    """On the default per-file layout the file_stem prefix prune must NOT
    apply (stems are 'tokens-...', not source names) — the sources filter
    still returns the right rows via the post-decode filter."""
    from pyspark.sql import functions as F

    from poc_parquet_aggregator_spark.encode import read_decoded
    from poc_parquet_aggregator_spark.encode.pipeline import read_layout

    out = str(tmp_path / "enc")
    encode_dataset(spark, token_dir, out)
    assert read_layout(out) == "per-file"
    full = read_decoded(spark, out)
    by_src = read_decoded(spark, out, sources=["src00"])
    n = full.filter(F.col("source") == "src00").count()
    assert n > 0
    assert by_src.count() == n


def test_same_size_inplace_modify_re_encodes(spark, token_dir, tmp_path):
    """Resume must re-encode an input rewritten in place to the SAME byte
    size (snapshot compares mtime, not just size)."""
    out = str(tmp_path / "enc")
    src = str(tmp_path / "src")
    shutil.copytree(token_dir, src)
    encode_dataset(spark, src, out)
    f = sorted(os.listdir(src))[0]
    path = os.path.join(src, f)
    data = open(path, "rb").read()
    os.utime(path, ns=(os.stat(path).st_atime_ns, os.stat(path).st_mtime_ns + 10**9))
    open(path, "wb").write(data)  # byte-identical rewrite, new mtime
    m = encode_dataset(spark, src, out)
    assert m["files_encoded"] == 1
    assert decode_verify(spark, src, out)["bit_identical"]


def test_duplicate_stems_rejected(spark, token_dir, tmp_path):
    """Same-named inputs from different dirs share a commit key — must be
    rejected up front instead of silently dropping one of them."""
    other = str(tmp_path / "other")
    write_token_table(other, 1000, seed=5, docs_per_file=1000)
    files = sorted(
        os.path.join(token_dir, f) for f in os.listdir(token_dir)
    ) + sorted(os.path.join(other, f) for f in os.listdir(other))
    # both dirs start numbering at tokens-000000000000
    with pytest.raises(ValueError, match="duplicate input file stems"):
        encode_dataset(spark, files, str(tmp_path / "enc"))


def test_jdbc_dimension_seam(spark):
    """S11 seam: dispatch + failure modes are real even without a driver JAR
    in the sandbox (mirrors the iceberg adapter's contract)."""
    from poc_parquet_aggregator_spark.sources import (
        enabled_tag_keys,
        has_jdbc_driver,
        read_jdbc_dimension,
    )

    with pytest.raises(ValueError, match="not a JDBC url"):
        read_jdbc_dimension(spark, "postgres://host/db", "t")
    with pytest.raises(ValueError, match="no known driver"):
        read_jdbc_dimension(spark, "jdbc:exotic://host/db", "t")
    assert not has_jdbc_driver(spark, "org.postgresql.Driver")
    with pytest.raises(RuntimeError, match="not on the classpath"):
        read_jdbc_dimension(spark, "jdbc:postgresql://host/db", "enabled_tag_keys")
    with pytest.raises(RuntimeError, match="not on the classpath"):
        enabled_tag_keys(spark, url="jdbc:postgresql://host/db")
    # local fallback is the broadcastable dim the queries use
    dim = enabled_tag_keys(spark, local=["app", "env"])
    assert [r["key"] for r in dim.collect()] == ["app", "env"]


def test_pack_token_examples_invariants(spark):
    """Packing preserves every token in order per source, never splits a
    doc, and non-final packs span their context boundary."""
    from pyspark.sql import functions as F

    from poc_parquet_aggregator_spark.operators.packing import pack_token_examples
    from poc_parquet_aggregator_spark.sources import generate_token_table

    df = spark.createDataFrame(generate_token_table(500, seed=11).to_pandas())
    packs = pack_token_examples(df, ctx_len=2048).cache()
    rows = packs.orderBy("source", "pack_id").collect()
    # per-pack length bookkeeping
    assert all(len(r["tokens"]) == r["n_tok"] for r in rows)
    # order-preserving round trip per source: concat of packs == concat of docs
    src_tokens = {
        r["source"]: r["all_toks"]
        for r in df.groupBy("source")
        .agg(
            F.flatten(
                F.array_sort(F.collect_list(F.struct("doc_id", "tokens"))).tokens
            ).alias("all_toks")
        )
        .collect()
    }
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r["source"], []).extend(r["tokens"])
    assert by_src == {k: list(v) for k, v in src_tokens.items()}
    # non-final packs cross their boundary: cumulative tokens ≥ (pack_id+1)*ctx
    for src in by_src:
        cum = 0
        ps = [r for r in rows if r["source"] == src]
        for r in ps[:-1]:
            cum += r["n_tok"]
            assert cum >= (r["pack_id"] + 1) * 2048


def test_sampled_decode_verify(spark, token_dir, tmp_path):
    """fraction < 1 verifies a deterministic file-level sample: the decode
    side prunes to the sampled file_stem partitions and the result is
    bit-identical over exactly those files' docs."""
    import zlib

    from poc_parquet_aggregator_spark.encode.pipeline import _stem

    out = str(tmp_path / "enc")
    encode_dataset(spark, token_dir, out)
    files = sorted(os.listdir(token_dir))
    sampled = [f for f in files if zlib.crc32(_stem(f).encode()) % 1000 < 500]
    expect_docs = sum(
        spark.read.parquet(os.path.join(token_dir, f)).count() for f in (sampled or files[:1])
    )
    res = decode_verify(spark, token_dir, out, fraction=0.5)
    assert res["bit_identical"]
    assert res["ok"] == expect_docs
    assert 0 < expect_docs < N_DOCS or len(sampled) in (0, len(files))


def test_extra_metadata_columns_roundtrip(spark, tmp_path):
    """Columns beyond the core schema (string / int32 / int64 / double)
    encode per type, ride the lineage manifest, and decode bit-identically
    — including through the salted by-source mode and decode_verify's
    extended comparison."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from poc_parquet_aggregator_spark.encode import read_decoded
    from poc_parquet_aggregator_spark.sources import generate_token_table

    rng = np.random.default_rng(3)
    base = generate_token_table(3000, seed=7)
    n = base.num_rows
    ext = base.append_column(
        "lang", pa.array(rng.choice(["en", "de", "fr"], n), type=pa.string())
    ).append_column(
        "quality", pa.array(rng.random(n), type=pa.float64())
    ).append_column(
        "crawl_ts", pa.array(rng.integers(1_500_000_000_000, 1_800_000_000_000, n), type=pa.int64())
    ).append_column(
        "n_lines", pa.array(rng.integers(0, 500, n), type=pa.int32())
    ).append_column(
        "seq", pa.array(np.arange(n, dtype=np.int32) * 3 + 10, type=pa.int32())
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(ext.slice(0, 1500), f"{src}/tokens-000000000000.parquet", compression="zstd")
    pq.write_table(ext.slice(1500), f"{src}/tokens-000000001500.parquet", compression="zstd")

    out = str(tmp_path / "enc")
    m = encode_dataset(spark, src, out)
    assert m["files_encoded"] == 2
    res = decode_verify(spark, src, out)
    assert res["bit_identical"], res
    dec = read_decoded(spark, out)
    assert set(dec.columns) == {"doc_id", "tokens", "n_tok", "source",
                                "lang", "quality", "crawl_ts", "n_lines", "seq"}
    # per-stream codec lineage includes the extras; the monotone int column
    # must select the DELTA codec (constant-step stream → tiny delta child)
    rec = next(iter(read_manifest(out).values()))
    assert any(k.startswith("extra:lang") for k in rec["codecs"])
    assert any(k == "extra:seq:delta" for k in rec["codecs"]), rec["codecs"]
    # salted mode carries extras too
    out2 = str(tmp_path / "enc_salted")
    encode_dataset_by_source(spark, src, out2, n_salts=2)
    assert decode_verify(spark, src, out2)["bit_identical"]


def test_column_pruned_decode(spark, token_dir, tmp_path):
    """read_decoded(columns=...) decodes only the selected columns: results
    match the full decode's projection, the lengths-only path (n_tok
    without tokens) agrees, and the parquet scan reads only the needed
    blob columns."""
    from pyspark.sql import functions as F

    from poc_parquet_aggregator_spark.encode import read_decoded

    out = str(tmp_path / "enc")
    encode_dataset(spark, token_dir, out)
    full = read_decoded(spark, out)

    ntok = read_decoded(spark, out, columns=["doc_id", "n_tok"])
    assert ntok.columns == ["doc_id", "n_tok"]
    a = {r["doc_id"]: r["n_tok"] for r in ntok.collect()}
    b = {r["doc_id"]: r["n_tok"] for r in full.select("doc_id", "n_tok").collect()}
    assert a == b
    # scan pruning: tokens/source blobs never read for this projection
    plan = ntok._jdf.queryExecution().executedPlan().toString()
    import re

    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert read_schemas and all(
        "source_blob" not in rs and "extras_blob" not in rs for rs in read_schemas
    ), read_schemas

    # sources filter with a projection that drops source afterwards
    only = read_decoded(spark, out, sources=["src00"], columns=["doc_id"])
    assert only.columns == ["doc_id"]
    assert only.count() == full.filter(F.col("source") == "src00").count()

    with pytest.raises(ValueError, match="unknown columns"):
        read_decoded(spark, out, columns=["nope"])


def test_extra_float_container_incompressible():
    """Incompressible float64 extras take the raw-flag container; a payload
    whose first byte collides with the ZSTD codec id must NOT be misparsed
    (regression: unwrap_zstd on unwrapped raw bytes)."""
    import numpy as np
    import pyarrow as pa

    from poc_parquet_aggregator_spark.encode.pipeline import (
        _decode_extra,
        _encode_extra_array,
    )

    rng = np.random.default_rng(0)
    # raw random bytes as doubles: maximally incompressible, may embed any
    # leading byte (including 0x05), may contain NaN
    raw = rng.integers(0, 256, 8 * 4096, dtype=np.uint8).tobytes()
    vals = np.frombuffer(raw, dtype=np.float64)
    arr = pa.array(vals, type=pa.float64())
    for lvl in (1, 15):
        kind, payload, codec = _encode_extra_array(arr, True, lvl)
        out = _decode_extra(kind, payload, len(vals)).to_numpy(zero_copy_only=False)
        assert np.array_equal(out, vals, equal_nan=True), codec
    # compressible doubles never take the raw flag (zstd or ALP, whichever
    # is byte-smaller — all-zeros is decimal-exact so ALP competes too)
    smooth = pa.array(np.zeros(4096), type=pa.float64())
    kind, payload, codec = _encode_extra_array(smooth, True, 3)
    assert codec != "f64_raw"
    out = _decode_extra(kind, payload, 4096).to_numpy(zero_copy_only=False)
    assert np.array_equal(out, np.zeros(4096))


def test_point_lookup_doc_ids(spark, token_dir, tmp_path):
    """doc_ids= point lookups: zone-map OR-predicate prunes chunks, exact
    post-filter returns precisely the requested rows (scattered ids across
    files, with a projection)."""
    from poc_parquet_aggregator_spark.encode import read_decoded

    out = str(tmp_path / "enc")
    encode_dataset(spark, token_dir, out)
    want = ["doc-000000000007", "doc-000000002500", "doc-000000005999"]
    got = read_decoded(spark, out, doc_ids=want, columns=["doc_id", "n_tok"])
    rows = {r["doc_id"]: r["n_tok"] for r in got.collect()}
    assert sorted(rows) == want
    full = read_decoded(spark, out, columns=["doc_id", "n_tok"])
    expect = {r["doc_id"]: r["n_tok"] for r in full.collect() if r["doc_id"] in set(want)}
    assert rows == expect
    # nonexistent id → empty, no error
    assert read_decoded(spark, out, doc_ids=["doc-999999999999"]).count() == 0


def test_manifest_file_pruning(spark, token_dir, tmp_path):
    """Range reads prune whole files via the manifest's file-level doc_id
    bounds before the scan: the physical plan's file_stem filter keeps only
    overlapping stems, and results match the unpruned filter."""
    from pyspark.sql import functions as F

    from poc_parquet_aggregator_spark.encode import read_decoded

    out = str(tmp_path / "enc")
    encode_dataset(spark, token_dir, out)
    recs = read_manifest(out)
    assert all(r.get("doc_id_min") and r.get("doc_id_max") for r in recs.values())
    # range falling inside ONE file (files are 2000 docs each, ids sorted)
    lo, hi = "doc-000000000100", "doc-000000000199"
    df = read_decoded(spark, out, doc_id_range=(lo, hi))
    assert df.count() == 100
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the isin list must contain exactly the one overlapping stem
    assert plan.count("tokens-0000000") == 1, plan[:500]
    full = read_decoded(spark, out)
    assert df.count() == full.filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
    ).count()


def test_emit_record_batches_large_utf8_fallback():
    """A large_utf8 array (the ≥2 GiB decode fallback) must still come out
    as utf8 batches matching the declared schema — segmented + cast."""
    import numpy as np
    import pyarrow as pa

    from poc_parquet_aggregator_spark.encode.pipeline import _emit_record_batches

    n = 10
    vals = [f"doc-{i:012d}" for i in range(n)]
    big = pa.array(vals, type=pa.large_utf8())
    schema = pa.schema([pa.field("doc_id", pa.string()), pa.field("n_tok", pa.int32())])
    out = {"doc_id": big, "n_tok": pa.array(np.arange(n, dtype=np.int32))}
    batches = list(_emit_record_batches(out, schema))
    assert all(b.schema == schema for b in batches)
    got = [v.as_py() for b in batches for v in b.column(0)]
    assert got == vals
    got_n = [v.as_py() for b in batches for v in b.column(1)]
    assert got_n == list(range(n))


def test_jdbc_live_roundtrip_derby(spark, tmp_path):
    """LIVE JDBC wire path (r2 VERDICT 'missing #3'): Spark bundles Derby,
    so the writer seam and the reader seam are exercised against a real
    embedded database — batch INSERT out, cursor scan back, values equal."""
    from pyspark.sql import functions as F

    from poc_parquet_aggregator_spark.sources import (
        read_jdbc_dimension,
        write_summary_jdbc,
    )

    url = f"jdbc:derby:{tmp_path}/summarydb;create=true"
    summary = spark.createDataFrame(
        [("2024-01-01", "compute", 12.5, 3), ("2024-01-02", "storage", 7.25, 1)],
        ["usage_date", "kind", "cost", "n"],
    )
    write_summary_jdbc(summary, url, "daily_summary", mode="overwrite")
    back = read_jdbc_dimension(spark, url, "daily_summary")
    got = {tuple(r) for r in back.orderBy("usage_date").collect()}
    want = {tuple(r) for r in summary.collect()}
    assert got == want
    # append doubles the row count (batch INSERT path)
    write_summary_jdbc(summary, url, "daily_summary", mode="append")
    assert read_jdbc_dimension(spark, url, "daily_summary").count() == 4
    # pushed-down subquery read, the reference's enabled-keys shape (quoted
    # identifiers: Spark's JDBC writer quotes lowercase column names, and
    # Derby upper-cases unquoted ones)
    sub = read_jdbc_dimension(
        spark, url, '(SELECT "kind" FROM daily_summary WHERE "cost" > 10) t'
    )
    assert {r["kind"] for r in sub.collect()} == {"compute"}


def test_jdbc_writer_seam_failure_modes(spark):
    """Writer twin of the reader seam: clear errors without a driver JAR."""
    from poc_parquet_aggregator_spark.sources import write_summary_jdbc

    df = spark.range(3).withColumnRenamed("id", "n")
    with pytest.raises(ValueError, match="invalid save mode"):
        write_summary_jdbc(df, "jdbc:postgresql://h/db", "t", mode="upsert")
    with pytest.raises(ValueError, match="no known driver"):
        write_summary_jdbc(df, "jdbc:exotic://h/db", "t")
    with pytest.raises(RuntimeError, match="not on the classpath"):
        write_summary_jdbc(df, "jdbc:postgresql://h/db", "t")


def test_length_zone_map_pruned_read(spark, token_dir, tmp_path):
    """n_tok zone maps: a length-bucketed read (the training dataloader's
    curriculum/length-sampling pattern) prunes chunks via chunk-level
    n_tok_min/max before any blob is decoded, and the exact per-row filter
    matches a post-hoc filter of the full decode."""
    from pyspark.sql import functions as F

    from poc_parquet_aggregator_spark.encode import read_decoded

    out = str(tmp_path / "enc")
    encode_dataset(spark, token_dir, out)
    full = read_decoded(spark, out).select("doc_id", "n_tok")
    want = {r["doc_id"] for r in full.filter(F.col("n_tok") <= 8).collect()}
    got_df = read_decoded(spark, out, n_tok_range=(1, 8), columns=["doc_id", "n_tok"])
    got = {r["doc_id"] for r in got_df.collect()}
    assert got == want and len(got) > 0
    # the chunk-level prune is in the plan (scan-side filter on the zone map)
    plan = got_df._jdf.queryExecution().optimizedPlan().toString()
    assert "n_tok_max" in plan and "n_tok_min" in plan


def test_length_bounds_prune_files_via_manifest(spark, tmp_path):
    """Files whose manifest n_tok bounds don't overlap the requested length
    band are dropped BEFORE the scan (the doc_id manifest-prune analog)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from poc_parquet_aggregator_spark.encode import read_decoded
    from poc_parquet_aggregator_spark.sources import token_table_schema

    src = str(tmp_path / "src")
    os.makedirs(src)

    def write(name, start, length, n):
        toks = [[7] * length for _ in range(n)]
        tbl = pa.table(
            {
                "doc_id": pa.array([f"doc-{start + i:012d}" for i in range(n)]),
                "tokens": pa.array(toks, type=pa.list_(pa.int32())),
                "n_tok": pa.array([length] * n, type=pa.int32()),
                "source": pa.array(["s"] * n),
            },
            schema=token_table_schema(),
        )
        pq.write_table(tbl, f"{src}/{name}.parquet", compression="zstd")

    write("short", 0, 2, 50)
    write("long", 100, 100, 50)
    out = str(tmp_path / "enc")
    encode_dataset(spark, src, out)
    rec = read_manifest(out)
    assert rec["short"]["n_tok_min"] == rec["short"]["n_tok_max"] == 2
    assert rec["long"]["n_tok_min"] == rec["long"]["n_tok_max"] == 100

    df = read_decoded(spark, out, n_tok_range=(90, 200), columns=["doc_id", "n_tok"])
    assert df.count() == 50
    # the 'short' file is pruned at the manifest: its stem is absent from
    # the isin() file filter in the plan
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "long" in plan and "short" not in plan


def test_compact_encoded_merges_parts_and_recovers(spark, token_dir, tmp_path):
    """Small-file maintenance: multi-part stems merge to one part with NO
    re-encode (bit-identical decode, manifest checksum untouched, resume
    still skips), and an interrupted dir swap rolls back on the next run."""
    import glob as g

    import pyarrow.parquet as pq_

    from poc_parquet_aggregator_spark.encode import compact_encoded
    from poc_parquet_aggregator_spark.sources.tokens import generate_token_table

    # inputs with SMALL row groups: Spark can only split a parquet file at
    # row-group boundaries, so multi-part stems need multi-row-group files
    src = str(tmp_path / "src")
    os.makedirs(src)
    for start in (0, 2000, 4000):
        tbl = generate_token_table(2000, start_id=start)
        pq_.write_table(
            tbl, f"{src}/tokens-{start:012d}.parquet",
            compression="zstd", row_group_size=500,
        )
    token_dir = src
    out = str(tmp_path / "enc")
    # tiny splits force Spark to cut each input file into several tasks →
    # several parts per stem
    encode_dataset(spark, token_dir, out, target_tasks=12)
    stems = sorted(g.glob(out + "/data/file_stem=*"))
    n_parts_before = [len(g.glob(s + "/*.parquet")) for s in stems]
    assert max(n_parts_before) > 1, n_parts_before
    rec_before = read_manifest(out)

    m = compact_encoded(out)
    assert m["stems_compacted"] == sum(1 for n in n_parts_before if n > 1)
    assert all(len(g.glob(s + "/*.parquet")) == 1 for s in stems)
    assert decode_verify(spark, token_dir, out)["bit_identical"]
    rec_after = read_manifest(out)
    for stem, rec in rec_after.items():
        assert rec["checksum"] == rec_before[stem]["checksum"]
        assert rec["n_parts"] == 1
    # resume unaffected: snapshots still match, nothing re-encodes
    m2 = encode_dataset(spark, token_dir, out)
    assert m2["files_encoded"] == 0

    # crash simulation: stem renamed away (between the two swap renames)
    stem_dir = stems[0]
    stem = os.path.basename(stem_dir).split("=", 1)[1]
    os.rename(stem_dir, out + f"/data/.compact-old-{stem}")
    m3 = compact_encoded(out)
    assert m3["rolled_back"] == 1
    assert os.path.exists(stem_dir)
    assert decode_verify(spark, token_dir, out)["bit_identical"]


def test_selective_reads_equal_posthoc_filters_randomized(spark, token_dir, tmp_path):
    """Randomized equivalence sweep: for seeded random length bands and
    doc_id ranges, the pruned selective read returns EXACTLY the rows a
    post-hoc filter of the full decode returns (composition included)."""
    import random

    from pyspark.sql import functions as F

    from poc_parquet_aggregator_spark.encode import read_decoded

    out = str(tmp_path / "enc")
    encode_dataset(spark, token_dir, out)
    full = read_decoded(spark, out).select("doc_id", "n_tok", "source").cache()
    full.count()
    rng = random.Random(7)
    for _ in range(6):
        lo_t = rng.randint(1, 2000)
        hi_t = lo_t + rng.randint(0, 2500)
        a = rng.randint(0, N_DOCS - 1)
        b = rng.randint(0, N_DOCS - 1)
        lo_d, hi_d = f"doc-{min(a,b):012d}", f"doc-{max(a,b):012d}"
        want = {
            r["doc_id"]
            for r in full.filter(
                (F.col("n_tok") >= lo_t) & (F.col("n_tok") <= hi_t)
                & (F.col("doc_id") >= lo_d) & (F.col("doc_id") <= hi_d)
            ).collect()
        }
        got = {
            r["doc_id"]
            for r in read_decoded(
                spark, out,
                doc_id_range=(lo_d, hi_d),
                n_tok_range=(lo_t, hi_t),
                columns=["doc_id"],
            ).collect()
        }
        assert got == want, (lo_t, hi_t, lo_d, hi_d)
    full.unpersist()


def test_pack_token_examples_salted_streams(spark):
    """n_streams > 1 (the skew control for the 60% head source): every
    token is preserved exactly once, docs are never split, per-stream packs
    obey the boundary rule, and assignment is deterministic across runs."""
    from pyspark.sql import functions as F

    from poc_parquet_aggregator_spark.operators.packing import pack_token_examples
    from poc_parquet_aggregator_spark.sources import generate_token_table

    df = spark.createDataFrame(generate_token_table(500, seed=11).to_pandas())
    packs = pack_token_examples(df, ctx_len=2048, n_streams=4).cache()
    rows = packs.collect()
    assert {r["stream"] for r in rows} == {0, 1, 2, 3}
    assert all(len(r["tokens"]) == r["n_tok"] for r in rows)
    # token multiset preserved exactly (sorted concat per source)
    want = {
        r["source"]: sorted(r["all_toks"])
        for r in df.groupBy("source")
        .agg(F.flatten(F.collect_list("tokens")).alias("all_toks"))
        .collect()
    }
    got: dict = {}
    for r in rows:
        got.setdefault(r["source"], []).extend(r["tokens"])
    assert {k: sorted(v) for k, v in got.items()} == want
    # determinism: identical pack assignment on a repartitioned re-run
    again = {
        (r["source"], r["stream"], r["pack_id"], tuple(r["tokens"]))
        for r in pack_token_examples(df.repartition(13), ctx_len=2048, n_streams=4).collect()
    }
    assert again == {
        (r["source"], r["stream"], r["pack_id"], tuple(r["tokens"])) for r in rows
    }
    packs.unpersist()


def test_source_zone_prunes_chunks_on_perfile_layout(spark, token_dir, tmp_path):
    """Per-file layout: a source-filtered read now prunes chunks via the
    src_set zone column (arrays_overlap in the plan) and returns exactly
    the post-hoc-filtered rows."""
    from pyspark.sql import functions as F

    from poc_parquet_aggregator_spark.encode import read_decoded

    out = str(tmp_path / "enc")
    encode_dataset(spark, token_dir, out)
    full = read_decoded(spark, out)
    want = full.filter(F.col("source") == "src05").count()
    got_df = read_decoded(spark, out, sources=["src05"])
    assert got_df.count() == want > 0
    plan = got_df._jdf.queryExecution().optimizedPlan().toString()
    assert "src_set" in plan and "arrays_overlap" in plan


def test_remap_tokens_vocab_surgery(spark):
    """Vocab remap: 1:1 mapping applied token-exactly, out-of-range and
    negative-mapped ids become UNK, n_tok/doc_id/source untouched."""
    import numpy as np

    from poc_parquet_aggregator_spark.operators.vocab import remap_tokens
    from poc_parquet_aggregator_spark.sources import generate_token_table

    df = spark.createDataFrame(generate_token_table(300, seed=3).to_pandas())
    VOCAB = 50257
    mapping = np.arange(VOCAB, dtype=np.int32) + 1  # shift everything by 1
    mapping[7] = -1  # id 7 is pruned → UNK
    out = remap_tokens(df, mapping, unk_id=0)
    assert out.schema == df.schema
    got = {r["doc_id"]: r for r in out.collect()}
    for r in df.collect():
        want = [0 if t == 7 else t + 1 for t in r["tokens"]]
        g = got[r["doc_id"]]
        assert list(g["tokens"]) == want
        assert g["n_tok"] == r["n_tok"] and g["source"] == r["source"]


def test_null_zone_columns_conservatively_kept(spark, token_dir, tmp_path):
    """Mixed-version out_dir: chunks whose zone columns read as NULL (files
    encoded before src_set / n_tok / doc_id zones existed) must be KEPT by
    the chunk-level prunes, not silently dropped (r3 ADVICE). Simulated by
    nulling the zone columns of every encoded part in place."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from poc_parquet_aggregator_spark.encode import read_decoded

    out = str(tmp_path / "enc")
    encode_dataset(spark, token_dir, out)
    baseline = read_decoded(spark, out, sources=["src05"]).count()
    base_range = read_decoded(spark, out, n_tok_range=(10, 100)).count()
    base_ids = read_decoded(
        spark, out, doc_ids=["doc-000000000005", "doc-000000000123"]
    ).count()
    assert baseline > 0 and base_range > 0 and base_ids == 2
    for p in _glob.glob(os.path.join(out, "data", "**", "*.parquet"), recursive=True):
        tbl = pq.read_table(p)
        n = tbl.num_rows
        for col, typ in [
            ("src_set", pa.list_(pa.string())),
            ("n_tok_min", pa.int32()),
            ("n_tok_max", pa.int32()),
            ("doc_id_min", pa.string()),
            ("doc_id_max", pa.string()),
        ]:
            idx = tbl.schema.get_field_index(col)
            tbl = tbl.set_column(idx, tbl.schema.field(idx), pa.nulls(n, typ))
        pq.write_table(tbl, p, compression="none", use_dictionary=False)
    # zone prunes can no longer skip anything, but the exact post-decode
    # filters still apply — same answers, no silent drop
    assert read_decoded(spark, out, sources=["src05"]).count() == baseline
    assert read_decoded(spark, out, n_tok_range=(10, 100)).count() == base_range
    assert (
        read_decoded(
            spark, out, doc_ids=["doc-000000000005", "doc-000000000123"]
        ).count()
        == 2
    )


def test_remap_tokens_rejects_null_lists(spark):
    """A NULL tokens list must raise, not corrupt offsets (r3 ADVICE)."""
    import numpy as np
    import pytest as _pytest

    from poc_parquet_aggregator_spark.operators.vocab import remap_tokens

    df = spark.createDataFrame(
        [("a", [1, 2], 2, "s"), ("b", None, 0, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    out = remap_tokens(df, np.arange(10, dtype=np.int32))
    with _pytest.raises(Exception, match="NULL lists"):
        out.collect()


def test_emit_record_batches_skewed_rows_bounded_segments(monkeypatch):
    """Segments split by cumulative PAYLOAD bytes (offset walk), not equal
    row counts: with one giant row among many tiny ones every emitted
    segment's payload stays under the cap (r3 ADVICE — equal-count
    splitting could still overflow int32 offsets under skew)."""
    import numpy as np
    import pyarrow as pa

    from poc_parquet_aggregator_spark.encode import pipeline as P

    monkeypatch.setattr(P, "_SEG_PAYLOAD_CAP", 64)
    vals = ["x" * 60] + ["ab"] * 100 + ["y" * 61] + ["c"] * 50
    big = pa.array(vals, type=pa.large_utf8())
    schema = pa.schema([pa.field("s", pa.string()), pa.field("i", pa.int32())])
    out = {"s": big, "i": pa.array(np.arange(len(vals), dtype=np.int32))}
    batches = list(P._emit_record_batches(out, schema))
    assert [v.as_py() for b in batches for v in b.column(0)] == vals
    for b in batches:
        payload = sum(len(v.as_py()) for v in b.column(0))
        assert payload <= 64 or b.num_rows == 1  # lone oversized row ok


def test_length_bucketed_pack_over_encoded(spark, token_dir, tmp_path):
    """Training-loader composition: encode → length-bucketed selective
    decode (n_tok_range drives zone-map pruning) → sequence packing. The
    packed examples must cover exactly the in-range docs, preserve every
    token, and assign deterministically (same packs on a re-read)."""
    from pyspark.sql import functions as F

    from poc_parquet_aggregator_spark.encode import read_decoded
    from poc_parquet_aggregator_spark.operators.packing import pack_token_examples

    out = str(tmp_path / "enc")
    encode_dataset(spark, token_dir, out)
    lo, hi = 32, 256
    dec = read_decoded(spark, out, n_tok_range=(lo, hi))
    want_docs = (
        spark.read.parquet(token_dir)
        .filter((F.col("n_tok") >= lo) & (F.col("n_tok") <= hi))
    )
    packed = pack_token_examples(dec, ctx_len=1024)
    agg = packed.agg(
        F.sum("n_docs").alias("docs"),
        F.sum("n_tok").alias("toks"),
        F.sum(F.size("tokens")).alias("flat"),
    ).collect()[0]
    src = want_docs.agg(
        F.count("*").alias("docs"), F.sum("n_tok").alias("toks")
    ).collect()[0]
    assert agg["docs"] == src["docs"] > 0
    assert agg["toks"] == src["toks"] == agg["flat"]
    # deterministic: identical pack assignment on a second read
    packed2 = pack_token_examples(
        read_decoded(spark, out, n_tok_range=(lo, hi)), ctx_len=1024
    )
    key = ["source", "pack_id"]
    h = F.md5(F.concat_ws(",", F.transform("tokens", lambda x: x.cast("string"))))
    a = {tuple(r[k] for k in key): r["h"] for r in packed.select(*key, h.alias("h")).collect()}
    b = {tuple(r[k] for k in key): r["h"] for r in packed2.select(*key, h.alias("h")).collect()}
    assert a == b
