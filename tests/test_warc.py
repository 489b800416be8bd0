"""WARC / WET connector (sources/warc.py).

Fixtures are deterministic in-test WARC bytes built by
``write_warc_bytes`` (the serializer inverse of the parser), written
as both plain ``.warc`` and member-gzip ``.warc.gz`` — the Common
Crawl on-disk layout.  Byte identity of payloads is asserted
everywhere; malformed blocks must be skipped AND counted.
"""
from __future__ import annotations

import gzip

import pytest

from outrank_spark.sources.warc import (
    pages_from_warc,
    parse_warc_bytes,
    read_warc,
    read_warc_stream,
    read_warc_with_stats,
    read_wet,
    write_warc_bytes,
)


def _http(body: bytes, ctype: str = "text/html") -> bytes:
    return (b"HTTP/1.1 200 OK\r\n"
            + f"Content-Type: {ctype}\r\n".encode()
            + f"Content-Length: {len(body)}\r\n\r\n".encode()
            + body)


def _records():
    html1 = (b"<html><head><title>t1</title></head>"
             b"<body>alpha beta</body></html>")
    html2 = b"<html><body>\xc3\xa9l\xc3\xa8ve</body></html>"
    return [
        {"headers": {"WARC-Type": "warcinfo",
                     "WARC-Date": "2024-03-01T00:00:00Z"},
         "payload": b"software: test"},
        {"headers": {"WARC-Type": "response",
                     "WARC-Target-URI": "http://a.example/x",
                     "WARC-Date": "2024-03-01T01:02:03Z"},
         "payload": _http(html1)},
        {"headers": {"WARC-Type": "response",
                     "WARC-Target-URI": "http://b.example/y",
                     "WARC-Date": "2024-03-02T04:05:06Z"},
         "payload": _http(html2, "text/html; charset=utf-8")},
        {"headers": {"WARC-Type": "conversion",
                     "WARC-Target-URI": "http://a.example/x",
                     "WARC-Date": "2024-03-01T01:02:03Z"},
         "payload": "alpha beta élève".encode("utf-8")},
    ], html1, html2


class TestParser:
    def test_round_trip_plain_and_member_gzip(self):
        recs, _, _ = _records()
        for gz in (False, True):
            raw = write_warc_bytes(recs, member_gzip=gz)
            parsed, n_bad = parse_warc_bytes(raw)
            assert n_bad == 0
            assert len(parsed) == 4
            for orig, got in zip(recs, parsed):
                assert got["payload"] == orig["payload"]
                assert (got["headers"]["warc-type"]
                        == orig["headers"]["WARC-Type"])

    def test_malformed_blocks_skipped_and_counted(self):
        recs, _, _ = _records()
        good = write_warc_bytes(recs[1:2])
        # bad content-length (non-numeric) + leading junk
        bad = (b"junkjunk" + b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"Content-Length: NaN\r\n\r\n")
        parsed, n_bad = parse_warc_bytes(bad + good)
        assert len(parsed) == 1
        assert parsed[0]["headers"]["warc-target-uri"] == \
            "http://a.example/x"
        assert n_bad >= 2  # junk + bad header

    def test_truncated_payload_counted(self):
        recs, _, _ = _records()
        raw = write_warc_bytes(recs[1:2])
        parsed, n_bad = parse_warc_bytes(raw[:-30])
        assert parsed == [] and n_bad == 1

    def test_negative_content_length_terminates(self):
        """A negative Content-Length once hung the parser forever
        (pos went backward and re-found the same magic); it must be
        counted bad and skipped."""
        recs, _, _ = _records()
        bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"Content-Length: -1000\r\n\r\n")
        parsed, n_bad = parse_warc_bytes(bad + write_warc_bytes(recs[1:2]))
        assert len(parsed) == 1
        assert parsed[0]["headers"]["warc-target-uri"] == \
            "http://a.example/x"
        assert n_bad >= 1

    def test_overstated_content_length_resyncs(self):
        """A header claiming a payload larger than max_record_bytes
        must not swallow every later record (it once buffered the
        whole remaining archive, then dropped everything)."""
        from outrank_spark.sources.warc import IncrementalWarcParser

        recs, _, _ = _records()
        bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"Content-Length: 999999999\r\n\r\n" + b"x" * 50)
        raw = bad + write_warc_bytes(recs[1:3])
        p = IncrementalWarcParser(max_record_bytes=10_000)
        got = p.feed(raw) + p.finish()
        assert len(got) == 2           # both good records recovered
        assert p.n_bad >= 1

    def test_endless_header_is_bounded(self):
        """A 'header' that never terminates must not grow the buffer
        without bound — it is junk past the magic."""
        from outrank_spark.sources.warc import IncrementalWarcParser

        recs, _, _ = _records()
        p = IncrementalWarcParser()
        p.feed(b"WARC/1.0\r\nX: " + b"a" * (2 << 20))
        assert len(p._buf) < (2 << 20)  # buffer was trimmed
        got = p.feed(b"\r\n" + write_warc_bytes(recs[1:2])) + p.finish()
        assert len(got) == 1
        assert p.n_bad >= 1

    def test_corrupt_gzip_member_raises_in_both_readers(self, spark,
                                                        tmp_path):
        """good member + garbage + good member: both readers must fail
        loudly (zlib.error), never silently drop the tail."""
        import zlib as _zlib

        from outrank_spark.sources.warc import _gunzip_members

        recs, _, _ = _records()
        raw = (write_warc_bytes(recs[1:2], member_gzip=True)
               + b"\x1f\x8bGARBAGE-NOT-A-MEMBER"
               + write_warc_bytes(recs[2:3], member_gzip=True))
        with pytest.raises(_zlib.error):
            _gunzip_members(raw)
        (tmp_path / "bad.warc.gz").write_bytes(raw)
        with pytest.raises(Exception):  # Py4J wraps the task failure
            read_warc_stream(spark, str(tmp_path)).collect()

    def test_truncated_gzip_member(self):
        recs, _, _ = _records()
        first = write_warc_bytes(recs[:1], member_gzip=True)
        raw = write_warc_bytes(recs[:2], member_gzip=True)
        # cut 20 bytes into the SECOND member: its deflate stream is
        # incomplete, so only the first record can come back
        parsed, n_bad = parse_warc_bytes(raw[:len(first) + 20])
        assert len(parsed) == 1
        assert parsed[0]["headers"]["warc-type"] == "warcinfo"


class TestSparkReaders:
    @pytest.fixture()
    def warc_dir(self, tmp_path):
        recs, html1, html2 = _records()
        (tmp_path / "a.warc").write_bytes(write_warc_bytes(recs))
        (tmp_path / "b.warc.gz").write_bytes(
            write_warc_bytes(recs, member_gzip=True))
        # a decoy non-warc file the glob must skip
        (tmp_path / "notes.txt").write_bytes(b"not a warc")
        return str(tmp_path), html1, html2

    def test_read_warc_responses_byte_identical(self, spark, warc_dir):
        path, html1, html2 = warc_dir
        rows = read_warc(spark, path).orderBy("url", "warc_ts").collect()
        # 2 response records per archive x 2 archives
        assert len(rows) == 4
        by_url = {}
        for r in rows:
            by_url.setdefault(r["url"], []).append(r)
        assert bytes(by_url["http://a.example/x"][0]["payload"]) == html1
        assert bytes(by_url["http://b.example/y"][0]["payload"]) == html2
        r = by_url["http://b.example/y"][0]
        assert r["content_type"] == "text/html; charset=utf-8"
        assert r["warc_ts"].isoformat() == "2024-03-02T04:05:06"

    def test_stream_reader_matches_binaryfile_reader(self, spark,
                                                     warc_dir):
        """read_warc_stream (paths + incremental parse, bounded
        memory) must produce exactly read_warc's rows; tiny
        chunk/batch sizes force the incremental paths."""
        path, _, _ = warc_dir

        def key(r):
            return (r["url"] or "", r["record_type"],
                    bytes(r["payload"]))

        want = sorted(read_warc(spark, path, kinds=()).collect(),
                      key=key)
        got = sorted(
            read_warc_stream(spark, path, kinds=(), chunk_bytes=256,
                             batch_records=3).collect(),
            key=key)
        assert len(got) == len(want) == 8
        for a, b in zip(got, want):
            assert key(a) == key(b)
            assert a["warc_ts"] == b["warc_ts"]
            assert a["content_type"] == b["content_type"]

    def test_stream_reader_missing_path_raises(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            read_warc_stream(spark, str(tmp_path / "nope"))

    def test_read_warc_all_kinds(self, spark, warc_dir):
        path, _, _ = warc_dir
        rows = read_warc(spark, path, kinds=()).collect()
        assert len(rows) == 8
        kinds = {r["record_type"] for r in rows}
        assert kinds == {"warcinfo", "response", "conversion"}

    def test_stats_variant_counts_bad_blocks(self, spark, tmp_path):
        recs, _, _ = _records()
        raw = (b"garbage" + write_warc_bytes(recs[1:2]))
        (tmp_path / "dirty.warc").write_bytes(raw)
        rows = read_warc_with_stats(spark, str(tmp_path)).collect()
        assert len(rows) == 1
        assert rows[0]["n_bad_in_file"] == 1
        assert rows[0]["source_file"].endswith("dirty.warc")

    def test_read_wet_utf8(self, spark, warc_dir):
        path, _, _ = warc_dir
        rows = read_wet(spark, path).collect()
        texts = {r["text"] for r in rows}
        assert texts == {"alpha beta élève"}
        assert len(rows) == 2  # one conversion record per archive

    def test_read_wet_invalid_utf8_replaced(self, spark, tmp_path):
        """Broken encodings (every real crawl has them) must decode
        leniently, never abort the job."""
        recs = [{"headers": {"WARC-Type": "conversion",
                             "WARC-Target-URI": "http://x/1",
                             "WARC-Date": "2024-01-01T00:00:00Z"},
                 "payload": b"ok \xff\xfe broken"}]
        (tmp_path / "x.warc").write_bytes(write_warc_bytes(recs))
        rows = read_wet(spark, str(tmp_path)).collect()
        assert len(rows) == 1
        assert rows[0]["text"] == "ok �� broken"

    def test_warc_feeds_training_pipeline_end_to_end(self, spark,
                                                     tmp_path):
        """Integration: raw .warc.gz archives -> pages_from_warc ->
        prepare_training_corpus.  The connector's output schema must
        satisfy the capstone pipeline directly; a planted exact
        duplicate must lose exactly one member."""
        import numpy as np

        from outrank_spark.plans.corpus_pipeline import (
            CorpusPipelineConfig,
            prepare_training_corpus,
        )

        rng = np.random.default_rng(3)
        vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
                 "eta", "theta", "iota", "kappa", "lambda", "mu", "nu",
                 "xi", "omicron", "pi", "rho", "sigma", "tau",
                 "upsilon"]
        recs = []
        texts = {}
        for i in range(24):
            words = " ".join(rng.choice(vocab, size=30))
            if i == 23:          # planted exact duplicate of doc 0
                words = texts["http://w.example/p0"]
            url = f"http://w.example/p{i}"
            texts[url] = words
            body = f"<html><body>{words}</body></html>".encode()
            recs.append({"headers": {
                "WARC-Type": "response",
                "WARC-Target-URI": url,
                "WARC-Date": "2024-03-01T00:00:00Z"},
                "payload": _http(body)})
        (tmp_path / "crawl.warc.gz").write_bytes(
            write_warc_bytes(recs, member_gzip=True))

        pages = pages_from_warc(spark, str(tmp_path))
        # integral doc ids: connected_components' documented contract
        # (a production run hashes the url, e.g. xxhash64)
        docs = pages.selectExpr(
            "cast(regexp_extract(url, '([0-9]+)$', 1) as long) "
            "as doc_id", "text")
        out = prepare_training_corpus(docs, cfg=CorpusPipelineConfig(
            group_col=None, dedup_method="minhash",
            dedup_threshold=0.8, drop_quality_fraction=0.0,
            seq_len=64, pack_buckets=4,
        ))
        stats = out["stats"].first().asDict()
        corpus = {r["doc_id"]: r for r in out["corpus"].collect()}
        assert len(corpus) == 23      # one duplicate member dropped
        assert 0 in corpus and 23 not in corpus  # canonical = min id
        assert out["manifest"].count() == 23
        # attrition stats monotone non-increasing across stages
        stage_counts = [v for k, v in stats.items()
                        if k.startswith("n_")]
        assert stage_counts == sorted(stage_counts, reverse=True)

    def test_ingest_job_end_to_end(self, spark, tmp_path):
        """ingest(): archives -> partitioned pages parquet with
        latest-capture url dedup; round-trips through
        read_pages_table with the extractor invariant intact."""
        from outrank_spark.jobs.ingest_warc import build_parser, ingest
        from outrank_spark.operators.derived import (
            extract_text_from_html,
        )
        from outrank_spark.sources.pages import read_pages_table

        arch = tmp_path / "archives"
        arch.mkdir()
        recs = []
        for i, (url, day, body) in enumerate([
            ("http://a.example/x", "2024-03-01", b"old capture"),
            ("http://a.example/x", "2024-03-05", b"new capture"),
            ("http://b.example/y", "2024-03-01", b"only capture"),
        ]):
            recs.append({"headers": {
                "WARC-Type": "response",
                "WARC-Target-URI": url,
                "WARC-Date": f"{day}T0{i}:00:00Z"},
                "payload": _http(b"<html><body>" + body
                                 + b"</body></html>")})
        (arch / "c.warc.gz").write_bytes(
            write_warc_bytes(recs, member_gzip=True))

        out = str(tmp_path / "pages")
        args = build_parser().parse_args([
            "--input", str(arch), "--output", out,
            "--reader", "stream", "--partition_by", "day",
            "--url_dedup", "latest"])
        n = ingest(spark, args)
        assert n == 2  # latest capture per url
        # day partitioning on disk -> partition pruning is possible
        import os
        assert any(d.startswith("crawl_date=2024-03-05")
                   for d in os.listdir(out))
        pages = read_pages_table(spark, out)
        rows = {r["url"]: r for r in pages.collect()}
        assert rows["http://a.example/x"]["warc_ts"].day == 5
        ext = {r["url"]: r["extracted_text"]
               for r in extract_text_from_html(pages).collect()}
        assert ext["http://a.example/x"] == "new capture"
        assert ext["http://b.example/y"] == "only capture"

    def test_ingest_cli_subprocess(self, tmp_path):
        """The spark-submit wrapper shape: fresh process, stream
        reader, JSON summary line."""
        import json
        import subprocess
        import sys

        arch = tmp_path / "archives"
        arch.mkdir()
        recs, _, _ = _records()
        (arch / "a.warc").write_bytes(write_warc_bytes(recs))
        out = str(tmp_path / "pages")
        r = subprocess.run(
            [sys.executable, "jobs/ingest_warc.py",
             "--input", str(arch), "--output", out,
             "--spark_master", "local[2]",
             "--shuffle_partitions", "4",
             "--partition_by", "none"],
            capture_output=True, text=True, cwd="/root/repo",
            timeout=300,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        summary = json.loads(r.stdout.strip().splitlines()[-1])
        assert summary["pages"] == 2  # the two response records
        assert summary["output"] == out

    def test_pages_from_warc_shape_and_extraction(self, spark, warc_dir):
        path, html1, _ = warc_dir
        df = pages_from_warc(spark, path)
        assert [f.name for f in df.schema.fields] == [
            "url", "warc_ts", "html", "text", "lang"]
        rows = {(r["url"], bytes(r["html"])): r for r in df.collect()}
        r = rows[("http://a.example/x", html1)]
        assert "alpha beta" in r["text"]
        assert r["lang"] is None
