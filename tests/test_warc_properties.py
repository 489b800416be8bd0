"""Property-based WARC parser invariants (hypothesis).

The hand-built fixtures in tests/test_warc.py pin known shapes; these
properties attack the parser with ARBITRARY payload bytes (including
embedded "WARC/" magic, CRLF runs, gzip magic) and randomized record
mixes — the cases a real crawl archive throws at a resync-based
parser.  No Spark: parse_warc_bytes / write_warc_bytes /
_gunzip_members are the pure-Python kernels the reader wraps.
"""
from __future__ import annotations

import gzip

from hypothesis import given, settings, strategies as st

from outrank_spark.sources.warc import (
    IncrementalWarcParser,
    _gunzip_members,
    parse_warc_bytes,
    write_warc_bytes,
)

SETTINGS = dict(max_examples=50, deadline=None)

# header values: printable, no CR/LF (the serializer does not fold)
header_values = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    min_size=1, max_size=40,
)
payloads = st.binary(min_size=0, max_size=400)

records = st.lists(
    st.fixed_dictionaries({
        "headers": st.fixed_dictionaries({
            "WARC-Type": st.sampled_from(
                ["response", "conversion", "warcinfo", "request"]),
            "WARC-Target-URI": header_values,
            "WARC-Date": st.just("2024-03-01T00:00:00Z"),
        }),
        "payload": payloads,
    }),
    min_size=0, max_size=8,
)


class TestParserProperties:
    @given(recs=records, gz=st.booleans())
    @settings(**SETTINGS)
    def test_round_trip_any_payload(self, recs, gz):
        """Serialization -> parse recovers every record byte-identically
        even when payloads embed the WARC/ magic, CRLF runs, or gzip
        headers (Content-Length framing must win over resync)."""
        raw = write_warc_bytes(recs, member_gzip=gz)
        parsed, n_bad = parse_warc_bytes(raw)
        assert n_bad == 0
        assert len(parsed) == len(recs)
        for orig, got in zip(recs, parsed):
            assert got["payload"] == orig["payload"]
            # field-value surrounding whitespace is insignificant in
            # the WARC spec — the parser strips it
            assert (got["headers"]["warc-type"]
                    == orig["headers"]["WARC-Type"].strip())
            assert (got["headers"]["warc-target-uri"]
                    == orig["headers"]["WARC-Target-URI"].strip())

    @given(recs=records, junk=st.binary(min_size=1, max_size=64))
    @settings(**SETTINGS)
    def test_leading_junk_never_corrupts_records(self, recs, junk):
        """Arbitrary junk prepended: every real record still parses
        (resync), and junk is flagged unless it is pure CRLF padding
        or itself starts a fake record the parser must reject."""
        raw = write_warc_bytes(recs)
        parsed, n_bad = parse_warc_bytes(junk + raw)
        payloads = [p["payload"] for p in parsed]
        for orig in recs:
            assert orig["payload"] in payloads
        if junk.strip(b"\r\n") and b"WARC/" not in junk:
            assert n_bad >= 1

    @given(recs=records.filter(lambda r: len(r) > 0),
           cut=st.integers(min_value=1, max_value=30))
    @settings(**SETTINGS)
    def test_truncation_loses_at_most_the_tail(self, recs, cut):
        """Cutting bytes off the END only ever loses trailing records;
        the prefix parses to a prefix of the full record list."""
        raw = write_warc_bytes(recs)
        full, _ = parse_warc_bytes(raw)
        part, _ = parse_warc_bytes(raw[:-cut])
        assert len(part) <= len(full)
        for orig, got in zip(full[:len(part)], part):
            assert got["payload"] == orig["payload"]

    @given(recs=records,
           gaps=st.lists(st.binary(min_size=0, max_size=40),
                         min_size=1, max_size=9),
           cuts=st.lists(st.integers(min_value=0, max_value=2000),
                         min_size=0, max_size=12),
           trunc=st.integers(min_value=0, max_value=25))
    @settings(**SETTINGS)
    def test_incremental_equals_batch_for_any_chunking(
            self, recs, gaps, cuts, trunc):
        """The incremental parser must produce the same records AND
        the same n_bad as the batch parse for EVERY chunking of the
        same byte stream — junk interleaved BETWEEN records (the
        cross-chunk _gap_junk path), prefixes, and truncation
        included."""
        pieces = []
        for i, r in enumerate(recs):
            pieces.append(gaps[i % len(gaps)])
            pieces.append(write_warc_bytes([r]))
        pieces.append(gaps[len(recs) % len(gaps)])
        raw = b"".join(pieces)
        raw = raw[:len(raw) - trunc] if trunc else raw
        want_records, want_bad = parse_warc_bytes(raw)

        p = IncrementalWarcParser()
        got: list = []
        pos = 0
        for c in sorted(set(min(c, len(raw)) for c in cuts)):
            got += p.feed(raw[pos:c])
            pos = c
        got += p.feed(raw[pos:])
        got += p.finish()
        assert got == want_records
        assert p.n_bad == want_bad

    @given(chunks=st.lists(payloads, min_size=0, max_size=6))
    @settings(**SETTINGS)
    def test_gunzip_concatenated_members(self, chunks):
        raw = b"".join(gzip.compress(c, mtime=0) for c in chunks)
        if chunks and raw[:2] == b"\x1f\x8b":
            assert _gunzip_members(raw) == b"".join(chunks)
        # non-gzip passthrough
        blob = b"plain" + raw
        assert _gunzip_members(blob) == blob
