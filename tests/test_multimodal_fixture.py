"""The committed binary-media fixture (fixtures/media.parquet): content
pinning, blob-backed inventory semantics (x35b), real-codec round-trips,
and ingest_binary_dir over the committed raw-file directory."""

from __future__ import annotations

import hashlib
import os

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "fixtures", "media.parquet")
RAW_DIR = os.path.join(REPO, "fixtures", "media_files")


def test_fixture_content_pinned():
    """The fixture of record: 80 rows (32 PNG, 32 WAV, 8 JPEG, 8 FLAC),
    deterministic payload digest.  Regenerating via
    tools/make_media_fixture.py must reproduce these exact blobs
    (integer-arithmetic payloads, no RNG)."""
    t = pq.read_table(FIXTURE)
    assert t.num_rows == 80
    assert t.column_names == [
        "media_id", "modality", "mime", "width", "height",
        "n_samples", "sample_rate", "payload",
    ]
    all_payloads = b"".join(t.column("payload").to_pylist())
    assert hashlib.md5(all_payloads).hexdigest() == (
        "6756c220664db21c13aeccc8d293f13b"
    )


def test_fixture_blobs_are_real_png_wav():
    """Every PNG payload decodes through the repo's own PNG codec to its
    recorded dimensions; every WAV payload through the WAV codec to its
    recorded sample count and rate — genuine media bytes, not random
    padding.  JPEG/FLAC rows are metadata-tier: real magic + container
    skeleton, and decoding them must refuse LOUDLY (no codec shipped)."""
    from cubefs_hadoop_spark.extensions.codecs import png_decode, wav_decode

    t = pq.read_table(FIXTURE).to_pylist()
    for r in t:
        if r["mime"] == "image/png":
            w, h, rgb = png_decode(r["payload"])
            assert (w, h) == (r["width"], r["height"])
            assert len(rgb) == 3 * w * h
        elif r["mime"] == "audio/wav":
            samples, rate = wav_decode(r["payload"])
            assert len(samples) == r["n_samples"]
            assert rate == r["sample_rate"]
        elif r["mime"] == "image/jpeg":
            assert r["payload"][:3] == b"\xff\xd8\xff"
            assert r["payload"][-2:] == b"\xff\xd9"
            with pytest.raises(Exception):
                png_decode(r["payload"])
        else:
            assert r["mime"] == "audio/flac"
            assert r["payload"][:4] == b"fLaC"
            with pytest.raises(Exception):
                wav_decode(r["payload"])


def test_x35b_inventory_semantics(spark):
    """Planted duplicates surface as digest groups: media_ids 30/31
    repeat id 0's PNG, 62/63 repeat id 32's WAV, 70/71 repeat id 64's
    JPEG and 78/79 repeat id 72's FLAC — four digests carry n_copies=3
    with canonical ids 0/32/64/72; every other payload is unique.  The
    sniffer recovers every recorded mime from the bytes alone, across
    all four container formats."""
    from cubefs_hadoop_spark.queries import QUERIES

    rows = QUERIES["x35b_blob_inventory"](spark, "unused").collect()
    assert len(rows) == 80
    by_id = {r.media_id: r for r in rows}
    for trio, canon in (
        ((0, 30, 31), 0),
        ((32, 62, 63), 32),
        ((64, 70, 71), 64),
        ((72, 78, 79), 72),
    ):
        for i in trio:
            assert by_id[i].n_copies == 3 and by_id[i].canonical_id == canon
    assert sum(1 for r in rows if r.n_copies == 1) == 68
    magic_by_mime = {
        "image/png": "89504e47",
        "audio/wav": "52494646",
        "image/jpeg": "ffd8ffe0",
        "audio/flac": "664c6143",
    }
    for r in rows:
        assert r.magic_hex == magic_by_mime[r.mime]
        assert r.sniffed_mime == r.mime  # bytes alone recover the format
        assert r.nbytes > 0


def test_ingest_binary_dir_over_fixture_files(spark):
    """The binaryFile source reads the committed raw-file directory; the
    bytes match the parquet fixture's payloads for the same items."""
    from cubefs_hadoop_spark.extensions import multimodal as mm

    df = mm.ingest_binary_dir(spark, RAW_DIR, glob="*.png")
    got = {
        os.path.basename(r.path): bytes(r.content) for r in df.collect()
    }
    assert set(got) == {"img_00.png", "img_01.png", "img_02.png"}
    t = pq.read_table(FIXTURE).to_pylist()
    by_id = {r["media_id"]: r["payload"] for r in t}
    assert got["img_00.png"] == by_id[0]
    assert got["img_01.png"] == by_id[1]
    assert got["img_02.png"] == by_id[2]

    wavs = mm.ingest_binary_dir(spark, RAW_DIR, glob="*.wav")
    assert wavs.count() == 3


def test_x35b_single_digest_shuffle(spark):
    """Scale shape: the two per-digest windows (count + min) share ONE
    digest-keyed Exchange; no join, no Python — the inventory pass is a
    map stage plus one shuffle at any corpus size."""
    from cubefs_hadoop_spark.extensions.multimodal import (
        MEDIA_FIXTURE,
        blob_inventory,
    )
    from cubefs_hadoop_spark.plans.audit import audit_plan

    spark.catalog.clearCache()
    a = audit_plan(blob_inventory(spark.read.parquet(MEDIA_FIXTURE)))
    assert a.shuffles == 1
    assert a.broadcast_joins + a.sort_merge_joins + a.nested_loop_joins == 0
    assert not a.has_python_eval
